package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession
import graft.operators.TransitiveClosure

/** Scratch probe main for quick local experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "probe")
    val df = graft.SparkEntry.queries("a13_transitive_closure")(spark, "/root/testdata/sf0.001")
    df.orderBy("descendant", "ancestor").show(10, false)
    println(s"rows=${df.count()}")
    spark.stop()
  }
}
