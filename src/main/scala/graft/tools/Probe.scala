package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.dedup.MinHash
import graft.functions.TextFunctions

/** Scratch probe main for quick local experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "probe")
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    println("[probe] " + docs.agg(count(lit(1)), avg(length(col("text")))).collect().mkString)

    time("warmup count")(docs.count())
    time("tokens") {
      println("[probe] total tokens = " + docs.select(
        size(TextFunctions.tokens(col("text"))).as("n")).agg(sum(col("n"))).collect()(0))
    }
    time("shingle count") {
      println("[probe] total shingles = " + docs.select(
        size(TextFunctions.shingles(col("text"), 3)).as("n")).agg(sum(col("n"))).collect()(0))
    }
    time("shingle hash distinct") {
      docs.select(array_distinct(transform(TextFunctions.shingles(col("text"), 3),
        s => xxhash64(s))).as("h")).agg(sum(size(col("h")))).collect()
    }
    val sigs = time("signature") {
      val s = docs.select(col("doc_id"), MinHash.signature(col("text")).as("sig"))
      s.count(); s
    }
    time("bandkeys from cached sig") {
      val cached = sigs.cache(); cached.count()
      val b = cached.select(col("doc_id"),
        explode(MinHash.bandKeys(col("sig"), 8, 4)).as("b"))
      println("[probe] buckets=" + b.count())
    }
    spark.stop()
  }
}
