package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ExactQuantiles

/**
 * Head-to-head measurement for the a10 trim-shape decision (round 9): the
 * r8 two-pass form (quantile bounds pass + bounds-joined conditional
 * aggregation) vs the r9 fused [[ExactQuantiles.trimmedMoments]] (one
 * aggregation, index-space predicate, boundary corrections). Both run the
 * FULL a10 pipeline — cumulateFromFact → moments → median fetch — in one
 * session, alternating reps, so host drift hits both equally. Not part of
 * the query surface; evidence recorded in BENCH_NOTES.md "a10 shape".
 */
object TrimShapeBench {

  private def finish(cum: DataFrame, m0: DataFrame): DataFrame = {
    def vAt(idx: Column) = ExactQuantiles.valueAt(idx, "l_extendedprice")
    val m = m0
      .withColumn("__p50", (col("__nt") - 1).cast("double") * lit(0.5))
      .withColumn("__l50", floor(col("__p50")))
      .withColumn("__h50", ceil(col("__p50")))
    cum.join(broadcast(m), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(max(col("__nt")).as("__nt"), max(col("__s1")).as("__s1"),
        max(col("__s2")).as("__s2"), max(col("__p50")).as("__p50"),
        max(col("__l50")).as("__l50"), max(col("__h50")).as("__h50"),
        vAt(col("__l50") + col("__b")).as("__v50l"),
        vAt(col("__h50") + col("__b")).as("__v50h"))
      .select(col("l_returnflag"),
        round(col("__s1") / col("__nt"), 2).as("trimmed_mean"),
        round(when(col("__nt") > 1,
          sqrt(greatest((col("__s2") - col("__s1") * col("__s1") / col("__nt")) /
            (col("__nt") - 1), lit(0.0)))), 2).as("trimmed_stddev"),
        col("__nt").as("n_trimmed"),
        round(ExactQuantiles.interpolate(col("__p50"), col("__l50"), col("__h50"),
          col("__v50l"), col("__v50h")), 2).as("median"))
  }

  private def cumOf(spark: SparkSession, dir: String): DataFrame =
    ExactQuantiles.cumulateFromFact(
        spark.read.parquet(s"$dir/lineitem.parquet"), Seq("l_returnflag"),
        "l_extendedprice", totalCol = Some("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "trim-shape-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def twoPass(): DataFrame = {
      val cum = cumOf(spark, dir)
      val bounds = ExactQuantiles.quantilesOfCumulated(cum, Seq("l_returnflag"),
        "l_extendedprice", Seq(0.01 -> "__lo", 0.99 -> "__hi"), totalCol = Some("__n"))
      val btw = col("l_extendedprice").between(col("__lo"), col("__hi"))
      val m = cum.join(broadcast(bounds), Seq("l_returnflag"))
        .groupBy("l_returnflag")
        .agg(sum(when(btw, col("__cnt"))).as("__nt"),
          sum(when(btw, col("l_extendedprice") * col("__cnt"))).as("__s1"),
          sum(when(btw, col("l_extendedprice") * col("l_extendedprice") * col("__cnt"))).as("__s2"),
          coalesce(sum(when(col("l_extendedprice") < col("__lo"), col("__cnt"))), lit(0L)).as("__b"))
        .filter(col("__nt").isNotNull)
      graft.core.OperatorCaches.owned(finish(cum, m), Seq(cum))
    }
    def fused(): DataFrame = {
      val cum = cumOf(spark, dir)
      val m = ExactQuantiles.trimmedMoments(cum, Seq("l_returnflag"),
        "l_extendedprice", 0.01, 0.99).filter(col("__nt") > 0)
      graft.core.OperatorCaches.owned(finish(cum, m), Seq(cum))
    }

    val times = collection.mutable.Map("two_pass" -> Vector.empty[Double],
      "fused" -> Vector.empty[Double])
    for (_ <- 1 to reps; (name, mk) <- Seq("two_pass" -> twoPass _, "fused" -> fused _)) {
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      times(name) :+= (System.nanoTime() - t0) / 1e9
      System.gc()
    }
    def med(xs: Vector[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"""{"metric":"a10_trim_shape","two_pass_median_s":${med(times("two_pass"))}%.3f,"fused_median_s":${med(times("fused"))}%.3f,"two_pass":[${times("two_pass").map(t => f"$t%.3f").mkString(",")}],"fused":[${times("fused").map(t => f"$t%.3f").mkString(",")}],"reps":$reps,"sf":"$dir"}""")
    spark.stop()
  }
}
