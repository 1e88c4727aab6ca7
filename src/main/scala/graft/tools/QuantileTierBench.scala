package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Head-to-head re-measurement of the a10 cumulate-tier decision on the
 * current host (optimization round 16, VERDICT item 8): the declared
 * a10 plan (tier decision as shipped — plain per-group window at sf0.1)
 * vs the same query with the range-parallel shape FORCED through the
 * `spark.graft.quantiles.*` tunables. Both run the FULL declared
 * a10_percentile_stats query in one session, alternating reps, so host
 * drift hits both arms equally. Not part of the query surface; evidence
 * recorded in OPTIMIZATION_r16.md.
 */
object QuantileTierBench {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "quantile-tier-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def run(spark: SparkSession): Unit =
      graft.SparkEntry.queries("a10_percentile_stats")(spark, dir)
        .write.format("noop").mode("overwrite").save()

    def asShipped(): Unit = {
      spark.conf.unset("spark.graft.quantiles.factRowsProbeThreshold")
      spark.conf.unset("spark.graft.quantiles.rangeParallelPerGroupRows")
      run(spark)
    }
    def forcedParallel(): Unit = {
      // probeThreshold 0 pushes past tier 1; perGroupRows 1 makes the
      // probe's choose() always pick the range-parallel shape
      spark.conf.set("spark.graft.quantiles.factRowsProbeThreshold", "0")
      spark.conf.set("spark.graft.quantiles.rangeParallelPerGroupRows", "1")
      run(spark)
    }

    val times = collection.mutable.Map("as_shipped" -> Vector.empty[Double],
      "forced_parallel" -> Vector.empty[Double])
    for (_ <- 1 to reps;
         (name, mk) <- Seq("as_shipped" -> asShipped _,
           "forced_parallel" -> forcedParallel _)) {
      val t0 = System.nanoTime()
      mk()
      times(name) :+= (System.nanoTime() - t0) / 1e9
      System.gc()
    }
    def med(xs: Vector[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"""{"metric":"a10_tier_shape","as_shipped_median_s":${med(times("as_shipped"))}%.3f,"forced_parallel_median_s":${med(times("forced_parallel"))}%.3f,"as_shipped":[${times("as_shipped").map(t => f"$t%.3f").mkString(",")}],"forced_parallel":[${times("forced_parallel").map(t => f"$t%.3f").mkString(",")}],"reps":$reps,"sf":"$dir"}""")
    spark.stop()
  }
}
