package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Diagnostic: runs one query N times through the noop sink and reports, per
 * rep, the wall time, the [[graft.core.OperatorCaches]] pending count, and
 * whether Spark's CacheManager is empty — the signature of an operator-cache
 * release failure is `pending` growing with reps while the per-rep wall time
 * climbs (every planning pass then scans the accumulated cached plans).
 *
 * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_PROBE_QUERY=a10_percentile_stats \
 *        sbt "runMain graft.tools.CacheProbe"
 */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val query = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERY", "a10_percentile_stats")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.withDefaults(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_PROBE_LOG", "ERROR"))
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(query)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let the async execution-listener bus drain
      println(f"rep $i: $dt%.2fs  pending=${graft.core.OperatorCaches.pending(spark)}" +
        s"  cacheManagerEmpty=${spark.sharedState.cacheManager.isEmpty}")
    }
    spark.stop()
  }
}
