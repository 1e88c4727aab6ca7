package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Single-JVM evidence chain: correctness dump + per-query timings + recall,
 * in ONE session at one sf — so a fresh clone reproduces the full evidence
 * surface with one command (`scripts/evidence.sh`) instead of three JVM
 * spins. At sf0.01 the whole chain is sub-minute.
 *
 * This is the CI shape, not the measurement shape: timings here are
 * single-shot (no wave guard, no medians — see [[graft.Bench]] /
 * `scripts/bench_median.py` for committable numbers) and exist to catch
 * "query X got 10× slower" regressions, not to grade performance. The
 * correctness dump is byte-identical to the driver's `graft.Verify` run and
 * is completed by `scripts/local_verify.py`'s DuckDB compare, which the
 * wrapper script runs right after.
 */
object Evidence {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_EVIDENCE_OUT", "/tmp/graft-evidence")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.withDefaults(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()

    // 1. correctness dump (the real gate — DuckDB compare runs in the wrapper)
    graft.Verify.dump(spark, sfDir, s"$outDir/verify")
    val tVerify = (System.nanoTime() - t0) / 1e9

    // 2. single-shot per-query timings through the noop sink (regression
    // smoke, not a benchmark — every column of every row is produced)
    def time(name: String): Double = {
      val s0 = System.nanoTime()
      try graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case t: Throwable =>
        System.err.println(s"[evidence] QUERY FAILED: $name — ${t.getMessage}")
        return -1.0
      }
      (System.nanoTime() - s0) / 1e9
    }
    val timings = graft.SparkEntry.queries.keys.toSeq.sorted.map(n => n -> time(n))

    // 3. recall for the approximate family (full query coverage at sf0.01)
    val recall = Recall.measure(spark, sfDir,
      queryTarget = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "500").toInt)

    val secs = (System.nanoTime() - t0) / 1e9
    val tJson = timings.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val rJson = recall.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"evidence","sf":"$sfDir","verify_out":"$outDir/verify","verify_sec":$tVerify,"query_sec":$tJson,"recall":$rJson,"total_sec":$secs}""")
    spark.stop()
  }
}
