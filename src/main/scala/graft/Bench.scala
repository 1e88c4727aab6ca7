package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.GraftSession.withDefaults(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Materialize through the noop sink: every column of every row is
    // produced and handed to the writer, so projection-only queries are
    // timed for their expression work — a bare count() lets Catalyst prune
    // unreferenced projections and times just scan+count.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // untimed warmup: JIT + codegen + parquet footer caches, so the first
    // timed query measures the query, not session startup
    spark.range(1000000).selectExpr("sum(id)").collect()
    try run(SparkEntry.queries("a1_pricing_summary"))
    catch { case _: Throwable => }
    // SPARK_GRAFT_BENCH_REPS>1 runs the whole suite that many times in the
    // same JVM and session order and reports the per-query MEDIAN (plus the
    // min-max spread), so round-over-round comparisons aren't at the mercy
    // of this host's ±30-40% single-run noise. Default 1 = driver behavior.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    // SPARK_GRAFT_BENCH_ONLY=a10_percentile_stats,knn3_ivf_top3 restricts the
    // suite to a comma-separated subset — for profiling a single query
    // without paying the full-suite wall time. Unset = all queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail fast on a typo'd or empty filter — a silently-empty suite would
    // emit a plausible-looking zero-query JSON line
    only.foreach { o =>
      val unknown = o.diff(SparkEntry.queries.keySet)
      require(o.nonEmpty, "SPARK_GRAFT_BENCH_ONLY is set but names no queries")
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
    val samples: Seq[Map[String, Double]] = (1 to reps).map { _ =>
      names.map { name =>
        val t0 = System.nanoTime()
        // a failed query must not abort the suite, but it must not silently
        // report a near-zero time either — flag it on stderr (the driver
        // parses only the stdout JSON line)
        try run(SparkEntry.queries(name))
        catch {
          case t: Throwable =>
            System.err.println(s"[bench] QUERY FAILED: $name — ${t.getClass.getSimpleName}: ${t.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }.toMap
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val results = names.map(n => n -> median(samples.map(_(n))))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val spread =
      if (reps <= 1) ""
      else {
        val sp = names.map { n =>
          val xs = samples.map(_(n))
          s"\"" + n + "\":[" + xs.min + "," + xs.max + "]"
        }.mkString("{", ",", "}")
        s""","reps":$reps,"spread":$sp"""
      }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"$spread}""")
    spark.stop()
  }
}
