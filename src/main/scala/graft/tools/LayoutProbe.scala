package graft.tools

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkEntry
import graft.core.{GraftSession, Tables}

/**
 * Measures what the opt-in bucketed base-table layout
 * ([[Tables.BucketedLayoutConf]]) actually buys on the person/user-keyed
 * chain: runs the layout-sensitive queries `reps` times against the plain
 * parquet path and again against the bucketed layout, in ONE JVM (same
 * warmup/page-cache situation), and reports per-query medians plus plan
 * exchange counts for both paths.
 *
 * The subject queries are the seq1-shaped aggregation chain (groupBy on
 * the bucket key — the decorator-chain shape the OMOP pipeline repeats)
 * plus a4's user-keyed rollup. The layout pass itself is timed and
 * reported (`materialize_s`): the break-even math — layout cost vs
 * per-run exchange savings × runs — is the number a deployment needs.
 *
 * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 * SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_LAYOUT_REPS (default 3),
 * SPARK_GRAFT_LAYOUT_BUCKETS (default = cpus). Prints one JSON line.
 */
object LayoutProbe {

  private val Subject = Seq("seq1_event_sequences", "a4_hourly_rollup",
    "a2_event_type_counts", "w1_event_order")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_REPS", "3").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_BUCKETS", cpus.toString).toInt

    val spark = GraftSession.local(cpus, "layout-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val t = Tables.bucketedTableName("events")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, t)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)

    def timeS(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // one-time layout pass (timed — the cost side of the break-even)
    val materializeS = timeS {
      Tables.materializeBucketed(Tables.load(spark, sfDir, "events"), "events",
        sfDir, "raw", buckets, Seq("user_id"))
    }

    def runPath(gateOn: Boolean): (Map[String, Double], Map[String, Int]) = {
      spark.conf.set(Tables.BucketedLayoutConf, gateOn.toString)
      val times = Subject.map { q =>
        val med = median((0 until reps).map { _ =>
          timeS(SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save())
        })
        q -> med
      }.toMap
      val ex = Subject.map { q =>
        val plan = SparkEntry.queries(q)(spark, sfDir)
          .queryExecution.explainString(FormattedMode)
        q -> "\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length
      }.toMap
      (times, ex)
    }

    // plain first, bucketed second; a warmup rep of each subject query
    // pays the one-off codegen/JIT cost outside the measured reps
    spark.conf.set(Tables.BucketedLayoutConf, "false")
    Subject.foreach(q =>
      SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save())
    val (plainT, plainEx) = runPath(gateOn = false)
    val (bucketT, bucketEx) = runPath(gateOn = true)

    def fmt(m: Map[String, Double]): String =
      Subject.map(q => s""""$q":${f"${m(q)}%.3f"}""").mkString("{", ",", "}")
    def fmtI(m: Map[String, Int]): String =
      Subject.map(q => s""""$q":${m(q)}""").mkString("{", ",", "}")

    println(s"""{"metric":"layout_probe","sf_dir":"$sfDir","buckets":$buckets,""" +
      s""""reps":$reps,"materialize_s":${f"$materializeS%.2f"},""" +
      s""""plain_s":${fmt(plainT)},"bucketed_s":${fmt(bucketT)},""" +
      s""""plain_exchanges":${fmtI(plainEx)},"bucketed_exchanges":${fmtI(bucketEx)}}""")
    spark.stop()
  }
}
