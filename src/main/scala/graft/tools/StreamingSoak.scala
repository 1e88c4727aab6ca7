package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.core.GraftSession
import graft.streaming.StreamingEvents

/**
 * Many-batch soak measurement for the foreachBatch exact-dedup sink — the
 * evidence behind the [[graft.streaming.BucketedLedger]] "flat per-batch"
 * claim, which until this tool existed was plan-derived only
 * (BucketedLedgerSpec pins the one-sided join SHAPE; this measures the
 * TIME).
 *
 * What it does: drives `batches` deterministic micro-batches through
 * [[StreamingEvents.exactDedupSink]] via a MemoryStream, with `dupRate` of
 * each batch's documents repeating earlier batches' content (so the
 * cross-batch anti-join does real work every batch). Broadcast joins are
 * disabled for the session, so the ledger side exercises the bucketed
 * one-sided plan from batch 1 — the plan a 100 TB deployment is on once
 * the ledger dwarfs the broadcast threshold — instead of hiding O(history)
 * behind small-table broadcasts.
 *
 * What to read from the output: per-batch wall time over a ledger that
 * grows every batch and compacts every ~`compactAfterFiles / buckets`
 * batches. Flat (no O(history) trend) non-compaction batches = the
 * bucketed ledger claim holds; a linear climb would mean the history is
 * being re-shuffled per batch. The file count must sawtooth under
 * `compactAfterFiles + buckets` and never trend. Correctness is asserted,
 * not eyeballed: the sink's output must contain exactly one row per
 * distinct document ever emitted.
 *
 * Env knobs: SPARK_GRAFT_SOAK_BATCHES (default 100), SPARK_GRAFT_SOAK_DOCS
 * (per batch, default 2000), SPARK_GRAFT_SOAK_DUP_RATE (default 0.3),
 * SPARK_GRAFT_CPUS (default 16). Prints one JSON line (batch times, decile
 * medians, compaction count, flatness ratio) for BENCH_NOTES.
 */
object StreamingSoak {

  final case class Doc(doc_id: Long, text: String)

  def main(args: Array[String]): Unit = {
    val batches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "100").toInt
    val docsPerBatch = sys.env.getOrElse("SPARK_GRAFT_SOAK_DOCS", "2000").toInt
    val dupRate = sys.env.getOrElse("SPARK_GRAFT_SOAK_DUP_RATE", "0.3").toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt

    val spark = GraftSession.local(cpus, "streaming-soak")
    spark.sparkContext.setLogLevel("ERROR")
    // force the ledger anti-join off the broadcast path: the soak's subject
    // is the bucketed one-sided plan, the only plan that exists at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._

    val root = "/tmp/graft-soak"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val ledgerTable = "soak_ledger"
    spark.sql(s"DROP TABLE IF EXISTS $ledgerTable")
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerTable}__compacting")
    spark.sql(s"DROP TABLE IF EXISTS ${ledgerTable}__old")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq(ledgerTable, ledgerTable + "__compacting", ledgerTable + "__old")
      .foreach(t => fs.delete(new org.apache.hadoop.fs.Path(wh, t), true))

    val buckets = 8
    val compactAfterFiles = 64
    val ledger = StreamingEvents.exactDedupLedger(ledgerTable, buckets, compactAfterFiles)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Doc]
    val query = StreamingEvents.exactDedupSink(stream.toDF(), "text",
      keepOrder = Seq("doc_id"), outPath = s"$root/out",
      ledgerTable = ledgerTable, checkpointPath = s"$root/ckpt",
      ledgerBuckets = buckets, compactAfterFiles = compactAfterFiles)

    // deterministic corpus: unique doc u has text "soak document body <u>";
    // a duplicate in batch i repeats a uniformly-spread earlier unique. The
    // xorshift-ish mix keeps the dup choice deterministic without
    // java.util.Random state threading.
    var nextUnique = 0L
    val wallMs = ArrayBuffer.empty[Double]
    val files = ArrayBuffer.empty[Int]
    var compactions = 0
    (0 until batches).foreach { i =>
      val docs = (0 until docsPerBatch).map { j =>
        val id = i.toLong * docsPerBatch + j
        val dup = nextUnique > 0 && {
          val mix = (id * 0x9e3779b97f4a7c15L) >>> 40
          (mix % 1000) < (dupRate * 1000).toLong
        }
        val u = if (dup) ((id * 0x2545f4914f6cdd1dL) >>> 33) % nextUnique
                else { nextUnique += 1; nextUnique - 1 }
        Doc(id, s"soak document body $u")
      }
      val t0 = System.nanoTime()
      stream.addData(docs)
      query.processAllAvailable()
      val ms = (System.nanoTime() - t0) / 1e6
      wallMs += ms
      val f = ledger.fileCount(spark)
      files += f
      val compacted = i > 0 && f < files(i - 1)
      if (compacted) compactions += 1
      System.err.println(f"# batch $i%3d  ${ms}%8.1f ms  ledger_files=$f%3d" +
        (if (compacted) "  [compacted]" else ""))
    }
    query.stop()

    // correctness: exactly one output row per distinct document ever emitted
    val outCount = spark.read.parquet(s"$root/out").count()
    val outDistinct = spark.read.parquet(s"$root/out")
      .select(col("text")).distinct().count()
    require(outCount == nextUnique && outDistinct == nextUnique,
      s"soak dedup broken: $outCount rows / $outDistinct distinct, " +
        s"expected $nextUnique uniques")

    // flatness: median per-batch wall of each decile (compaction spikes
    // included — they are part of the amortized cost), plus a first-vs-last
    // decile ratio. Batch 0 pays stream-start + codegen warmup; drop it
    // from the first decile so the ratio reads steady-state.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; if (s.isEmpty) 0 else s(s.size / 2)
    }
    val deciles = wallMs.drop(1).grouped(math.max(1, (batches - 1) / 10))
      .map(g => median(g.toSeq)).toSeq
    val flatness = if (deciles.size >= 2 && deciles.head > 0)
      deciles.last / deciles.head else 1.0

    val json = Map(
      "metric" -> "\"streaming_soak\"",
      "batches" -> batches.toString,
      "docs_per_batch" -> docsPerBatch.toString,
      "dup_rate" -> dupRate.toString,
      "unique_docs" -> nextUnique.toString,
      "compactions" -> compactions.toString,
      "max_ledger_files" -> files.max.toString,
      "decile_median_ms" -> deciles.map(d => f"$d%.1f").mkString("[", ",", "]"),
      "last_over_first_decile" -> f"$flatness%.3f",
      "total_s" -> f"${wallMs.sum / 1000}%.1f"
    ).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(json)
    spark.stop()
  }
}
