package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.streaming.StreamingEvents.SessionEvent

/** Streaming specs: windowed counts and stateful sessionization over a
  * MemoryStream, checked against the batch Sessionize operator's semantics. */
class StreamingEventsSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates per hour window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "value")

    val q = StreamingEvents.windowedCounts(events)
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    input.addData(
      (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (1L, ts("2024-01-01 10:45:00"), "click", 3.0),
      (1L, ts("2024-01-01 11:05:00"), "click", 5.0))
    q.processAllAvailable()
    val rows = spark.table("wc").collect()
    q.stop()

    val h10 = rows.find(r => r.getAs[Long]("n_events") == 2)
    assert(h10.isDefined && h10.get.getAs[Double]("avg_value") == 2.0)
  }

  test("stateful sessionize emits closed sessions at gap boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StreamingEvents.sessionize(input.toDS(), gapSeconds = 3600)

    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // two bursts 2h apart: first session closes when the second begins
    input.addData(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 1),
      SessionEvent(1L, ts("2024-01-01 10:30:00"), 2),
      SessionEvent(1L, ts("2024-01-01 12:30:00"), 3))
    q.processAllAvailable()
    // advance watermark so the open session can time out on a later batch
    input.addData(SessionEvent(2L, ts("2024-01-01 18:00:00"), 4))
    q.processAllAvailable()
    input.addData(SessionEvent(2L, ts("2024-01-01 23:30:00"), 5))
    q.processAllAvailable()
    val rows = spark.table("sess").orderBy("session_start").collect()
    q.stop()

    assert(rows.length >= 1)
    val first = rows(0)
    assert(first.getAs[Long]("user_id") == 1L)
    assert(first.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(first.getAs[Timestamp]("session_end") == ts("2024-01-01 10:30:00"))
    assert(first.getAs[Int]("n_events") == 2)
  }

  test("exactDedupSink: batch Dedup.exact composed via foreachBatch, ledger spans batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-dedup-sink").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val q = StreamingEvents.exactDedupSink(docs, "text", keepOrder = Seq("doc_id"),
      outPath = s"$dir/out", ledgerPath = s"$dir/ledger",
      checkpointPath = s"$dir/ckpt")
    // batch 1: intra-batch duplicate (docs 1/2) + a unique doc
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "alpha beta gamma"),
      (2L, ts("2024-01-01 10:01:00"), "alpha beta gamma"),
      (3L, ts("2024-01-01 10:02:00"), "delta epsilon"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate of batch 1 content (doc 4 — hours past
    // any watermark reach) + a new doc; ledger must still drop doc 4
    input.addData(
      (4L, ts("2024-01-02 09:00:00"), "alpha beta gamma"),
      (5L, ts("2024-01-02 09:01:00"), "zeta eta"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L),
      s"keeper set wrong: $kept — intra-batch keeper is min doc_id; cross-batch dups must drop")
    // ledger holds exactly the three distinct fingerprints
    assert(spark.read.parquet(s"$dir/ledger").distinct().count() == 3)
  }

  test("nearDupSink: MinHash near-dup composed via foreachBatch, signature ledger spans batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-neardup-sink").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    // long shared template so doc pairs sit solidly above/below J = 0.5
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "distant river winds slowly through the quiet green valley at dawn"
    val nearDup = base.replace("quiet", "silent") // J ≈ 0.9
    val unrelated = "completely different subject matter entirely about " +
      "compilers optimizing sparse matrix multiplication kernels on gpus"

    val q = StreamingEvents.nearDupSink(docs, "doc_id", "text",
      threshold = 0.5, outPath = s"$dir/out", ledgerPath = s"$dir/ledger",
      checkpointPath = s"$dir/ckpt")
    // batch 1: near-dup pair (1, 2) — keeper is component min id — plus an
    // unrelated doc
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), base),
      (2L, ts("2024-01-01 10:01:00"), nearDup),
      (3L, ts("2024-01-01 10:02:00"), unrelated))
    q.processAllAvailable()
    // batch 2: near-dup of batch-1 content (must drop via the signature
    // ledger — hours past any watermark) + a genuinely new doc
    input.addData(
      (4L, ts("2024-01-02 09:00:00"), nearDup),
      (5L, ts("2024-01-02 09:01:00"), "fresh content about ocean tides " +
        "and the gravitational influence of the moon on coastal waters"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L),
      s"keeper set wrong: $kept — intra-batch keeper is component min id; " +
        "cross-batch near-dups must drop against the signature ledger")
    // ledger holds one constant-size signature per kept doc
    assert(spark.read.parquet(s"$dir/ledger").count() == 3)
  }

  test("dedupStream drops watermark-window duplicates by content fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val q = StreamingEvents.dedupStream(docs, "text", "ts")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "same content here"),
      (2L, ts("2024-01-01 10:01:00"), "same content here"), // dup within watermark
      (3L, ts("2024-01-01 10:02:00"), "different content"))
    q.processAllAvailable()
    val kept = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    q.stop()

    assert(kept == Set(1L, 3L))
  }
}
