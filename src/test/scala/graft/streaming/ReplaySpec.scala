package graft.streaming

import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.SparkSpecBase

/** The sq1/sq2 replay harnesses at fixture scale: a hand-crafted corpus
  * whose keeper set under BATCH-SEQUENTIAL semantics (earliest batch wins,
  * then the intra-batch keeper rule) differs from a global min(id) — the
  * discriminating case the driver oracle relies on, pinned here with the
  * expected ids spelled out. */
class ReplaySpec extends SparkSpecBase {

  import spark.implicits._

  // batch = doc_id % 3. Texts:
  //  - "alpha": ids 5 (batch 2) and 6 (batch 0) — batch-sequential keeps 6
  //    (earliest batch), global min would keep 5: THE discriminating case;
  //  - "beta": ids 1 and 7, both batch 1 — intra-batch keeper = min = 1;
  //  - "gamma": id 2 only — trivially kept;
  //  - "delta": ids 0 (batch 0) and 4 (batch 1) — earliest batch AND min
  //    agree on 0 (the non-discriminating shape, kept for contrast).
  private val corpus = Seq(
    (5L, "alpha doc one two three"),
    (6L, "alpha doc one two three"),
    (1L, "beta doc four five six"),
    (7L, "beta doc four five six"),
    (2L, "gamma doc seven eight nine"),
    (0L, "delta doc ten eleven twelve"),
    (4L, "delta doc ten eleven twelve"))

  private val expectedKeepers = Set(6L, 1L, 2L, 0L)

  test("replayExactDedup keeps the earliest-batch occurrence, not the global min id") {
    val out = StreamingEvents.replayExactDedup(
      corpus.toDF("doc_id", "text"), "text", keepOrder = Seq("doc_id"),
      batchCol = pmod(col("doc_id"), lit(3)), numBatches = 3,
      root = "/tmp/graft-replay-spec-exact", ledgerTable = "replay_spec_exact")
    assert(out.select("doc_id").as[Long].collect().toSet === expectedKeepers)
  }

  test("replayNearDup over verbatim copies keeps the same batch-sequential set") {
    // verbatim copies -> identical signatures -> estimate exactly 1.0:
    // every LSH decision is deterministic and the near-dup keeper set
    // matches the exact sink's batch-sequential rule (intra-batch keeper
    // = connected-component min id = min id for identical-text groups)
    val out = StreamingEvents.replayNearDup(
      corpus.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.7,
      batchCol = pmod(col("doc_id"), lit(3)), numBatches = 3,
      root = "/tmp/graft-replay-spec-near", ledgerTable = "replay_spec_near")
    assert(out.select("doc_id").as[Long].collect().toSet === expectedKeepers)
  }

  // Retention semantics under the injected logical clock (batch b at
  // minute b, 90 s window): a KEPT row suppresses exactly the next batch;
  // a SUPPRESSED occurrence is not re-stamped and so does not extend the
  // window. batch = doc_id % 4:
  //  - "alpha" at 0,1,2: kept 0; suppressed 1; RE-ADMITTED 2 (the batch-1
  //    hit didn't refresh — the discriminating case);
  //  - "beta" at 4,6 (batches 0,2): gap 120 s > 90 — both kept;
  //  - "gamma" at 8,9 (batches 0,1): inside the window — only 8 kept;
  //  - "eps" at 12,14,15 (batches 0,2,3): kept 12; re-admitted 14; 15
  //    suppressed by the FRESH batch-2 stamp;
  //  - "delta" at 3 only — trivially kept.
  test("replayExactDedup with retention re-admits expired texts, no refresh from suppressed hits") {
    val corpus = Seq(
      (0L, "alpha one"), (1L, "alpha one"), (2L, "alpha one"),
      (4L, "beta two"), (6L, "beta two"),
      (8L, "gamma three"), (9L, "gamma three"),
      (12L, "eps four"), (14L, "eps four"), (15L, "eps four"),
      (3L, "delta five"))
    val out = StreamingEvents.replayExactDedup(
      corpus.toDF("doc_id", "text"), "text", keepOrder = Seq("doc_id"),
      batchCol = pmod(col("doc_id"), lit(4)), numBatches = 4,
      root = "/tmp/graft-replay-spec-ret", ledgerTable = "replay_spec_ret",
      retention = Some("seen_at > {now} - INTERVAL 90 SECONDS"),
      clock = Some(StreamingEvents.utcMinuteClock))
    assert(out.select("doc_id").as[Long].collect().toSet ===
      Set(0L, 2L, 4L, 6L, 8L, 12L, 14L, 3L))
  }

  test("replayNearDup with retention: banded-ledger expiry follows the same recurrence") {
    // verbatim copies -> deterministic LSH decisions, so the keeper set
    // must equal the exact sink's retention recurrence on the same corpus
    val corpus = Seq(
      (0L, "alpha one two three"), (1L, "alpha one two three"), (2L, "alpha one two three"),
      (4L, "beta four five six"), (6L, "beta four five six"),
      (8L, "gamma seven eight nine"), (9L, "gamma seven eight nine"),
      (12L, "eps ten eleven twelve"), (14L, "eps ten eleven twelve"), (15L, "eps ten eleven twelve"),
      (3L, "delta thirteen fourteen fifteen"))
    val out = StreamingEvents.replayNearDup(
      corpus.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.7,
      batchCol = pmod(col("doc_id"), lit(4)), numBatches = 4,
      root = "/tmp/graft-replay-spec-nearret", ledgerTable = "replay_spec_nearret",
      retention = Some("seen_at > {now} - INTERVAL 90 SECONDS"),
      clock = Some(StreamingEvents.utcMinuteClock))
    assert(out.select("doc_id").as[Long].collect().toSet ===
      Set(0L, 2L, 4L, 6L, 8L, 12L, 14L, 3L))
  }

  test("a {now} retention token without an injected clock fails loudly") {
    // drop catalog entry AND location: a previous JVM's run leaves the
    // warehouse dir behind while the fresh metastore forgot the table
    spark.sql("DROP TABLE IF EXISTS replay_spec_noclock")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "replay_spec_noclock")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    val led = StreamingEvents.exactDedupLedger("replay_spec_noclock",
      retention = Some("seen_at > {now} - INTERVAL 90 SECONDS"))
    led.append(Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("fingerprint", "seen_at"))
    val ex = intercept[RuntimeException] { led.readOrEmpty(spark) }
    assert(ex.getMessage.contains("no clock was injected"))
  }

  test("replay handles an EMPTY batch id (dynamic partitionBy writes no dir)") {
    // batch 1 has zero rows: the one-pass dynamic-partitioned staging emits
    // no __stage_b=1 directory, so the guard must stage an empty parquet
    // file for it (the old per-batch coalesce(1) writes did implicitly) —
    // the replay still triggers 3 batches and the keeper set is unchanged
    val sparse = Seq( // batch = doc_id % 3; no id with doc_id % 3 == 1
      (0L, "alpha doc one two three"),
      (6L, "alpha doc one two three"),
      (3L, "beta doc four five six"),
      (2L, "gamma doc seven eight nine"),
      (5L, "gamma doc seven eight nine"))
    val out = StreamingEvents.replayExactDedup(
      sparse.toDF("doc_id", "text"), "text", keepOrder = Seq("doc_id"),
      batchCol = pmod(col("doc_id"), lit(3)), numBatches = 3,
      root = "/tmp/graft-replay-spec-empty", ledgerTable = "replay_spec_empty")
    assert(out.select("doc_id").as[Long].collect().toSet === Set(0L, 3L, 2L))
  }

  test("replay is idempotent across re-runs (state cleaned on entry)") {
    val run = () => StreamingEvents.replayExactDedup(
      corpus.toDF("doc_id", "text"), "text", keepOrder = Seq("doc_id"),
      batchCol = pmod(col("doc_id"), lit(3)), numBatches = 3,
      root = "/tmp/graft-replay-spec-idem", ledgerTable = "replay_spec_idem")
    assert(run().count() === 4L)
    assert(run().count() === 4L) // a stale ledger/output would change this
  }

  // The sq5 harness at fixture scale. Time-ordered batches (boundaries at
  // minutes 30 and 60); gap 600 s. Each user certifies one mechanism:
  //  - user 1 events at minutes 0, 5 (batch 0) and 40 (batch 1): gap 35
  //    min > 10 min closes {0,5} when 40 arrives (successor-closure
  //    ACROSS a batch boundary); session {40} stays open until the
  //    sentinel flush (timeout path);
  //  - user 2 events at minutes 25 (batch 0) and 31 (batch 1): gap 6 min
  //    — ONE session SPANNING the batch boundary, emitted by the flush;
  //  - user 3 event at minute 70 (batch 2, the last real batch): a
  //    session that NO successor can close — only the sentinel flush
  //    emits it (the case that fails if the flush machinery breaks).
  test("replaySessionize equals batch gap-and-island; sentinel flushes open sessions and never emits") {
    def m(i: Int) = new java.sql.Timestamp(1735689600000L + i * 60000L) // 2025-01-01 UTC + i min
    val events = Seq(
      (1L, m(0), 10L), (1L, m(5), 11L), (1L, m(40), 12L),
      (2L, m(25), 20L), (2L, m(31), 21L),
      (3L, m(70), 30L)).toDF("user_id", "ts", "event_id")
    val batched = events.withColumn("__batch",
      org.apache.spark.sql.functions.when(col("ts") < lit(m(30)), 0)
        .when(col("ts") < lit(m(60)), 1).otherwise(2))
    val out = StreamingEvents.replaySessionize(batched, gapSeconds = 600,
      batchCol = col("__batch"), numBatches = 3,
      root = "/tmp/graft-replay-spec-sess")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Int)]
      .collect().toSet
    val expected = Set(
      (1L, m(0), m(5), 2), (1L, m(40), m(40), 1),
      (2L, m(25), m(31), 2),
      (3L, m(70), m(70), 1))
    assert(out === expected) // includes: no sentinel (-1) row emitted
    // and the batch operator agrees on the same corpus
    val batch = graft.operators.Sessionize.byGap(events, Seq("user_id"),
        col("ts"), Seq(col("ts"), col("event_id")), gapSeconds = 600)
      .groupBy("user_id", "session_id")
      .agg(org.apache.spark.sql.functions.min("ts").as("session_start"),
        org.apache.spark.sql.functions.max("ts").as("session_end"),
        org.apache.spark.sql.functions.count(lit(1)).cast("int").as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Int)]
      .collect().toSet
    assert(batch === expected)
  }
}
