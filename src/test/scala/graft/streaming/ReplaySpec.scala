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

  test("replay is idempotent across re-runs (state cleaned on entry)") {
    val run = () => StreamingEvents.replayExactDedup(
      corpus.toDF("doc_id", "text"), "text", keepOrder = Seq("doc_id"),
      batchCol = pmod(col("doc_id"), lit(3)), numBatches = 3,
      root = "/tmp/graft-replay-spec-idem", ledgerTable = "replay_spec_idem")
    assert(run().count() === 4L)
    assert(run().count() === 4L) // a stale ledger/output would change this
  }
}
