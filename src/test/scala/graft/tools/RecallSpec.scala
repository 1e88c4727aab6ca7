package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase

/**
 * Recall floors for the approximate family at sf0.01, via [[Recall]] — the
 * same harness that produces the three-scale recall table in BENCH_NOTES.md.
 *
 * Context for the ANN floors: the synthetic embeddings are near-uniform
 * random vectors with NO cluster structure, so a query's true top-3 are only
 * marginally closer than the bulk — the hardest possible corpus for bucketed
 * ANN (LSH tables and IVF cells both work by exploiting locality that this
 * data barely has). Measured recall@3 here is ~0.95 for LSH (4 tables ×
 * full Hamming-1 multi-probe, the r7 default — 0.46 without probing) and
 * ~0.34 (IVF, nProbe=2/√(2n) cells): the LSH floor now also pins the
 * multi-probe wiring (a regression that drops probe keys falls back to
 * ~0.46, far below the floor), while the IVF floor pins auto-sizing against
 * the round-6 fixed-cells collapse. The across-scale stability of these
 * numbers (the actual auto-sizing claim) is measured at sf0.1/sf1/sf10 by
 * `runMain graft.tools.Recall` — see BENCH_NOTES.md.
 *
 * The near-dup paths carry exact-Jaccard verification on candidates, so
 * precision is 1 and recall is the whole story; on this corpus (and at every
 * measured scale) the guards lose NOTHING — recall exactly 1.0, asserted
 * exactly, matching the driver's dedup2 brute-force-oracle equality.
 */
class RecallSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.01"

  private lazy val measured: Map[String, Double] = {
    assume(Files.exists(Paths.get(dir)), s"$dir not present")
    // full query coverage at this sf (500 vectors): every vector is scored
    Recall.measure(spark, dir, queryTarget = 500).toMap
  }

  test("knn2 (LSH, auto planes+probes, cap 64): recall@3 above regression floor") {
    assert(measured("knn2_lsh_recall_at3") >= 0.85,
      s"LSH recall ${measured("knn2_lsh_recall_at3")} below floor — " +
        "bucket collapse or multi-probe keys dropped?")
  }

  test("knn3 (IVF, auto cells, nProbe 2): recall@3 above regression floor") {
    assert(measured("knn3_ivf_recall_at3") >= 0.25,
      s"IVF recall ${measured("knn3_ivf_recall_at3")} below floor — cell collapse?")
  }

  test("dedup2 (MinHash-LSH, guards ON): pair recall at J >= 0.5 is exactly 1") {
    assert(measured("dedup2_pairs_exact") > 0, "degenerate: no true pairs to find")
    assert(measured("dedup2_pair_recall") == 1.0)
  }

  test("ngram1 (inverted index, doc-freq cap ON): pair recall at J >= 0.2 is exactly 1") {
    assert(measured("ngram1_pairs_exact") > 0, "degenerate: no true pairs to find")
    assert(measured("ngram1_pair_recall") == 1.0)
  }
}
