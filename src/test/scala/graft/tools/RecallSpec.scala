package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col

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

  /**
   * Saturated-bucket regime, pinned as a spec instead of prose (r7 verdict):
   * when one near-identical cluster vastly exceeds the LSH bucket cap, the
   * guard's bounded chunk degradation can only surface ~chunk/d of the exact
   * top-3 SLOTS — exact-slot recall@3 reads low BY DESIGN (0.30 at the sf10
   * replica corpus). The claim that makes that acceptable is that the
   * substitutes are interchangeable: every retrieved neighbor sits within
   * ~1e-8 cosine of the true top-3. This fixture (one 480-member cluster at
   * jitter 1e-4 over a 16-cap, deterministic seed) asserts that claim — a
   * regression in the chunk-degradation path (dropping over-cap buckets
   * instead of degrading, or losing coverage of saturated members) now
   * fails on the quality gap / coverage assertions instead of hiding behind
   * "low recall is expected".
   */
  test("saturated cluster: chunk degradation covers every query with near-exact substitutes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dims = 16
    val base = Array.fill(dims)(rnd.nextGaussian())
    val cluster = (0L until 480L).map { i =>
      (i, base.map(x => (x + 1e-4 * rnd.nextGaussian()).toFloat))
    }
    val background = (480L until 600L).map { i =>
      (i, Array.fill(dims)(rnd.nextGaussian().toFloat))
    }
    val vecs = (cluster ++ background).toDF("vec_id", "embedding")
      .repartition(4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cap = 16
    val k = 3
    val approx = graft.similarity.Knn.lshTopK(vecs, "vec_id", "embedding",
        k = k, dims = dims, tables = 4, maxBucketSize = Some(cap))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // sample of cluster members as queries (the saturated population)
    val qIds = (0L until 480L by 8).toSet
    val truth = graft.similarity.Knn.bruteForceTopK(
        vecs.filter(col("vec_id").isin(qIds.toSeq: _*)), vecs,
        "vec_id", "embedding", k = k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val approxQ = approx.filter(col("query_id").isin(qIds.toSeq: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // DEGRADE, not drop: every saturated query still gets its full k rows
    val perQuery = approxQ.groupBy("query_id").count()
      .select("count").as[Long].collect()
    assert(perQuery.length == qIds.size,
      s"only ${perQuery.length}/${qIds.size} saturated queries retrieved anything — over-cap buckets dropped?")
    assert(perQuery.forall(_ == k),
      s"some saturated query returned fewer than $k neighbors: ${perQuery.min}")

    // the regime is real: exact-slot recall well below 1 on this corpus
    // (deterministic — seeded fixture, seeded hyperplanes)
    val recall = Recall.annRecallAtK(approxQ, truth)
    assert(recall < 0.999,
      s"recall@3 = $recall — the fixture no longer saturates the cap; raise the cluster size")

    // ...and the substitutes are near-exact: mean per-query cosine gap
    // between true top-3 and retrieved top-3 within 1e-5 (measured ~1e-8;
    // a query with NO retrieved rows would contribute its full ~1.0 true
    // cosine, so this bound also re-asserts coverage)
    val gap = Recall.annQualityGap(approxQ, truth)
    info(f"saturated fixture: recall@3 = $recall%.3f, quality gap = $gap%g")
    assert(gap <= 1e-5,
      s"quality gap $gap — chunk-degradation substitutes no longer near-exact")

    vecs.unpersist(); approx.unpersist(); truth.unpersist(); approxQ.unpersist()
  }
}
