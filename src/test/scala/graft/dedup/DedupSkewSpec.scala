package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/**
 * Skew-guard behavior of the near-duplicate paths on a pathological block:
 * many byte-identical documents (every shingle/band/chunk lands in one giant
 * bucket) mixed with ordinary distinct docs. The guards must (a) still return
 * every identical pair — recovered via exact fingerprints, not LSH — and
 * (b) leave guard-off outputs unchanged.
 */
class DedupSkewSpec extends SparkSpecBase {

  private val nDup = 40 // 40 identical docs → C(40,2) = 780 expected pairs

  private lazy val docs: DataFrame = {
    import spark.implicits._
    val dup = (0 until nDup).map(i =>
      (i.toLong, "blk", "the same boilerplate sentence repeated across every mirror of the page"))
    val uniq = (nDup until nDup + 20).map(i =>
      (i.toLong, "blk", s"document number $i has its own words entirely unlike any other item $i"))
    (dup ++ uniq).toDF("doc_id", "source", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("left_id", "right_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val allDupPairs: Set[(Long, Long)] =
    (for { a <- 0 until nDup; b <- (a + 1) until nDup } yield (a.toLong, b.toLong)).toSet

  test("ngramJaccardBlocked with doc-frequency cap keeps all identical pairs at jaccard 1") {
    val out = Dedup.ngramJaccardBlocked(docs, "doc_id", col("source"), col("text"),
      n = 3, threshold = 0.2, maxShingleDocFreq = Some(5))
    assert(pairSet(out) == allDupPairs)
    assert(out.agg(min("jaccard"), max("jaccard")).collect()(0) ===
      org.apache.spark.sql.Row(1.0, 1.0))
  }

  test("ngramJaccardBlocked cap does not change the uncapped output on mixed corpora") {
    val capped = Dedup.ngramJaccardBlocked(docs, "doc_id", col("source"), col("text"),
      n = 3, threshold = 0.2, maxShingleDocFreq = Some(100))
    val uncapped = Dedup.ngramJaccardBlocked(docs, "doc_id", col("source"), col("text"),
      n = 3, threshold = 0.2)
    assert(pairSet(capped) == pairSet(uncapped))
  }

  test("MinHash.nearDuplicates with bucket cap recovers identical docs via fingerprints") {
    val out = MinHash.nearDuplicates(docs, "doc_id", col("text"), threshold = 0.5,
      maxBucketSize = Some(5))
    assert(pairSet(out) == allDupPairs)
  }

  test("MinHash.candidatePairs bucket cap drops the giant bucket") {
    val capped = pairSet(
      MinHash.candidatePairs(docs, "doc_id", col("text"), maxBucketSize = Some(5)))
    // every band bucket of the 40-doc dup block exceeds the cap → no pair of
    // identical docs survives (pairs among the merely-similar unique docs,
    // whose buckets are small, legitimately remain)
    assert(capped.intersect(allDupPairs).isEmpty)
    val uncapped = pairSet(MinHash.candidatePairs(docs, "doc_id", col("text")))
    assert(capped.subsetOf(uncapped))
  }

  test("connectedComponents labels a chain graph and separate components correctly") {
    import spark.implicits._
    // 1-2-3-...-10 chain (worst diameter) plus an isolated pair
    val pairs = ((1L to 9L).map(i => (i, i + 1)) :+ (100L, 101L))
      .toDF("left_id", "right_id")
    val comp = Dedup.connectedComponents(pairs, "left_id", "right_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 10L).forall(comp(_) == 1L))
    assert(comp(100L) == 100L && comp(101L) == 100L)
  }

  test("SimHash.nearDuplicates with bucket cap still reports identical docs at distance 0") {
    val out = SimHash.nearDuplicates(docs, "doc_id", col("text"), maxDistance = 3,
      maxBucketSize = Some(5))
    val zeroPairs = pairSet(out.filter(col("hamming_dist") === 0))
    assert(allDupPairs.subsetOf(zeroPairs))
  }

  test("connectedComponents converges on a diameter-200 chain within 20 rounds (pointer doubling)") {
    import spark.implicits._
    val pairs = (1L to 200L).map(i => (i, i + 1)).toDF("left_id", "right_id")
    val comp = Dedup.connectedComponents(pairs, "left_id", "right_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 201L).forall(comp(_) == 1L))
  }

  test("connectedComponents keeps string ids intact (no numeric cast)") {
    import spark.implicits._
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y"))
      .toDF("left_id", "right_id")
    val comp = Dedup.connectedComponents(pairs, "left_id", "right_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(Seq("doc-a", "doc-b", "doc-c").forall(comp(_) == "doc-a"))
    assert(comp("x") == "x" && comp("y") == "x")
  }

  test("MinHash.nearDuplicates exactStar thins the identical group to star edges") {
    val out = MinHash.nearDuplicates(docs, "doc_id", col("text"), threshold = 0.5,
      maxBucketSize = Some(5), exactStar = true)
    val dupEdges = pairSet(out).filter { case (a, b) => a < nDup && b < nDup }
    // star: representative (min id 0) → each member, d−1 edges, all jaccard 1
    assert(dupEdges == (1 until nDup).map(b => (0L, b.toLong)).toSet)
    assert(out.filter(col("left_id") === 0).agg(min("jaccard")).collect()(0).getDouble(0) == 1.0)
  }

  test("empty and sub-n-token docs never generate candidate pairs") {
    import spark.implicits._
    val withEmpties = docs.union(Seq(
      (900L, "blk", ""), (901L, "blk", "   "), (902L, "blk", ""),
      (903L, "blk", "two words")) // < n=3 tokens → empty shingle set
      .toDF("doc_id", "source", "text"))
    val cands = pairSet(MinHash.candidatePairs(withEmpties, "doc_id", col("text")))
    assert(!cands.exists { case (a, b) => a >= 900L || b >= 900L })
    val near = pairSet(MinHash.nearDuplicates(withEmpties, "doc_id", col("text"),
      threshold = 0.5, maxBucketSize = Some(5)))
    assert(!near.exists { case (a, b) => a >= 900L || b >= 900L })
    assert(allDupPairs.subsetOf(near))
  }

  test("active bucket cap plans a BROADCAST anti-join split (and none when un-skewed)") {
    // skewed: the 40-doc identical block overflows cap=5 → the adaptive guard
    // must split with a broadcast anti-join, never a shuffled one
    val skewedPlan = MinHash.nearDuplicates(docs, "doc_id", col("text"),
        threshold = 0.5, maxBucketSize = Some(5))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(skewedPlan.contains("BroadcastHashJoin LeftAnti"),
      "— over-cap split must be a broadcast anti-join")
    assert(!skewedPlan.contains("SortMergeJoin LeftAnti"),
      "— over-cap split must not shuffle the bucket table")
    // un-skewed: a cap above every bucket size short-circuits to the plain
    // banded plan — no anti-join at all (PlanAuditSpec asserts the same on
    // the sf0.001 driver query)
    val plainPlan = MinHash.nearDuplicates(docs, "doc_id", col("text"),
        threshold = 0.5, maxBucketSize = Some(10000))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plainPlan.contains("LeftAnti"),
      "— empty over-cap set must short-circuit to the plain plan")
  }

  test("SimHash.nearDuplicates zeroStar emits star edges for the identical-simhash group") {
    val out = SimHash.nearDuplicates(docs, "doc_id", col("text"), maxDistance = 3,
      maxBucketSize = Some(5), zeroStar = true)
    val zeroDup = pairSet(out.filter(col("hamming_dist") === 0))
      .filter { case (a, b) => a < nDup && b < nDup }
    assert(zeroDup == (1 until nDup).map(b => (0L, b.toLong)).toSet)
  }

  test("Decisions records each adaptive choice at the moment it's taken") {
    import spark.implicits._
    graft.core.Decisions.clear()
    // skewed corpus, low cap → guard active on the MinHash band buckets
    MinHash.nearDuplicates(docs, "doc_id", col("text"),
      threshold = 0.5, maxBucketSize = Some(5)).count()
    // clean cap → split short-circuits to the plain plan
    Dedup.ngramJaccardBlocked(docs, "doc_id", col("source"), col("text"),
      n = 3, threshold = 0.2, maxShingleDocFreq = Some(10000)).count()
    // tiny graph → the r15 driver union-find tier takes it
    Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("left_id", "right_id"), "left_id", "right_id").count()
    // the driver-tier decision is keyed by edge count and overwritten by the
    // disabled-tier run below — assert it before re-running
    assert(graft.core.Decisions.snapshot
      .get("cc.driverTier(edges=4)").contains("true"),
      graft.core.Decisions.snapshot)
    // same graph with the tier disabled → the distributed loop's broadcast
    // cutover fires on round 1 (the pre-r15 decision trail)
    spark.conf.set("spark.graft.cc.driverEdgeCap", "-1")
    try Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L)).toDF("left_id", "right_id"), "left_id", "right_id").count()
    finally spark.conf.unset("spark.graft.cc.driverEdgeCap")
    val d = graft.core.Decisions.snapshot
    assert(d.get("skewGuard(band_idx+band_hash,cap=5).capActive").contains("true"), d)
    assert(d.get("ngram.frequentSplit(cap=10000).active").contains("false"), d)
    assert(d.get("cc.broadcastCutoverIteration").contains("1"), d)
    assert(d.contains("cc.iterations"), d)
  }
}
