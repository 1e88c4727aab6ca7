package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** IVF k-means refinement: on a corpus with clear cluster structure the
  * refined cells must align with the true clusters, and IVF top-1 must agree
  * with brute force for queries whose neighbors share their cell. */
class KnnSpec extends SparkSpecBase {

  // 4 well-separated cluster centers in 8 dims, 25 points each, deterministic
  private lazy val vecs: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Seq(
      Array.fill(8)(0.0f), Array.fill(8)(10.0f),
      Array.tabulate(8)(i => if (i % 2 == 0) 10.0f else -10.0f),
      Array.fill(8)(-10.0f))
    (0 until 100).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("kmeansCentroids converges onto the true cluster centers") {
    val cents = Knn.kmeansCentroids(vecs, "vec_id", "embedding", nCells = 4, iters = 4)
      .collect().map(_.getSeq[Double](1))
    assert(cents.length == 4)
    // every centroid must sit within noise range of one true center
    val trueCenters = Seq(
      Seq.fill(8)(0.0), Seq.fill(8)(10.0),
      Seq.tabulate(8)(i => if (i % 2 == 0) 10.0 else -10.0), Seq.fill(8)(-10.0))
    cents.foreach { c =>
      val nearest = trueCenters.map(t =>
        t.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum).min
      assert(nearest < 1.0, s"centroid $c far from every true center")
    }
  }

  test("refined IVF top-1 matches brute force on clustered data") {
    val bf = Knn.bruteForceTopK(vecs, vecs, "vec_id", "embedding", k = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Knn.ivfTopK(vecs, "vec_id", "embedding", k = 1,
        nCells = 4, nProbe = 1, kmeansIters = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // with clean clusters and refined centroids, same-cluster nearest
    // neighbors are found for essentially every query
    val agree = bf.count { case (q, n) => ivf.get(q).contains(n) }
    assert(agree >= 95, s"IVF agreed on only $agree/100 top-1 neighbors")
  }

  test("auto-sized IVF records its cell count (≈√2n, floor 16) and returns neighbors") {
    graft.core.Decisions.clear()
    val out = Knn.ivfTopK(vecs, "vec_id", "embedding", k = 1, nProbe = 2, kmeansIters = 2)
    assert(out.count() > 0)
    // 100 vectors → ceil(√200)=15 → clamped to the floor of 16
    assert(graft.core.Decisions.snapshot.get("ivf.autoNCells(n=100)").contains("16"))
  }

  // 40 byte-identical embeddings (a giant LSH bucket in every table) mixed
  // with the clustered corpus — the vector analog of DedupSkewSpec
  private lazy val withDups: DataFrame = {
    import spark.implicits._
    val dup = Array.tabulate(8)(i => 1.0f + i)
    (1000L until 1040L).map(i => (i, dup)).toDF("vec_id", "embedding")
      .union(vecs)
  }

  test("lshTopK bucket cap keeps cosine-1 neighbors of identical embeddings") {
    val capped = Knn.lshTopK(withDups, "vec_id", "embedding", k = 3, dims = 8,
      maxBucketSize = Some(10))
    val dupRows = capped.filter(col("query_id") >= 1000L)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine")))
    // every dup-group member keeps 3 neighbors, all from the group, cosine 1
    val byQuery = dupRows.groupBy(_._1)
    assert(byQuery.keySet == (1000L until 1040L).toSet)
    byQuery.values.foreach { rows =>
      assert(rows.length == 3)
      assert(rows.forall { case (_, n, c) => n >= 1000L && math.abs(c - 1.0) < 1e-9 })
    }
  }

  test("lshCandidates bucket cap degrades giant buckets to bounded chunk pairs") {
    // cap 10: the 40-dup bucket (and the ~25-member tight-cluster buckets)
    // exceed it — over-cap buckets must contribute BOUNDED candidates
    // (linear in bucket size), not d² and not zero (r7: drop-based capping
    // measured recall 0.017 on a near-dup-saturated corpus at sf10)
    val capped = Knn.lshCandidates(withDups, "vec_id", "embedding", dims = 8,
      planes = 10, tables = 4, maxBucketSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Knn.lshCandidates(withDups, "vec_id", "embedding", dims = 8,
      planes = 10, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // degradation generates a SUBSET of the true same-bucket pair space
    assert(capped.subsetOf(uncapped))
    // every member of the saturated 40-dup bucket keeps some dup candidates
    val dupIds = (1000L until 1040L).toSet
    val dupWithCand = capped.collect { case (a, b) if dupIds(a) && dupIds(b) => a }
    assert(dupIds.subsetOf(dupWithCand.toSet),
      "every saturated-bucket member must keep same-bucket candidates")
    // ...but boundedly: ≤ d·(W+1) per direction per table vs d² uncapped
    val dupPairCount = capped.count { case (a, b) => dupIds(a) && dupIds(b) }
    assert(dupPairCount < 40 * 39,
      s"over-cap bucket contributed $dupPairCount pairs — quadratic, not bounded")
    // a cap above every bucket size changes nothing
    val bigCap = Knn.lshCandidates(withDups, "vec_id", "embedding", dims = 8,
      planes = 10, tables = 4, maxBucketSize = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bigCap == uncapped)
  }

  test("lshTopK bucket cap preserves PERTURBED near-duplicate neighbors (r7 recall find)") {
    // the failure mode the recall harness caught at sf10: near-identical
    // (but not bit-identical) vectors saturate their bucket in every table;
    // drop-based capping removed all their candidates and the
    // identical-vector recovery couldn't see them (recall 0.017). Chunk
    // degradation must keep near-cosine-1 top-k for every member.
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(8)(i => 1.0f + i)
    val perturbed = (2000L until 2040L).map { i =>
      (i, base.map(x => x * (1.0f + (rnd.nextFloat() - 0.5f) * 0.001f)))
    }.toDF("vec_id", "embedding").union(vecs)
    val out = Knn.lshTopK(perturbed, "vec_id", "embedding", k = 3, dims = 8,
        maxBucketSize = Some(10))
      .filter(col("query_id") >= 2000L)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine")))
    val byQuery = out.groupBy(_._1)
    assert(byQuery.keySet == (2000L until 2040L).toSet,
      "every saturated-bucket member must keep approximate neighbors")
    byQuery.values.foreach { rows =>
      assert(rows.nonEmpty &&
        rows.forall { case (_, n, c) => n >= 2000L && c > 0.999 })
    }
  }

  test("cosineNearDuplicates cap keeps the dup group connected with linear output") {
    val out = Knn.cosineNearDuplicates(withDups, "vec_id", "embedding",
        threshold = 0.95, dims = 8, maxBucketSize = Some(10))
      .filter(col("left_id") >= 1000L || col("right_id") >= 1000L)
      .collect().map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
      .toSet
    // the exact-dup star (group-min 1000 ↔ every member) must be present —
    // guaranteed connectivity regardless of chunk layout
    val star = (1001L until 1040L).map(b => (1000L, b)).toSet
    assert(star.subsetOf(out))
    // chunk-pair degradation may add more intra-group cosine-1 pairs, but
    // the total must stay linear in group size, never the d²/2 clique
    assert(out.forall { case (a, b) => a >= 1000L && b >= 1000L },
      "no cross-group pair can reach cosine 0.95")
    assert(out.size < 40 * 10,
      s"${out.size} pairs for a 40-dup group — should be linear, not quadratic")
  }
}
