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

  test("lshCandidates bucket cap drops giant buckets and only them") {
    // cap 10: the 40-dup bucket AND the ~25-member tight-cluster buckets all
    // exceed it — candidate generation must drop exactly the over-cap
    // buckets' pairs (a subset of uncapped) and all dup-dup pairs with them
    val capped = Knn.lshCandidates(withDups, "vec_id", "embedding", dims = 8,
      planes = 10, tables = 4, maxBucketSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a >= 1000L && b >= 1000L })
    val uncapped = Knn.lshCandidates(withDups, "vec_id", "embedding", dims = 8,
      planes = 10, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    // a cap above every bucket size changes nothing
    val bigCap = Knn.lshCandidates(withDups, "vec_id", "embedding", dims = 8,
      planes = 10, tables = 4, maxBucketSize = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bigCap == uncapped)
  }

  test("cosineNearDuplicates cap recovers identical vectors as star edges") {
    val out = Knn.cosineNearDuplicates(withDups, "vec_id", "embedding",
        threshold = 0.95, dims = 8, maxBucketSize = Some(10))
      .filter(col("left_id") >= 1000L)
      .collect().map(r => (r.getAs[Long]("left_id"), r.getAs[Long]("right_id")))
      .toSet
    // star: group-min 1000 ↔ every member
    assert(out == (1001L until 1040L).map(b => (1000L, b)).toSet)
  }
}
