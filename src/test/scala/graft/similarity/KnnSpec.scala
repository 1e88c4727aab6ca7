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
}
