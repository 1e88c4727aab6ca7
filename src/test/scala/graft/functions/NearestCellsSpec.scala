package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/**
 * The fused [[NearestCells]] assignment must replicate the relational
 * crossJoin + window formulation EXACTLY — `ivfTopK` switches between the
 * two by index size, and the knn3 frozen snapshot only exercises the
 * literal path, so the equivalence itself is pinned here: same distances
 * (same accumulation order as `sqDist`), same tie rule (`dist asc,
 * cell_id asc`), same truncation for k < nProbe.
 */
class NearestCellsSpec extends SparkSpecBase {

  private def joinFormulation(vecs: Seq[(Long, Seq[Float])],
                              cents: Seq[(Long, Seq[Double])],
                              nProbe: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    val v = vecs.toDF("id", "v")
    val c = cents.toDF("cell_id", "cv")
    val w = Window.partitionBy(col("id")).orderBy(col("__d").asc, col("cell_id").asc)
    v.crossJoin(broadcast(c))
      .withColumn("__d", VectorFunctions.sqDist(col("v"), col("cv")))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= nProbe)
      .select("id", "cell_id", "__r")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def fusedFormulation(vecs: Seq[(Long, Seq[Float])],
                               cents: Seq[(Long, Seq[Double])],
                               nProbe: Int): Set[(Long, Long, Int)] = {
    import spark.implicits._
    vecs.toDF("id", "v")
      .select(col("id"),
        posexplode(VectorFunctions.nearestCells(col("v"),
          cents.map(_._1), cents.map(_._2), nProbe)).as(Seq("__p", "cell_id")))
      .select(col("id"), col("cell_id"), (col("__p") + 1).cast("int").as("__r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("fused assignment equals join+window on a random corpus") {
    val rnd = new scala.util.Random(11L)
    val vecs = Seq.tabulate(200)(i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    // non-contiguous, unordered-in-value cell ids; ascending-id input order
    val cents = Seq(3L, 7L, 8L, 20L, 31L, 40L).map(id =>
      (id, Seq.fill(16)(rnd.nextGaussian())))
    assert(fusedFormulation(vecs, cents, 2) === joinFormulation(vecs, cents, 2))
  }

  test("distance ties resolve to the lower cell id in both formulations") {
    // two IDENTICAL centroids — every vector is equidistant to both
    val cent = Seq.fill(4)(0.5)
    val cents = Seq((5L, cent), (9L, cent))
    val vecs = Seq.tabulate(10)(i => (i.toLong, Seq.fill(4)(i / 10.0f)))
    val fused = fusedFormulation(vecs, cents, 1)
    assert(fused === joinFormulation(vecs, cents, 1))
    assert(fused.forall(_._2 == 5L), "tie must keep the lower cell id")
  }

  test("nProbe beyond the cell count truncates identically") {
    val rnd = new scala.util.Random(12L)
    val vecs = Seq.tabulate(20)(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
    val cents = Seq((1L, Seq.fill(8)(0.1)), (2L, Seq.fill(8)(0.9)))
    assert(fusedFormulation(vecs, cents, 5) === joinFormulation(vecs, cents, 5))
  }
}
