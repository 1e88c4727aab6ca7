package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/**
 * ScalaCheck property: the fused [[NearestCells]] assignment equals the
 * crossJoin + `row_number over (dist asc, cell_id asc)` formulation on
 * ARBITRARY inputs — dims 1-8, 1-8 centroids with deliberate duplicates
 * (distance ties), vectors sometimes copied from a centroid (zero
 * distance), nProbe sometimes beyond the cell count. `NearestCellsSpec`
 * pins three known shapes; this is the hedge against selection-buffer
 * edge cases those shapes miss (tie runs longer than the buffer,
 * equal-distance prefixes, single-cell indexes).
 *
 * Spark-action accounting: each evaluation runs ONE batch of vectors
 * against one centroid set through both formulations (2 jobs per case,
 * ~25 cases) instead of per-vector checks.
 */
class NearestCellsPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private final case class Case(vecs: List[(Long, List[Float])],
                                cents: List[(Long, List[Double])],
                                nProbe: Int)

  // coarse lattice coordinates → exact-tie distances are COMMON, which is
  // where the insertion buffer's stability matters
  private def genCoord(dims: Int): Gen[List[Double]] =
    Gen.listOfN(dims, Gen.choose(0, 4).map(_.toDouble / 2))

  private val genCase: Gen[Case] = for {
    dims <- Gen.choose(1, 8)
    k <- Gen.choose(1, 8)
    baseCents <- Gen.listOfN(k, genCoord(dims))
    dupMask <- Gen.listOfN(k, Gen.prob(0.3))
    // duplicate an earlier centroid under the mask — identical rows with
    // distinct ids force distance ties between different cell ids
    cents = baseCents.zip(dupMask).zipWithIndex.map { case ((c, dup), i) =>
      if (dup && i > 0) baseCents(i - 1) else c
    }
    ids <- Gen.listOfN(k, Gen.choose(1L, 50L)).map(_.distinct)
      .retryUntil(_.size >= 1)
    nVec <- Gen.choose(1, 20)
    vecCoords <- Gen.listOfN(nVec, Gen.frequency(
      3 -> genCoord(dims),
      1 -> Gen.oneOf(cents))) // exact centroid copies → zero distance
    nProbe <- Gen.choose(1, 5)
  } yield Case(
    vecCoords.zipWithIndex.map { case (c, i) => (i.toLong, c.map(_.toFloat)) },
    ids.sorted.zip(cents).map { case (id, c) => (id, c) },
    nProbe)

  test("fused assignment equals join+window on arbitrary inputs") {
    val prop = Prop.forAllNoShrink(genCase) { c =>
      val v = c.vecs.toDF("id", "v")
      val fused = v.select(col("id"),
          posexplode(VectorFunctions.nearestCells(col("v"),
            c.cents.map(_._1), c.cents.map(_._2), c.nProbe)).as(Seq("__p", "cell")))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val cdf = c.cents.toDF("cell_id", "cv")
      val w = Window.partitionBy(col("id")).orderBy(col("__d").asc, col("cell_id").asc)
      val joined = v.crossJoin(broadcast(cdf))
        .withColumn("__d", VectorFunctions.sqDist(col("v"), col("cv")))
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= c.nProbe)
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Int]("__r") - 1,
          r.getAs[Long]("cell_id"))).toSet
      val ok = fused == joined
      if (!ok) println(s"mismatch: nProbe=${c.nProbe} cents=${c.cents}\n" +
        s"fused=$fused\njoin=$joined")
      ok
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, s"NearestCells property failed: ${result.status}")
  }
}
