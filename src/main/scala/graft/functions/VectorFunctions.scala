package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Dense-vector math over `array<float>` / `array<double>` embedding columns.
 *
 * Backed by the custom codegen'd Catalyst expressions in
 * [[VectorExpressions]] — Spark's higher-order functions (`zip_with` +
 * `aggregate`) are `CodegenFallback`, i.e. interpreted per element, which
 * made per-pair kernels the dominant cost of every similarity join (knn1 was
 * 29% of the round-1 bench). These stay inside whole-stage codegen as fused
 * primitive loops, no UDF boundary, usable in joins / aggregations / windows.
 */
object VectorFunctions {

  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(e)
  private def e(col: Column) = ColumnBridge.expression(col)

  /** Sum of elements. */
  def arraySum(v: Column): Column = c(ArraySumD(e(v)))

  /** Dot product of two equal-length vectors. */
  def dot(a: Column, b: Column): Column = c(DotProduct(e(a), e(b)))

  /** Euclidean (L2) norm. */
  def l2Norm(v: Column): Column = c(L2Norm(e(v)))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column = c(SquaredDistance(e(a), e(b)))

  /** The `nProbe` nearest centroid ids for each vector, nearest first —
    * the IVF assignment as one codegen'd expression (no n×k join rows, no
    * window sort). `ids`/`cents` must be aligned and in ascending-id order
    * (tie on distance keeps the earlier row). */
  def nearestCells(v: Column, ids: Seq[Long], cents: Seq[Seq[Double]],
                   nProbe: Int): Column =
    c(NearestCells(e(v), ids, cents, nProbe))

  /**
   * Sign bits of projections onto `planes` random hyperplanes, packed into a
   * long — the random-hyperplane LSH key for cosine similarity. Planes are
   * derived deterministically from `seed` on the driver and shipped as a
   * codegen reference object; all planes are evaluated in ONE fused pass over
   * the vector (the previous HOF form re-walked the vector per plane,
   * interpreted).
   */
  def hyperplaneLshKey(v: Column, dims: Int, planes: Int, seed: Long = 42L): Column = {
    require(planes <= 63, "pack at most 63 sign bits into a long")
    c(HyperplaneSignBits(e(v), hyperplanes(dims, planes, seed)))
  }

  /**
   * Multi-probe LSH key sequence: `array<long>` of 1 + `nProbes` keys — the
   * base [[hyperplaneLshKey]] (element 0) followed by the `nProbes`
   * single-bit-flip keys in order of increasing projection magnitude (the
   * multi-probe perturbation order of Lv et al., VLDB 2007). Same `seed` ⇒
   * element 0 equals [[hyperplaneLshKey]] bit-for-bit, so probed queries
   * join an index keyed by the plain function.
   */
  def hyperplaneProbeKeys(v: Column, dims: Int, planes: Int, nProbes: Int,
                          seed: Long = 42L): Column = {
    require(planes <= 63, "pack at most 63 sign bits into a long")
    c(HyperplaneProbeBits(e(v), hyperplanes(dims, planes, seed), nProbes))
  }

  /** The deterministic hyperplane matrix shared by the key/probe variants. */
  private def hyperplanes(dims: Int, planes: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dims)(rnd.nextGaussian()))
  }
}
