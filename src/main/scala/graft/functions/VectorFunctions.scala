package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Dense-vector math over `array<float>` embedding columns, expressed with
 * Spark's higher-order functions (`zip_with` + `aggregate`) so everything
 * stays a native column expression — no UDF boundary, usable inside joins,
 * aggregations, and window functions at full scale.
 */
object VectorFunctions {

  /** Sum of elements. */
  def arraySum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Dot product of two equal-length vectors. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Euclidean (L2) norm. */
  def l2Norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2Norm(a)
    val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Squared Euclidean distance. */
  def sqDist(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))

  /**
   * Sign bits of projections onto `planes` random hyperplanes, packed into a
   * long — the random-hyperplane LSH key for cosine similarity. Planes are
   * derived deterministically from `seed` on the driver and inlined as
   * literals (dims × planes doubles — tiny), so the expression is fully
   * codegen'd and needs no broadcast join.
   */
  def hyperplaneLshKey(v: Column, dims: Int, planes: Int, seed: Long = 42L): Column = {
    require(planes <= 63, "pack at most 63 sign bits into a long")
    val rnd = new scala.util.Random(seed)
    val keys = (0 until planes).map { p =>
      val plane = Array.fill(dims)(rnd.nextGaussian())
      val proj = aggregate(
        zip_with(v, typedlit(plane.toSeq), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    keys.reduce(_ + _)
  }
}
