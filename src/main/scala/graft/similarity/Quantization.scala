package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar int8 embedding quantization (beyond reference — the storage-side
 * counterpart of the ANN operators). A 100 TB corpus with float32
 * embeddings spends most of its embedding bytes on precision ANN never
 * uses; per-vector min/max scalar quantization cuts that 4× (64 floats →
 * 64 bytes + two doubles) with a HARD, per-element reconstruction bound
 * of half a quantization step — the property the spec asserts.
 *
 * Everything is pure column algebra (`array_min`/`array_max`/`transform`
 * inside whole-stage codegen, no UDF, no shuffle), and the arithmetic is
 * chosen to be CROSS-ENGINE EXACT so the driver oracle can replay it:
 * floats widen to double (exact), one fixed double expression shape
 * `(x − mn)/scale + 0.5` under `floor` (identical IEEE semantics in any
 * engine — `round()` would not be, its half-way rule differs by engine),
 * and a constant vector (scale 0) quantizes to all-zero codes instead of
 * dividing by zero.
 */
object Quantization {

  /**
   * Quantize `vecCol` (array<float>) to 8-bit codes: adds `q`
   * (array<int>, values 0..255), `q_min` and `q_scale` (double — the
   * per-vector dequantization parameters). Codes are
   * `floor((x − min)/scale + 0.5)` with `scale = (max − min)/255`;
   * x = min → 0 and x = max → 255 exactly, everything else within half a
   * step of its reconstruction.
   */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val mn = array_min(v).cast("double")
    val scale = (array_max(v).cast("double") - mn) / lit(255.0)
    df.withColumn("q_min", mn)
      .withColumn("q_scale", scale)
      .withColumn("q", transform(v, x =>
        when(col("q_scale") === lit(0.0), lit(0L))
          .otherwise(floor((x.cast("double") - col("q_min")) / col("q_scale") + lit(0.5)))
          .cast("int")))
  }

  /** Reconstruct an array<double> from codes + per-vector parameters:
    * `min + q·scale`. Paired with [[int8]], every element lands within
    * `scale/2` of the original. */
  def dequantize(q: Column, qMin: Column, qScale: Column): Column =
    transform(q, c => qMin + c.cast("double") * qScale)
}
