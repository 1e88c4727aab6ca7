package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.TextFunctions

/** The fused SimHash aggregate must reproduce the 64-column sum(when(...))
  * formulation bit-for-bit (including empty docs → fingerprint 0). */
class SimHashSpec extends SparkSpecBase {

  test("fused aggregate matches the per-bit column formulation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content altogether here"),
      (4L, ""), // empty → fingerprint 0
      (5L, "single"))
      .toDF("doc_id", "text")

    val fused = SimHash.fingerprints(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference formulation, inline
    val toks = docs.select(col("doc_id"),
      explode_outer(TextFunctions.tokens(col("text"))).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("__tok").isNull, 0)
        .when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$b")
    }
    val packed = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    val expected = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(fused == expected)
    assert(fused(4L) == 0L)
  }
}
