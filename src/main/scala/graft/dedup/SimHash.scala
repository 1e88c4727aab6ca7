package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * SimHash near-duplicate fingerprinting.
 *
 * Layout chosen for scale: explode tokens → hash-aggregate 64 per-bit
 * sign-sums → recombine into a 64-bit fingerprint. The 64 `sum(when(...))`
 * columns all live in ONE whole-stage-codegen'd hash aggregate with map-side
 * partial aggregation, so the shuffle carries one 64-long row per document —
 * not the tokens. (A per-row higher-order-function formulation would avoid
 * the explode but evaluates lambdas interpreted; the explode+agg shape is
 * faster and is the one that survives 100 TB.)
 *
 * Near-dup candidates: Hamming distance ≤ d via the pigeonhole trick — split
 * the fingerprint into d+1 chunks; any pair within distance d must share one
 * exact chunk → equi-join per chunk.
 */
object SimHash {

  /** (id, simhash BIGINT) per document. */
  def fingerprints(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode_outer(TextFunctions.tokens(text)).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("__tok").isNull, 0)
        .when(shiftright(col("__h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"__b$b")
    }
    val agg = toks.groupBy("__id").agg(bitSums.head, bitSums.tail: _*)
    val packed = (0 until 64).map { b =>
      when(col(s"__b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    agg.select(col("__id").as(idCol), packed.as("simhash"))
  }

  /** Hamming distance between two packed fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * Pairs (left_id < right_id) with Hamming distance ≤ maxDistance, using
   * (maxDistance+1)-chunk pigeonhole blocking so the join is equi, then an
   * exact Hamming filter.
   */
  def nearDuplicates(docs: DataFrame, idCol: String, text: Column,
                     maxDistance: Int = 3): DataFrame = {
    val chunks = maxDistance + 1
    val width = 64 / chunks
    val fps = fingerprints(docs, idCol, text)
    val keyed = fps.select(col(idCol).as("__id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("simhash"), c * width)
            .bitwiseAND((1L << width) - 1).as("chunk_val"))
      }: _*)).as("__c"))
      .select(col("__id"), col("simhash"),
        col("__c.chunk_idx").as("chunk_idx"), col("__c.chunk_val").as("chunk_val"))
    val a = keyed.select(col("chunk_idx"), col("chunk_val"),
      col("__id").as("left_id"), col("simhash").as("__sh_l"))
    val b = keyed.select(col("chunk_idx"), col("chunk_val"),
      col("__id").as("right_id"), col("simhash").as("__sh_r"))
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("left_id") < col("right_id"))
      .withColumn("hamming_dist", hamming(col("__sh_l"), col("__sh_r")))
      .filter(col("hamming_dist") <= maxDistance)
      .select("left_id", "right_id", "hamming_dist")
      .distinct()
  }
}
