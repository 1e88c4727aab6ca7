package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Exact and n-gram-Jaccard deduplication for document corpora.
 *
 * Exact dedup is a hash-groupBy on a normalized content fingerprint: one
 * shuffle on the 64-bit hash — the canonical 100 TB-safe layout (the hash is
 * uniformly distributed, so no skew, and only (hash, id) pairs shuffle, not
 * document bodies). Near-dup via n-gram Jaccard runs on candidate pairs only
 * (from [[MinHash]] banding) — never all-pairs.
 */
object Dedup {

  /** Mark exact duplicates by normalized-content fingerprint: adds
    * `dup_group` (the fingerprint), `dup_rank` (1 = keeper, ordered by
    * `keepOrder`), `is_dup`. */
  def exact(df: DataFrame, text: Column, keepOrder: Seq[Column]): DataFrame = {
    val withFp = df.withColumn("dup_group", TextFunctions.fingerprint(text))
    val w = Window.partitionBy(col("dup_group")).orderBy(keepOrder: _*)
    withFp
      .withColumn("dup_rank", row_number().over(w))
      .withColumn("is_dup", col("dup_rank") > 1)
  }

  /** Distinct-keeper projection: one row per exact-duplicate group. */
  def exactKeepers(df: DataFrame, text: Column, keepOrder: Seq[Column]): DataFrame =
    exact(df, text, keepOrder).filter(!col("is_dup"))
      .drop("dup_group", "dup_rank", "is_dup")

  /**
   * Exact n-gram Jaccard similarity for given candidate pairs.
   *
   * @param pairs  (leftId, rightId) candidate pairs (e.g. from MinHash bands)
   * @param docs   (id, text)
   * @return pairs with `jaccard` — |shingles∩| / |shingles∪| on word n-grams
   */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, text: Column,
                   n: Int = 3): DataFrame = {
    // Shingles are hashed to 64-bit ints once per document, so the per-pair
    // array_intersect compares longs instead of strings — the pair join is
    // the quadratic part, so per-element cost there dominates everything.
    // (xxhash64 collisions within one document's shingle set are ~1e-15.)
    val sh = docs.select(col(idCol).as("__id"),
      array_distinct(transform(TextFunctions.shingles(text, n), s => xxhash64(s)))
        .as("__sh"))
    val leftId = pairs.columns(0)
    val rightId = pairs.columns(1)
    pairs
      .join(sh.withColumnRenamed("__id", leftId).withColumnRenamed("__sh", "__sh_l"), leftId)
      .join(sh.withColumnRenamed("__id", rightId).withColumnRenamed("__sh", "__sh_r"), rightId)
      .withColumn("__inter", size(array_intersect(col("__sh_l"), col("__sh_r"))))
      .withColumn("__union", size(col("__sh_l")) + size(col("__sh_r")) - col("__inter"))
      .withColumn("jaccard",
        when(col("__union") === 0, lit(0.0))
          .otherwise(col("__inter").cast("double") / col("__union")))
      .drop("__sh_l", "__sh_r", "__inter", "__union")
  }

  /** All within-group candidate pairs (leftId < rightId) for a grouping key —
    * utility for small blocking keys (e.g. same source). */
  def blockedPairs(df: DataFrame, idCol: String, blockCol: Column): DataFrame = {
    val a = df.select(blockCol.as("__b"), col(idCol).as("left_id"))
    val b = df.select(blockCol.as("__b"), col(idCol).as("right_id"))
    a.join(b, Seq("__b")).filter(col("left_id") < col("right_id"))
      .select("left_id", "right_id").distinct()
  }

  /**
   * Blocked n-gram Jaccard via an inverted-index join: explode hashed
   * shingles, equi-join on (block, shingle) to count common shingles per
   * pair, then reconstruct Jaccard from per-doc set sizes.
   *
   * Produces exactly the pairs with ≥ 1 common shingle — identical to the
   * all-pairs variant for any threshold > 0 — but the shuffle moves
   * (block, shingle_hash, id) rows instead of evaluating |A|·|B| array
   * intersections per pair, so cost scales with actual overlap, not with
   * block size squared. This is the 100 TB shape for block-local near-dup.
   */
  def ngramJaccardBlocked(docs: DataFrame, idCol: String, blockCol: Column,
                          text: Column, n: Int = 3,
                          threshold: Double = 0.0): DataFrame = {
    val sh = docs.select(col(idCol).as("__id"), blockCol.as("__b"),
        array_distinct(transform(TextFunctions.shingles(text, n), s => xxhash64(s))).as("__sh"))
      .withColumn("__size", size(col("__sh")))
    val exploded = sh.select(col("__id"), col("__b"), col("__size"),
      explode(col("__sh")).as("__shingle"))

    val a = exploded.toDF("left_id", "__b", "left_size", "__shingle")
    val b = exploded.toDF("right_id", "__b", "right_size", "__shingle")
    a.join(b, Seq("__b", "__shingle"))
      .filter(col("left_id") < col("right_id"))
      .groupBy("left_id", "right_id", "left_size", "right_size")
      .agg(count(lit(1)).as("__inter"))
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (col("left_size") + col("right_size") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select("left_id", "right_id", "jaccard")
  }
}
