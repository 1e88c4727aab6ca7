package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.TextFunctions

/**
 * MinHash + LSH near-duplicate detection (shingle → minhash signature → band
 * → bucket join), entirely with codegen'd column expressions.
 *
 * Signature: k universal hashes h_i(x) = (a_i·x + b_i) mod p over xxhash64'd
 * shingles; `array_min` per permutation. Banding: split the k-length signature
 * into b bands of r rows; hash each band; documents sharing any (band, hash)
 * bucket are candidates. Candidate generation is a self-join on the bucket
 * key — the only shuffle moves (doc_id, band_hash) pairs, so the pattern
 * holds at 100 TB (with the usual guard of capping giant buckets).
 */
object MinHash {

  private val Prime = 2038074743L // < 2^31 so a·x+b stays in a long

  /** Deterministic (a_i, b_i) pairs from a seed. */
  private def coeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextLong(Prime - 1), rnd.nextLong(Prime)))
  }

  /**
   * MinHash signature (array<bigint> of length k) of word n-gram shingles.
   *
   * tokenize→shingle→xxhash64 produces the base hash array with built-in
   * codegen'd expressions; the k permutation minima are then computed by the
   * fused [[graft.functions.MinHashSig]] Catalyst expression — one compiled
   * k·|shingles| multiply-mod loop per row (the earlier higher-order-function
   * form allocated k interpreted intermediate arrays per row). Empty docs get
   * the all−1 sentinel signature so they only collide with each other.
   */
  def signature(text: Column, n: Int = 3, k: Int = 32, seed: Long = 42L): Column = {
    val cs = coeffs(k, seed)
    val base = transform(array_distinct(TextFunctions.shingles(text, n)),
      s => pmod(xxhash64(s), lit(Prime)))
    ColumnBridge.column(graft.functions.MinHashSig(
      ColumnBridge.expression(base), cs.map(_._1), cs.map(_._2), Prime))
  }

  /** Explode a signature into (band_idx, band_hash) LSH bucket keys. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band_idx"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * rowsPerBand + lit(1), lit(rowsPerBand)),
            v => v.cast("string")))).as("band_hash")))

  /**
   * Candidate near-duplicate pairs (left_id < right_id) via LSH banding.
   * k = bands × rowsPerBand hashes; similarity threshold ≈ (1/bands)^(1/rows).
   */
  def candidatePairs(docs: DataFrame, idCol: String, text: Column, n: Int = 3,
                     bands: Int = 8, rowsPerBand: Int = 4,
                     seed: Long = 42L): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = docs.select(col(idCol).as("__id"),
      signature(text, n, k, seed).as("__sig"))
    val buckets = sigs
      .select(col("__id"), explode(bandKeys(col("__sig"), bands, rowsPerBand)).as("__b"))
      .select(col("__id"), col("__b.band_idx").as("band_idx"),
        col("__b.band_hash").as("band_hash"))
    val a = buckets.withColumnRenamed("__id", "left_id")
    val b = buckets.withColumnRenamed("__id", "right_id")
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("left_id") < col("right_id"))
      .select("left_id", "right_id")
      .distinct()
  }

  /** Candidates + exact-Jaccard verification ≥ threshold. */
  def nearDuplicates(docs: DataFrame, idCol: String, text: Column,
                     threshold: Double, n: Int = 3, bands: Int = 8,
                     rowsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    // Candidate pairs are a tiny fraction of the corpus — persist them so the
    // exact-Jaccard verify join doesn't re-run the full shingle+band plan.
    val cands = candidatePairs(docs, idCol, text, n, bands, rowsPerBand, seed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.ngramJaccard(cands, docs, idCol, text, n)
      .filter(col("jaccard") >= threshold)
  }
}
