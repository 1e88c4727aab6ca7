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
  def signature(text: Column, n: Int = 3, k: Int = 32, seed: Long = 42L): Column =
    signatureFromHashed(
      array_distinct(transform(TextFunctions.shingles(text, n), s => xxhash64(s))),
      k, seed)

  /** [[signature]] from a precomputed array of xxhash64'd distinct shingles
    * (the [[hashedBase]] column) — duplicates introduced by the mod cannot
    * change a minimum, so this is bit-identical to [[signature]] on the same
    * text while sharing the tokenize→shingle→hash work with the fingerprint
    * and verification phases. */
  def signatureFromHashed(hs: Column, k: Int = 32, seed: Long = 42L): Column = {
    val cs = coeffs(k, seed)
    ColumnBridge.column(graft.functions.MinHashSig(
      ColumnBridge.expression(transform(hs, h => pmod(h, lit(Prime)))),
      cs.map(_._1), cs.map(_._2), Prime))
  }

  /** One-tokenize base table `(__id, __toks, __hs)`: whitespace tokens and
    * xxhash64'd distinct word-`n`-gram shingles. Every phase of
    * [[nearDuplicates]] (LSH signature, exact fingerprint, Jaccard verify)
    * derives from this — persisted, the corpus is tokenized ONCE instead of
    * once per phase, which at 100 TB is the difference between one and three
    * full text scans. */
  private[graft] def hashedBase(docs: DataFrame, idCol: String, text: Column, n: Int): DataFrame =
    docs.select(col(idCol).as("__id"), TextFunctions.tokens(text).as("__toks"))
      .withColumn("__hs", array_distinct(transform(
        TextFunctions.shinglesFromTokens(col("__toks"), n), s => xxhash64(s))))

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
   *
   * `maxBucketSize`: skew guard — a band bucket holding d documents emits d²
   * candidate pairs, and near-duplicate-heavy corpora (templated boilerplate,
   * mass-mirrored pages) produce buckets of 10⁵+ docs whose self-join stalls
   * the stage. Buckets above the cap are dropped from candidate generation;
   * callers that set the cap MUST recover identical documents separately
   * (see [[nearDuplicates]], which unions exact-fingerprint pairs back in).
   * With the cap set this method is EAGER — it materializes the over-cap
   * bucket set at call time to pick the guarded or plain plan (see
   * [[graft.operators.SkewGuards.adaptiveDropOverCapRows]]).
   */
  def candidatePairs(docs: DataFrame, idCol: String, text: Column, n: Int = 3,
                     bands: Int = 8, rowsPerBand: Int = 4,
                     seed: Long = 42L,
                     maxBucketSize: Option[Int] = None): DataFrame =
    candidatePairsFromBase(hashedBase(docs, idCol, text, n), bands, rowsPerBand,
      seed, maxBucketSize)._1

  /** Returns (pairs, capActive). With a cap set the over-cap bucket set is
    * materialized at call time (EAGER, same contract as
    * [[Dedup.ngramJaccardBlocked]]); when it is empty the plain banded plan
    * runs — identical output — and `capActive = false` tells callers the
    * exact-fingerprint recovery is redundant. */
  private def candidatePairsFromBase(base: DataFrame, bands: Int, rowsPerBand: Int,
                                     seed: Long,
                                     maxBucketSize: Option[Int]): (DataFrame, Boolean) = {
    val k = bands * rowsPerBand
    // Drop empty-shingle docs (all−1 sentinel signature — min hash of a
    // nonempty set is in [0, p)): they all share one giant bucket whose d²
    // pairs are discarded downstream at any threshold > 0 anyway. Identical
    // sub-n-token docs are a fingerprint-group concern, not an LSH one.
    val sigs = base.select(col("__id"),
      signatureFromHashed(col("__hs"), k, seed).as("__sig"))
      .filter(element_at(col("__sig"), 1) =!= -1L)
    val bucketsRaw = sigs
      .select(col("__id"), explode(bandKeys(col("__sig"), bands, rowsPerBand)).as("__b"))
      .select(col("__id"), col("__b.band_idx").as("band_idx"),
        col("__b.band_hash").as("band_hash"))
    // under the cap the bucket table has multiple consumers (the over-cap
    // count agg and the anti-join input) — persist it so the shingle +
    // signature pipeline runs once, not once per consumer
    val buckets = if (maxBucketSize.isDefined)
      bucketsRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else bucketsRaw
    val (kept, capActive) = maxBucketSize match {
      case None => (buckets, false)
      case Some(cap) => graft.operators.SkewGuards
        .adaptiveDropOverCapRows(buckets, Seq("band_idx", "band_hash"), cap)
    }
    val a = kept.withColumnRenamed("__id", "left_id")
    val b = kept.withColumnRenamed("__id", "right_id")
    val pairs = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("left_id") < col("right_id"))
      .select("left_id", "right_id")
      .distinct()
    (if (maxBucketSize.isDefined)
      graft.core.OperatorCaches.owned(pairs, Seq(buckets))
    else pairs, capActive)
  }

  /** Pairs of documents with identical normalized content — the complement
    * that makes bucket caps safe: identical docs form the biggest buckets of
    * all, but are recovered here by one fingerprint groupBy instead of LSH.
    *
    * Docs with fewer than `n` tokens (empty shingle sets) are excluded: every
    * pair among them has Jaccard 0 under n-gram verification, so they were
    * only ever generated to be discarded — and ALL empty/whitespace docs
    * share `fingerprint('')`, making them the worst O(d²) group of the lot.
    *
    * `star = true` emits the d−1 star edges (group-min id → other id) per
    * fingerprint group instead of the full d(d−1)/2 clique — the shape
    * consumers like [[Dedup.connectedComponents]] want (identical component
    * labels, linear output), and the only uncapped-quadratic path left once
    * LSH buckets are capped. */
  private def exactPairs(base: DataFrame, n: Int, star: Boolean): DataFrame = {
    // fingerprint from the shared token column — identical to
    // TextFunctions.fingerprint(text), minus the re-tokenization
    val fps = base
      .filter(size(col("__toks")) >= n)
      .select(col("__id"), xxhash64(concat_ws(" ", col("__toks"))).as("__fp"))
    if (star) {
      val reps = fps.groupBy("__fp")
        .agg(min(col("__id")).as("left_id"), count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .select("__fp", "left_id")
      fps.join(reps, Seq("__fp"))
        .filter(col("__id") =!= col("left_id"))
        .select(col("left_id"), col("__id").as("right_id"))
    } else {
      val a = fps.select(col("__fp"), col("__id").as("left_id"))
      val b = fps.select(col("__fp"), col("__id").as("right_id"))
      a.join(b, Seq("__fp")).filter(col("left_id") < col("right_id"))
        .select("left_id", "right_id")
    }
  }

  /** Candidates + exact-Jaccard verification ≥ threshold. With
    * `maxBucketSize` set, giant LSH buckets are skipped and exact-duplicate
    * pairs are recovered via content fingerprints, so the only losable pairs
    * are non-identical docs whose every shared band hits a capped bucket.
    * `exactStar = true` thins the recovered exact-duplicate groups to star
    * edges (representative → member, Jaccard exactly 1 by construction) —
    * use it when feeding [[Dedup.connectedComponents]] or any consumer that
    * doesn't need the full clique, since an identical-document group of size
    * d otherwise emits d(d−1)/2 output rows no cap can prevent.
    *
    * Contract at `threshold = 0.0` with a cap set: identical docs of fewer
    * than `n` tokens (including empty/whitespace docs, whose pairwise
    * Jaccard is defined as 0) are NOT recovered by the fingerprint path —
    * recovery targets Jaccard-1 groups only. Use a positive threshold, or
    * run [[Dedup.exact]] for sub-`n`-token identity.
    *
    * With a cap set this method is EAGER (the over-cap probe runs at call
    * time — see [[graft.operators.SkewGuards.adaptiveDropOverCapRows]]). */
  def nearDuplicates(docs: DataFrame, idCol: String, text: Column,
                     threshold: Double, n: Int = 3, bands: Int = 8,
                     rowsPerBand: Int = 4, seed: Long = 42L,
                     maxBucketSize: Option[Int] = None,
                     exactStar: Boolean = false): DataFrame = {
    // One tokenize pass for the whole operator: the persisted base feeds the
    // LSH signatures, the exact fingerprints AND the verify join.
    val base = hashedBase(docs, idCol, text, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    graft.core.OperatorCaches.owned(
      nearDuplicatesFromBase(base, threshold, n, bands, rowsPerBand, seed,
        maxBucketSize, exactStar),
      Seq(base))
  }

  /** [[nearDuplicates]] over a caller-managed persisted [[hashedBase]] —
    * for pipelines that need the tokenized base for MORE than the pair
    * search (the streaming near-dup sink also derives the survivors' ledger
    * signatures from it; recomputing them from text was a second full
    * tokenize→shingle→hash→minhash pass over every batch). The CALLER owns
    * `base`'s cache lifecycle; this method only manages its internal
    * candidate-pair cache. Candidate pairs are persisted — a tiny fraction
    * of the corpus — so the verify join doesn't re-run the banding plan. */
  private[graft] def nearDuplicatesFromBase(base: DataFrame, threshold: Double,
                                            n: Int, bands: Int, rowsPerBand: Int,
                                            seed: Long,
                                            maxBucketSize: Option[Int],
                                            exactStar: Boolean): DataFrame = {
    // recovery only runs when a bucket actually exceeded the cap — when none
    // did, the guarded plan IS the plain banded plan and every LSH-findable
    // pair (including identical docs) is already in `lsh`
    val (lsh, capped) = candidatePairsFromBase(base, bands, rowsPerBand, seed, maxBucketSize)
    val cands = (if (capped) lsh.union(exactPairs(base, n, exactStar)).distinct() else lsh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.core.OperatorCaches.owned(
      Dedup.jaccardFromHashed(cands, base.select(col("__id"), col("__hs")))
        .filter(col("jaccard") >= threshold),
      Seq(cands))
  }
}
