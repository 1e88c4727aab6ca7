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

  /** Per-partition key budget for the scoped ObjectHashAggregate fallback
    * raise around the fingerprint aggregation: SimHashAggregate's buffer is
    * a long[64] (~530 B with overhead) per document, so 2²⁰ keys bound the
    * un-spillable hash state at ~530 MB/task worst case. Default for the
    * `spark.graft.simhash.fallbackKeys` tunable ([[graft.core.Tunables]]):
    * the budget is a memory bound, raisable on a memory-rich cluster. */
  private val SimHashAggFallbackKeys: Long = 1L << 20

  private def fallbackKeys(spark: org.apache.spark.sql.SparkSession): Long =
    graft.core.Tunables.long(spark, "spark.graft.simhash.fallbackKeys",
      SimHashAggFallbackKeys)

  /** The lazy fingerprint plan — see [[fingerprints]] for why the public
    * entry point materializes instead of returning this directly. */
  private def fingerprintsPlan(docs: DataFrame, idCol: String, text: Column): DataFrame = {
    val toks = docs.select(col(idCol).as("__id"),
      explode_outer(TextFunctions.tokens(text)).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
    val simhash = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.SimHashAggregate(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          when(col("__tok").isNull, lit(null).cast("long")).otherwise(col("__h"))))
        .toAggregateExpression())
    toks.groupBy("__id").agg(simhash.as("simhash"))
      .select(col("__id").as(idCol), col("simhash"))
  }

  /** Documents below this stay LAZY (no persist, no scoped conf, no extra
    * job): under Spark's default 128-key fallback the degraded path is an
    * external sort of the exploded token stream, which at ≤100k docs
    * (≤ ~10⁸ tokens) is bounded and CHEAPER than what eager scoping costs —
    * the persist+force job measured ~0.7 s of fixed overhead at sf0.1
    * (BENCH_NOTES r8 medians note), pure loss on small corpora. Above the
    * threshold the sort is the scale-killer the scope exists to prevent.
    * Default for the `spark.graft.simhash.scopedMinDocs` tunable
    * ([[graft.core.Tunables]]) — a sandbox-measured crossover. */
  private val SimHashScopedMinDocs: Long = 100000L

  /** (id, simhash BIGINT) per document — the fused
    * [[graft.functions.SimHashAggregate]] accumulates all 64 sign-sums per
    * token in one compiled loop (the 64-column sum(when(...)) form evaluated
    * 64 branch expressions per token; same partial-agg shuffle shape).
    *
    * Materialization TIER (r8): one cheap `docs.count()` probe picks the
    * strategy. Small corpora return the plain lazy plan (Spark's fallback
    * sort of the modest token stream is cheaper than any eager machinery).
    * Large corpora persist + force the per-doc output (one 16-byte row per
    * document — tiny next to the token stream it reduces) inside a scoped
    * raise of the ObjectHashAggregate fallback threshold
    * ([[graft.core.GraftSession.withObjectAggFallbackKeys]]): the conf is
    * read at action time, so a lazy plan would execute under whatever
    * threshold the caller's session has, and the default would silently
    * degrade the fused aggregate to an external sort of the ENTIRE token
    * stream. The cache is released after the caller's first action.
    *
    * `nDocs` is the caller's already-known corpus size (the same pattern as
    * `Knn.topKByAgg`'s nGroups): `None` takes the CONSERVATIVE-EAGER path —
    * no probe count, scoped materialization regardless of size — because a
    * probe `docs.count()` here would re-evaluate the whole pipeline when
    * `docs` is a derived DataFrame rather than a bare scan (r8 shipped an
    * unconditional count: one strictly extra corpus pass per call on
    * derived inputs). Callers with a bare table read get the lazy
    * small-corpus tier back by passing `Some(docs.count())` — metadata-only
    * under parquet aggregate pushdown. */
  def fingerprints(docs: DataFrame, idCol: String, text: Column,
                   nDocs: Option[Long] = None): DataFrame = {
    val minDocs = graft.core.Tunables.long(docs.sparkSession,
      "spark.graft.simhash.scopedMinDocs", SimHashScopedMinDocs)
    val eager = nDocs.forall(_ >= minDocs)
    graft.core.Decisions.record(
      s"simhash.scopedMaterialize(n=${nDocs.getOrElse(-1L)})", eager)
    if (!eager) fingerprintsPlan(docs, idCol, text)
    else {
      // persist() inside the scope, NOT just the force: CacheManager
      // snapshots the session conf at cache registration, so a raise
      // applied only around count() never reaches the cache-building
      // SimHashAgg — it would silently sort-fallback at the 128-key
      // default (the r13 topKByAgg finding; same pattern here).
      graft.core.GraftSession.withObjectAggFallbackKeys(
        docs.sparkSession, fallbackKeys(docs.sparkSession)) {
        val out = fingerprintsPlan(docs, idCol, text)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        graft.core.OperatorCaches.owned(out, Seq(out), skipMatches = 1)
        out.count()
        out
      }
    }
  }

  /** Hamming distance between two packed fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * Pairs (left_id < right_id) with Hamming distance ≤ maxDistance, using
   * (maxDistance+1)-chunk pigeonhole blocking so the join is equi, then an
   * exact Hamming filter.
   *
   * `maxBucketSize`: skew guard — identical/templated documents share a
   * simhash, so one popular fingerprint puts d docs in the same chunk bucket
   * and d² pairs into the join. Chunk buckets above the cap are skipped;
   * documents with IDENTICAL simhash (distance 0 — the giant-bucket case by
   * construction) are recovered exactly by a fingerprint-equality self-join
   * that emits each group once, so capping only risks pairs at distance
   * 1..maxDistance whose every matching chunk is over the cap.
   *
   * `zeroStar`: the recovery self-join is itself O(d²) for an
   * identical-simhash group of d docs. With `zeroStar = true` it emits the
   * d−1 star edges (group-min id → member) instead of the clique — same
   * connected components, linear output; use for cluster-labeling consumers.
   *
   * With a cap set this method is EAGER (the over-cap probe runs at call
   * time — see [[graft.operators.SkewGuards.adaptiveDropOverCapRows]]).
   */
  def nearDuplicates(docs: DataFrame, idCol: String, text: Column,
                     maxDistance: Int = 3,
                     maxBucketSize: Option[Int] = None,
                     zeroStar: Boolean = false): DataFrame = {
    val chunks = maxDistance + 1
    val width = 64 / chunks
    // the fingerprint table feeds both join sides, the bucket-cap agg and the
    // distance-0 recovery — persist it so the explode+aggregate fingerprint
    // pass runs once, not once per consumer. Forced HERE under the scoped
    // fallback raise (not via the public eager [[fingerprints]]): this
    // operator runs its own internal probe actions over the fingerprint
    // table before the caller ever acts, and those would release a
    // skip-once self-registration early — so the lifecycle stays with the
    // owned(result, …) registration at the end of this method.
    val fps = fingerprintsPlan(docs, idCol, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val allKeyed = fps.select(col(idCol).as("__id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk_idx"),
          shiftright(col("simhash"), c * width)
            .bitwiseAND((1L << width) - 1).as("chunk_val"))
      }: _*)).as("__c"))
      .select(col("__id"), col("simhash"),
        col("__c.chunk_idx").as("chunk_idx"), col("__c.chunk_val").as("chunk_val"))
    // adaptive cap: materialize the over-cap chunk-bucket set once (EAGER,
    // same contract as Dedup.ngramJaccardBlocked's cap path); when empty the
    // plain blocked plan runs and the distance-0 recovery below is skipped —
    // every identical-simhash pair is already in the blocked join's output.
    // The scoped fallback raise wraps this EXISTING first action over the
    // fps cache (r8: a dedicated count here was a pure extra job — the
    // probe materializes the fingerprint aggregate anyway, so wrapping it
    // keeps the aggregate hash-based at zero added cost); the no-cap branch
    // still needs its own forcing action.
    val (keyed, capActive) =
      graft.core.GraftSession.withObjectAggFallbackKeys(
        docs.sparkSession, fallbackKeys(docs.sparkSession)) {
        maxBucketSize match {
          case None =>
            fps.count()
            (allKeyed, false)
          case Some(cap) => graft.operators.SkewGuards
            .adaptiveDropOverCapRows(allKeyed, Seq("chunk_idx", "chunk_val"), cap)
        }
      }
    val a = keyed.select(col("chunk_idx"), col("chunk_val"),
      col("__id").as("left_id"), col("simhash").as("__sh_l"))
    val b = keyed.select(col("chunk_idx"), col("chunk_val"),
      col("__id").as("right_id"), col("simhash").as("__sh_r"))
    val blocked = a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("left_id") < col("right_id"))
      .withColumn("hamming_dist", hamming(col("__sh_l"), col("__sh_r")))
      .filter(col("hamming_dist") <= maxDistance)
      .select("left_id", "right_id", "hamming_dist")
      .distinct()
    val result = if (!capActive) blocked
    else {
      // recover distance-0 pairs (identical simhash ⇒ every chunk bucket is
      // the giant one) via a fingerprint-equality self-join
      val zeros = if (zeroStar) {
        val reps = fps.groupBy("simhash")
          .agg(min(col(idCol)).as("left_id"), count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .select("simhash", "left_id")
        fps.join(reps, Seq("simhash"))
          .filter(col(idCol) =!= col("left_id"))
          .select(col("left_id"), col(idCol).as("right_id"),
            lit(0).cast("integer").as("hamming_dist"))
      } else {
        val ha = fps.select(col("simhash"), col(idCol).as("left_id"))
        val hb = fps.select(col("simhash"), col(idCol).as("right_id"))
        ha.join(hb, Seq("simhash"))
          .filter(col("left_id") < col("right_id"))
          .select(col("left_id"), col("right_id"),
            lit(0).cast("integer").as("hamming_dist"))
      }
      blocked.union(zeros).distinct()
    }
    graft.core.OperatorCaches.owned(result, Seq(fps))
  }
}
