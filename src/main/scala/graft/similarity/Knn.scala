package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.VectorFunctions

/**
 * Approximate-nearest-neighbor search over an `array<float>` embedding column.
 *
 * - [[bruteForceTopK]]: exact cosine top-k via a join + window top-k — the
 *   correctness baseline. All-pairs, so only for small/query-side-broadcast
 *   workloads.
 * - [[lshTopK]]: the scale path — random-hyperplane LSH buckets (with
 *   multi-probe via several independent tables) restrict the pair space to
 *   same-bucket candidates; one equi-join shuffle on the bucket key.
 * - [[ivfTopK]]: IVF-style — k-means-lite centroids sampled from the corpus,
 *   vectors assigned to nearest centroid; queries probe `nProbe` nearest
 *   cells. Centroid assignment is a broadcast join (centroid table is tiny).
 */
object Knn {

  /** (id, vec, norm) projection: the L2 norm is computed once per vector
    * BEFORE any pair join — recomputing it per pair multiplies the dominant
    * cost of every similarity join by ~4×. */
  private def withNorm(vecs: DataFrame, idCol: String, vecCol: String,
                       id: String, v: String, n: String): DataFrame =
    vecs.select(col(idCol).as(id), col(vecCol).as(v),
      VectorFunctions.l2Norm(col(vecCol)).as(n))

  /** Pair-side cosine from precomputed norms: only the dot product runs per pair. */
  private def pairCosine(vl: Column, nl: Column, vr: Column, nr: Column): Column =
    when(nl === 0.0 || nr === 0.0, lit(0.0))
      .otherwise(VectorFunctions.dot(vl, vr) / (nl * nr))

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥ threshold
    * among LSH-bucket candidates (exact under the bucket approximation).
    * With `maxBucketSize` set, giant buckets degrade to bounded chunk pairs
    * plus connectivity links (see [[guardedCandidatePairs]]) and
    * identical-vector groups are additionally recovered as star edges
    * (member ↔ group-min id, cosine 1) — connectivity-preserving for
    * cluster consumers, linear output; the over-cap probe is EAGER (runs at
    * call time). */
  def cosineNearDuplicates(vecs: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, dims: Int, planes: Int = 0,
                           tables: Int = 3,
                           maxBucketSize: Option[Int] = None,
                           probes: Int = 0): DataFrame = {
    // planes = 0 (default): size the tables from the data — see [[autoPlanes]]
    val pl = if (planes > 0) planes else autoPlanes(vecs, idCol)
    // probes defaults to 0 here (unlike lshTopK): near-dup pairs sit at
    // cosine ≥ threshold ≈ 1, where multi-table agreement is near-certain —
    // measured pair recall is already 1.0 without probing (BENCH_NOTES).
    // limit = 0: each member pairs with the group minimum only — star edges
    // (emitted member→min, so normalize the order before the left<right cut).
    // Recovery only runs when a bucket actually exceeded the cap.
    val cands = (maxBucketSize match {
      case None => lshCandidates(vecs, idCol, vecCol, dims, pl, tables, probes = probes)
      case Some(cap) =>
        val (lsh, capped) = guardedCandidatePairs(vecs, idCol, vecCol, dims, pl, tables, cap, probes)
        if (!capped) lsh
        else lsh.union(exactDupVectorPairs(vecs, idCol, vecCol, limit = 0)
          .select(least(col("left_id"), col("right_id")).as("left_id"),
            greatest(col("left_id"), col("right_id")).as("right_id"))).distinct()
    }).filter(col("left_id") < col("right_id"))
    val v = withNorm(vecs, idCol, vecCol, "__id", "__v", "__n")
    cands
      .join(v.toDF("left_id", "__vl", "__nl"), "left_id")
      .join(v.toDF("right_id", "__vr", "__nr"), "right_id")
      .withColumn("cosine", pairCosine(col("__vl"), col("__nl"), col("__vr"), col("__nr")))
      .filter(col("cosine") >= threshold)
      .select("left_id", "right_id", "cosine")
  }

  /** Per-partition key budget for the scoped ObjectHashAggregate fallback
    * raise around [[topKByAgg]]'s materialization: the k-slot buffer is
    * ~16·k + 64 bytes per key (k ≤ 10 in every caller → ≤ ~224 B), so 2²¹
    * keys bound the un-spillable hash state at ~470 MB/task worst case —
    * and a partition with even more distinct queries still degrades to
    * sort, by design. Default for the `spark.graft.topk.fallbackKeys`
    * tunable ([[graft.core.Tunables]]) — the budget is a memory bound, so
    * an executor-memory-rich cluster can raise it. */
  private val TopKAggFallbackKeys: Long = 1L << 21

  /** Query-vector count below which [[topKByAgg]] stays LAZY (no persist,
    * no scoped conf, no extra job): under Spark's default 128-key fallback
    * the degraded path is an external sort of the scored candidate stream,
    * which at ≤100k queries (≤ ~5×10⁷ candidates under the auto-sized LSH
    * and IVF settings) is bounded and cheaper than the eager machinery —
    * the persist+force measured ~5% of knn2's sentinel-normalized time at
    * sf0.1 (BENCH_NOTES r8 medians note), pure loss on small corpora.
    * Above the threshold the degraded sort is the sf100 disk-exhaustion
    * trap the scope exists to prevent (sf10's 200k vectors take the eager
    * path, so the committed scale evidence keeps covering it). Default for
    * the `spark.graft.topk.scopedMinGroups` tunable
    * ([[graft.core.Tunables]]) — the crossover is a sandbox measurement. */
  private val TopKScopedMinGroups: Long = 100000L

  /** The tier predicate, shared with callers that must adapt their own
    * cache lifecycle to whether [[topKByAgg]] consumes its input eagerly
    * (unknown count → conservative eager). */
  private def topKEagerTier(spark: org.apache.spark.sql.SparkSession,
                            nGroups: Option[Long]): Boolean =
    nGroups.forall(_ >= graft.core.Tunables.long(spark,
      "spark.graft.topk.scopedMinGroups", TopKScopedMinGroups))

  /** (query_id, neighbor_id, rank, cosine) top-k per query via the bounded
    * [[graft.functions.TopKPairsAggregate]] — hash aggregation with a k-slot
    * buffer per query, NO sort of the scored stream. The window
    * (`row_number() <= k`) formulation sorts the full map-side stream before
    * WindowGroupLimit can prune it; on join-amplified streams (IVF cell
    * self-join: n·nProbe·(n/cells) rows) that sort's spill is what died at
    * the sf100 probe (~2 TB > any local disk).  Ordering replicates the
    * window form bit-for-bit: (cosine DESC, neighbor_id ASC).
    *
    * Materialization TIER (r8): `nGroups` is the caller's already-counted
    * query-vector total (None = unknown → conservative eager). Below
    * [[TopKScopedMinGroups]] the plain lazy plan returns. Otherwise the n·k
    * output is persisted and forced here, inside a scoped raise of the
    * ObjectHashAggregate fallback threshold
    * ([[graft.core.GraftSession.withObjectAggFallbackKeys]]) — Spark's
    * 128-keys-per-partition default would silently degrade the k-slot hash
    * aggregation back to a full-stream external sort, and the conf is read
    * at action time, so a lazy plan handed to the caller would execute
    * under whatever threshold the session then has. The cache is released
    * after the caller's first action ([[graft.core.OperatorCaches]] with
    * one skip for the internal force). */
  private def topKByAgg(scored: DataFrame, k: Int,
                        nGroups: Option[Long] = None): DataFrame = {
    val top = ColumnBridge.column(graft.functions.TopKPairsAggregate(
      ColumnBridge.expression(col("neighbor_id")),
      ColumnBridge.expression(col("cosine")), k).toAggregateExpression())
    val plan = scored.groupBy("query_id").agg(top.as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__t")))
      .select(col("query_id"), col("__t.neighbor_id").as("neighbor_id"),
        (col("__p") + 1).cast("int").as("rank"), col("__t.cosine").as("cosine"))
    val eager = topKEagerTier(scored.sparkSession, nGroups)
    graft.core.Decisions.record(
      s"topk.scopedMaterialize(n=${nGroups.getOrElse(-1L)})", eager)
    if (!eager) plan
    else {
      // The persist() MUST live inside the conf scope, not just the force:
      // CacheManager snapshots the session conf when the cache is
      // REGISTERED, and the cached plan thereafter executes under that
      // snapshot — a raise applied only around the count() never reaches
      // the cache-building aggregate, which silently runs at the default
      // 128-key threshold and externally sorts the full scored stream.
      // Found at the r13 sf100 probe (knn3 ~745 s post-r12-fix, executors
      // jstack'd in SortBasedAggregator DURING the scoped count; moving
      // persist inside the scope is the whole fix). This had been broken
      // since r8 scoped the raise: r7's 197 s row ran under a
      // session-wide raise that predated persist-and-force.
      graft.core.GraftSession.withObjectAggFallbackKeys(
        scored.sparkSession, graft.core.Tunables.long(scored.sparkSession,
          "spark.graft.topk.fallbackKeys", TopKAggFallbackKeys)) {
        val out = plan
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        // register BEFORE the force: listener events arrive in execution
        // order, so skipMatches = 1 lets the internal count pass and the
        // caller's first action release the cache
        graft.core.OperatorCaches.owned(out, Seq(out), skipMatches = 1)
        out.count()
        out
      }
    }
  }

  /** Exact top-k neighbors for every query vector (excludes self-matches on id). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "query_id", "__qv", "__qn")
    val c = withNorm(corpus, idCol, vecCol, "neighbor_id", "__cv", "__cn")
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", pairCosine(col("__qv"), col("__qn"), col("__cv"), col("__cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  /** Auto plane count targeting ~32-vector buckets: 2^planes ≈ n/32, clamped
    * to [4, 24]. A FIXED plane count is the same scale trap as a fixed IVF
    * cell count, in either direction: too few buckets for the corpus and the
    * per-bucket self-join goes quadratic; too many and — with a bucket cap
    * set — the AVERAGE bucket exceeds the cap, so the guard drops most of
    * the corpus and recall collapses. One count() probe, driver-side, eager;
    * recorded via [[graft.core.Decisions]]. */
  private def autoPlanes(vecs: DataFrame, idCol: String): Int =
    autoPlanesFromN(math.max(1L, vecs.select(col(idCol)).count()))

  private def autoPlanesFromN(n: Long): Int = {
    val p = math.max(4, math.min(24,
      math.ceil(math.log(n / 32.0) / math.log(2.0)).toInt))
    graft.core.Decisions.record(s"lsh.autoPlanes(n=$n)", p)
    p
  }

  /** (id, table_idx, bucket) hyperplane LSH keys under `tables` independent
    * tables. */
  private def hyperplaneKeyed(vecs: DataFrame, idCol: String, vecCol: String,
                              dims: Int, planes: Int, tables: Int): DataFrame =
    vecs.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .select(col("__id"), explode(array((0 until tables).map { t =>
        struct(lit(t).as("table_idx"),
          VectorFunctions.hyperplaneLshKey(col("__v"), dims, planes,
            seed = 42L + t).as("bucket"))
      }: _*)).as("__k"))
      .select(col("__id"), col("__k.table_idx").as("table_idx"),
        col("__k.bucket").as("bucket"))

  /** (id, table_idx, bucket) multi-probe key sequence: each id carries its
    * base bucket PLUS the `nProbes` lowest-margin single-bit-flip buckets
    * per table (seeds match [[hyperplaneKeyed]], so the base key joins an
    * index keyed by it bit-for-bit). The query side of a probed candidate
    * join — the index side stays [[hyperplaneKeyed]], so index size and
    * bucket statistics (the cap's subject) are untouched by probing. */
  private def probeKeyed(vecs: DataFrame, idCol: String, vecCol: String,
                         dims: Int, planes: Int, tables: Int,
                         nProbes: Int): DataFrame =
    vecs.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .select(col("__id"), explode(array((0 until tables).map { t =>
        struct(lit(t).as("table_idx"),
          VectorFunctions.hyperplaneProbeKeys(col("__v"), dims, planes, nProbes,
            seed = 42L + t).as("probes"))
      }: _*)).as("__k"))
      .select(col("__id"), col("__k.table_idx").as("table_idx"),
        explode(col("__k.probes")).as("bucket"))

  /** Candidate id pairs from a query-side keyed table joined against an
    * index-side keyed table on (table_idx, bucket). With the query side =
    * index side (= base keys) this is the classic same-bucket self-join,
    * both orders; with a multi-probe query side, same-bucket pairs still
    * appear in both orders (element 0 of every probe sequence is the base
    * key) and probe pairs appear query-first — exactly the side top-k
    * consumers read as the query.
    *
    * `dedup = false` skips the `distinct()`: the same pair colliding in
    * several tables (or via several probe keys) then reaches the consumer
    * once per collision. Pair-OUTPUT consumers (near-dup) need the
    * distinct; the top-k path does not — [[graft.functions.TopKPairsBuffer]]
    * dedupes on insert, so skipping the distinct removes a shuffle of the
    * ENTIRE candidate stream (billions of rows at the sf100 probe) while
    * producing a bit-identical top-k. */
  private def keyedPairs(query: DataFrame, index: DataFrame,
                         dedup: Boolean = true): DataFrame = {
    val a = query.select(col("table_idx"), col("bucket"), col("__id").as("left_id"))
    val b = index.select(col("table_idx"), col("bucket"), col("__id").as("right_id"))
    val joined = a.join(b, Seq("table_idx", "bucket"))
      .filter(col("left_id") =!= col("right_id"))
      .select("left_id", "right_id")
    if (dedup) joined.distinct() else joined
  }

  /** Same-bucket candidate id pairs (both orders) from a keyed table. */
  private def bucketPairs(keyed: DataFrame): DataFrame = keyedPairs(keyed, keyed)

  /** Chunk width for over-cap bucket degradation: each member of a saturated
    * bucket keeps ~this many same-bucket candidates per table. */
  private val OverCapChunkWidth = 8

  /**
   * Guarded candidate pairs: under-cap buckets self-join as usual; over-cap
   * buckets DEGRADE to bounded chunk pairs instead of being dropped.
   *
   * WHY (r7, measured — BENCH_NOTES "Recall evidence"): drop-based capping
   * collapses top-k recall exactly on the mass-near-duplicate corpora the
   * cap exists to survive. A cluster of d near-identical vectors saturates
   * its bucket in EVERY hash table (near-identical vectors agree on almost
   * every hyperplane sign), so dropping over-cap buckets removes every
   * candidate those d vectors had anywhere — and the identical-vector
   * recovery ([[exactDupVectorPairs]]) cannot see PERTURBED duplicates
   * (re-encoded/quantized copies; the sf10 replica corpus measured knn2
   * recall 0.017 under drop-capping vs ~1 after this change).
   *
   * Degradation shape: members of an over-cap bucket hash into chunks of
   * expected size (W+1); pairs form within each chunk, plus one edge per
   * chunk linking its representative (min id) to the bucket representative
   * so cluster consumers keep full-bucket connectivity. A bucket of d
   * contributes ~d·(W+1)/2 + d/(W+1) pairs — LINEAR in d vs the d² self-
   * join — with no giant per-bucket sort (the chunk id spreads the bucket
   * across tasks; no window, no skew). On a saturated bucket every
   * chunk-mate is a near-duplicate, so top-k quality survives; on a rare
   * false-collision bucket the downstream exact-cosine scoring discards
   * the junk pairs as before. The over-cap probe stays EAGER (one
   * map-side-combinable pass; plan frozen against the input as of the
   * call, same contract as [[graft.operators.SkewGuards]]).
   */
  private def guardedCandidatePairs(vecs: DataFrame, idCol: String, vecCol: String,
                                    dims: Int, planes: Int, tables: Int,
                                    cap: Int, probes: Int = 0,
                                    dedup: Boolean = true): (DataFrame, Boolean) = {
    val keyed = hyperplaneKeyed(vecs, idCol, vecCol, dims, planes, tables)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // multi-probe widens only the QUERY side of the candidate join; the
    // index side (and therefore bucket statistics, the cap's subject) is
    // unchanged. Probes landing on an over-cap bucket contribute nothing —
    // saturated buckets are served by the chunk degradation below, and an
    // outside query probing into one would reintroduce d-sized fanout.
    val query =
      if (probes <= 0) keyed
      else probeKeyed(vecs, idCol, vecCol, dims, planes, tables, probes)
    val keys = Seq("table_idx", "bucket")
    val bigK = keyed.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > cap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capActive = !bigK.isEmpty
    graft.core.Decisions.record(
      s"lsh.bucketCap(cap=$cap).capActive", capActive)
    if (!capActive) {
      bigK.unpersist()
      (graft.core.OperatorCaches.owned(keyedPairs(query, keyed, dedup), Seq(keyed)), false)
    } else {
      val w = OverCapChunkWidth
      val under = keyed.join(broadcast(bigK.select(keys.map(col): _*)), keys, "left_anti")
        .select(keyed.columns.map(col).toSeq: _*)
      // table_idx participates in the chunk hash so each table yields an
      // INDEPENDENT chunk layout — a member's candidate neighborhood is the
      // union of `tables` different W-sized samples of its bucket, not the
      // same sample repeated
      val chunked = keyed.join(broadcast(bigK), keys)
        .withColumn("__chunk", pmod(xxhash64(col("__id"), col("table_idx")),
          greatest((col("__n") / (w + 1)).cast("long"), lit(1L))))
      val ck = keys :+ "__chunk"
      val a = chunked.select((ck.map(col) :+ col("__id").as("left_id")): _*)
      val b = chunked.select((ck.map(col) :+ col("__id").as("right_id")): _*)
      // both orders, matching [[bucketPairs]]' contract (top-k consumers
      // read left_id as the query side)
      val within = a.join(b, ck)
        .filter(col("left_id") =!= col("right_id"))
        .select("left_id", "right_id")
      // connectivity: chunk representative ↔ bucket representative. Both
      // aggregates are map-side combinable; the per-bucket rep table is one
      // row per over-cap bucket — broadcast-sized by the cap's premise.
      val reps = chunked.groupBy(ck.map(col): _*).agg(min(col("__id")).as("__rep"))
      val bucketRep = reps.groupBy(keys.map(col): _*).agg(min(col("__rep")).as("__brep"))
      val links = reps.join(broadcast(bucketRep), keys)
        .filter(col("__rep") =!= col("__brep"))
        .select(col("__brep").as("left_id"), col("__rep").as("right_id"))
      val linksBoth = links.union(
        links.select(col("right_id").as("left_id"), col("left_id").as("right_id")))
      // query side joins the UNDER-cap index only: over-cap (table, bucket)
      // keys have no index rows, so this reduces to bucketPairs(under) when
      // probes = 0 and adds probe pairs into under-cap buckets otherwise
      val raw = keyedPairs(query, under, dedup = false)
        .union(within).union(linksBoth)
      val pairs = if (dedup) raw.distinct() else raw
      (graft.core.OperatorCaches.owned(pairs, Seq(keyed, bigK)), true)
    }
  }

  /** Same-bucket candidate pairs under `tables` independent hyperplane tables.
    *
    * `maxBucketSize`: skew guard — identical/near-identical embeddings (mass-
    * duplicated content) collapse into the same buckets in EVERY table, and a
    * bucket of d vectors puts d² pairs into the join. Buckets above the cap
    * degrade to bounded chunk pairs (linear in d — see
    * [[guardedCandidatePairs]] for the shape and the measured recall
    * rationale); the over-cap probe is EAGER. */
  def lshCandidates(vecs: DataFrame, idCol: String, vecCol: String, dims: Int,
                    planes: Int, tables: Int,
                    maxBucketSize: Option[Int] = None,
                    probes: Int = 0,
                    dedup: Boolean = true): DataFrame =
    maxBucketSize match {
      case None =>
        val keyed = hyperplaneKeyed(vecs, idCol, vecCol, dims, planes, tables)
        val query =
          if (probes <= 0) keyed
          else probeKeyed(vecs, idCol, vecCol, dims, planes, tables, probes)
        keyedPairs(query, keyed, dedup)
      case Some(cap) =>
        guardedCandidatePairs(vecs, idCol, vecCol, dims, planes, tables, cap, probes,
          dedup)._1
    }

  /** Ordered neighbor pairs among ids with an IDENTICAL embedding — the
    * recovery complement that makes LSH bucket caps safe for vectors:
    * identical embeddings are cosine-1 neighbors by definition and always
    * share every (giant) bucket. Each member is paired with the group's
    * `limit`+1 LOWEST ids excluding itself (cosine-1 neighbors are
    * interchangeable, so a deterministic subset suffices: `limit = k` keeps
    * k neighbors per member for top-k; `limit = 0` yields star edges),
    * keeping output linear in group size instead of quadratic. The lowest
    * ids are found with [[graft.operators.TopKPerGroup]] — Catalyst's
    * WindowGroupLimit keeps a bounded per-group heap BEFORE the shuffle, so
    * memory stays bounded even for a group of 10⁸ identical copies (the
    * mass-duplication case the bucket cap exists to survive). */
  def exactDupVectorPairs(vecs: DataFrame, idCol: String, vecCol: String,
                          limit: Int): DataFrame = {
    val h = vecs.select(col(idCol).as("__id"), xxhash64(col(vecCol)).as("__vh"))
    // the (limit+1) lowest ids per hash group, bounded-memory; singleton
    // groups contribute only the self pair, filtered below
    val lows = graft.operators.TopKPerGroup
      .topK(h, Seq("__vh"), Seq(col("__id")), limit + 1)
      .select(col("__vh"), col("__id").as("right_id"))
    h.join(lows, Seq("__vh"))
      .select(col("__id").as("left_id"), col("right_id"))
      .filter(col("left_id") =!= col("right_id"))
  }

  /** Approximate top-k via LSH candidates (recall grows with planes↓ / tables↑).
    *
    * `tables` is THE recall knob once multi-probe is already at the full
    * Hamming-1 ball (the default): measured at sf0.1 on the structureless
    * corpus (2000 queries, `graft.tools.Recall`), recall@3 is 0.706 /
    * 0.914 / 0.992 at tables = 4 / 8 / 16 with quality gap 1.1e-2 /
    * 2.3e-3 / 1.7e-4 (BENCH_NOTES "Recall vs tables", r15). Cost scales
    * LINEARLY with tables at scale — index rows, candidate pairs and the
    * candidate exchange all multiply — so the default stays 4 (the
    * measured sf100 evidence is at 4) and recall-critical callers buy
    * tables consciously.
    *
    * With `maxBucketSize` set, over-cap buckets degrade to bounded chunk
    * pairs (see [[guardedCandidatePairs]] — every member of a saturated
    * bucket keeps ~chunk-width same-bucket candidates per table) and each
    * member of an identical-embedding group additionally keeps its k
    * guaranteed cosine-1 neighbors via [[exactDupVectorPairs]]. The
    * over-cap probe is EAGER (runs at call time). */
  def lshTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int, dims: Int,
              planes: Int = 0, tables: Int = 4,
              maxBucketSize: Option[Int] = None,
              probes: Int = -1): DataFrame = {
    // context-level shuffle-codec advisory (cannot be set per query):
    // the candidate-pair exchange is this operator's disk-budget driver
    graft.core.Tunables.recommendShuffleCodec(vecs.sparkSession, "knn.lshTopK")
    // planes = 0 (default): size the tables from the data — see [[autoPlanes]];
    // the same count feeds topKByAgg's materialization tier (explicit planes
    // skip the count, so the tier then defaults to conservative-eager)
    val nOpt: Option[Long] =
      if (planes > 0) None
      else Some(math.max(1L, vecs.select(col(idCol)).count()))
    val pl = if (planes > 0) planes else autoPlanesFromN(nOpt.get)
    // probes = -1 (default): probe every single-bit flip (the Hamming-1
    // ball) — multiplies candidate volume by ≈ planes+1 per table but
    // converts the boundary-miss failure mode of sign-bit LSH into a
    // covered case: measured recall@3 0.46 → 0.95 (sf0.01) and 0.21 → 0.71
    // (sf0.1) on the structureless corpus (BENCH_NOTES "Recall evidence").
    // Volume grows only logarithmically with n (probes = planes ≈ log2 n),
    // and the probe keys add NO index rows — bucket statistics, the cap's
    // subject, are untouched.
    val pr = if (probes >= 0) probes else pl
    graft.core.Decisions.record(s"lsh.probes(planes=$pl)", pr)
    // recovery only runs when a bucket actually exceeded the cap. Candidate
    // dedup happens in TWO layers with distinct jobs: the PRIMARY dedup is
    // the one cheap pre-score exchange below (repartition + dropDuplicates
    // on the bare 16-byte pair rows, before any vector payload attaches);
    // [[TopKPairsBuffer]]'s id-dedup-on-insert is the SAFETY NET for any
    // residual duplicates reaching the aggregate. Neither alone: buffer-only
    // quadruples the ~550-byte pairs+vector exchange (the measured sf100
    // disk-exhaustion failure), and exchange-only would make correctness
    // hang on an upstream plan detail the aggregate cannot see.
    val cands = maxBucketSize match {
      case None =>
        lshCandidates(vecs, idCol, vecCol, dims, pl, tables, probes = pr, dedup = false)
      case Some(cap) =>
        val (lsh, capped) = guardedCandidatePairs(vecs, idCol, vecCol, dims, pl, tables,
          cap, pr, dedup = false)
        if (!capped) lsh
        else lsh.union(exactDupVectorPairs(vecs, idCol, vecCol, limit = k))
    }
    // Dedup the raw stream in ONE cheap exchange, placed BEFORE any vector
    // payload attaches: repartitioning the 16-byte pair rows by left_id
    // co-locates every copy of a pair, so dropDuplicates needs no further
    // exchange (hash partitioning on left_id satisfies the clustered
    // distribution on (left_id, right_id)) and the left-norm join below
    // reuses the same partitioning. The alternatives both lose at scale: a
    // plain distinct() on the union adds a second full pair exchange, and
    // no dedup at all (buffer-only) quadruples the ~550-byte/row
    // pairs+vector exchange feeding the right-norm join — the measured
    // sf100 disk-exhaustion failure of the distinct-free first cut.
    val deduped = cands.repartition(col("left_id"))
      .dropDuplicates("left_id", "right_id")
    val v = withNorm(vecs, idCol, vecCol, "__id", "__v", "__n")
    val scored = deduped
      .join(v.toDF("left_id", "__vl", "__nl"), "left_id")
      .join(v.toDF("right_id", "__vr", "__nr"), "right_id")
      .withColumn("cosine", pairCosine(col("__vl"), col("__nl"), col("__vr"), col("__nr")))
      .select(col("left_id").as("query_id"), col("right_id").as("neighbor_id"),
        col("cosine"))
    topKByAgg(scored, k, nOpt)
  }

  /**
   * Lloyd-iteration k-means centroids for IVF cell assignment, entirely with
   * relational ops: seed centroids are a deterministic sample; each round
   * assigns every vector to its nearest centroid (broadcast — the centroid
   * table is k·dims doubles) and recomputes means by element via posexplode →
   * (cell, pos) hash-agg. The per-round shuffle carries dims rows per vector
   * keyed by (cell, position) — uniform, map-side combinable, no skew — so
   * the loop holds at corpus scale; iterations are a small constant (IVF
   * needs balanced cells, not converged ones).
   */
  def kmeansCentroids(vecs: DataFrame, idCol: String, vecCol: String,
                      nCells: Int, iters: Int): DataFrame = {
    val v = vecs.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // cell_id is minted by row_number over the seed sample, NOT by casting the
    // user id — string ids would throw under ANSI (or null out ANSI-off). The
    // unpartitioned window is bounded: it runs over at most nCells rows.
    var centroids = v.orderBy(col("__id")).limit(nCells)
      .select(row_number().over(Window.orderBy(col("__id"))).cast("long").as("cell_id"),
        col("__v").cast("array<double>").as("__cv"))
    for (_ <- 0 until iters) {
      // nearest-centroid assignment as a hash aggregate (min_by over the
      // broadcast-expanded rows) — map-side combinable, no per-id sort
      val assigned = v.crossJoin(broadcast(centroids))
        .withColumn("__d", VectorFunctions.sqDist(col("__v"), col("__cv")))
        .groupBy("__id")
        .agg(min_by(col("cell_id"), struct(col("__d"), col("cell_id"))).as("cell_id"),
          first(col("__v")).as("__v"))
        .select(col("cell_id"), col("__v"))
      centroids = assigned
        .select(col("cell_id"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .groupBy("cell_id", "__pos")
        .agg(avg(col("__x")).as("__mean"))
        .groupBy("cell_id")
        .agg(array_sort(collect_list(struct(col("__pos"), col("__mean")))).as("__pm"))
        .select(col("cell_id"),
          transform(col("__pm"), pm => pm.getField("__mean")).as("__cv"))
    }
    centroids
  }

  /**
   * IVF-style ANN: `nCells` centroids (deterministic sample, optionally
   * Lloyd-refined with `kmeansIters` rounds); every vector is assigned to its
   * nearest centroid (broadcast join — the centroid table is tiny); queries
   * probe the `nProbe` nearest cells.
   *
   * `nCells = 0` (the default) sizes the index from the data: the two cost
   * terms are the n·k full assignment and the ~2n²·nProbe/(k·nProbe) = 2n²/k
   * cell self-join, so total work is minimized at k ≈ √(2n) — the classic
   * IVF nlist sizing. A FIXED cell count is a scale trap: the cell join is
   * O(n²/k), so 10× data at constant k costs 100× (measured: the sf10
   * scale run in BENCH_NOTES.md, 812 s at k=16 for n=200k). The probe is
   * one count() over the input (eager, driver-side, recorded via
   * [[graft.core.Decisions]]); Lloyd training then runs on a deterministic
   * hash-sample of ≤ max(8192, 8k) vectors — centroid quality needs a
   * bounded sample, not the corpus — while the final cell assignment still
   * covers every vector (inherent to IVF). Pass an explicit `nCells` to
   * pin the historical behavior (train on ALL vectors, no sampling).
   *
   * `nProbe` is the recall knob, with cost linear in probed cells.
   * Measured at sf0.1 on the STRUCTURELESS corpus (the worst case — cells
   * carry no semantic locality, so recall can only come from coverage):
   * recall@3 0.252 / 0.366 / 0.518 / 0.699 at nProbe 2 / 4 / 8 / 16,
   * i.e. roughly proportional to the probed-cell fraction (BENCH_NOTES
   * "IVF recall vs nProbe", r15; `SPARK_GRAFT_RECALL_NPROBE` reproduces).
   * On corpora with real cluster structure (the sf1/sf10 replica tables)
   * recall is already 1.0 at the default nProbe = 2 — IVF's win condition
   * is clustered data; on structureless data prefer [[lshTopK]], whose
   * Hamming-1 probing reads the geometry directly.
   */
  def ivfTopK(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
              nCells: Int = 0, nProbe: Int = 2, kmeansIters: Int = 0): DataFrame = {
    // same disk-budget advisory as lshTopK: the probe-join scored stream
    // shuffles pair-shaped rows at n·nProbe·(n/cells) volume
    graft.core.Tunables.recommendShuffleCodec(vecs.sparkSession, "knn.ivfTopK")
    val v = vecs.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    // the auto-sizing count doubles as topKByAgg's materialization-tier
    // input (explicit nCells skips it → conservative-eager tier)
    val (cells, train, nOpt) =
      if (nCells > 0) (nCells, vecs, None: Option[Long])
      else {
        val n = v.count()
        val auto = math.max(16, math.min(65536, math.ceil(math.sqrt(2.0 * n)).toInt))
        graft.core.Decisions.record(s"ivf.autoNCells(n=$n)", auto)
        val cap = math.max(8192L, 8L * auto)
        val sampled =
          if (n <= cap) vecs
          else vecs.where(pmod(xxhash64(col(idCol)), lit(math.max(1L, n / cap))) === 0)
        (auto, sampled, Some(n))
      }
    val centroids = kmeansCentroids(train, idCol, vecCol, cells, kmeansIters)
    val np = math.max(nProbe, 1)
    // Assignment: each vector's top-nProbe cells. Preferred shape is the
    // fused NearestCells expression — centroids collected to the driver
    // (they are broadcast-sized by construction) and shipped as a codegen
    // reference, so assignment emits n·nProbe rows directly instead of
    // ranking an n·k crossJoin under a window sort (measured: the n·k shape
    // was knn3's dominant stage at sf10 — BENCH_NOTES "Scale evidence").
    // Very large k·dims indexes (beyond comfortable task-reference size)
    // keep the join+window shape, whose window is at least partitionable.
    val dims = v.limit(1).select(size(col("__v"))).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val literalPath = cells.toLong * math.max(dims, 1) <= (4L << 20)
    graft.core.Decisions.record(
      s"ivf.assignment(cells=$cells,dims=$dims)",
      if (literalPath) "literal" else "join")
    // one evaluation feeds both consumers: the top-nProbe assignment (a
    // superset of the r==1 membership) is persisted, so the Lloyd loop and
    // the assignment scoring run once, not once per consumer
    val pruned = (if (literalPath) {
      // ascending-id order is load-bearing: NearestCells breaks distance
      // ties by matrix position, replicating (dist asc, cell_id asc).
      // The Lloyd loop's per-id assignment aggregates (min_by/first over an
      // array column) are ObjectHashAggregates with ~2-vector (~1 KB)
      // per-key state; the scoped raise keeps them hash-based for the
      // training sample (≤ max(8192, 8·nCells) ≤ 2¹⁹ keys — which is also
      // the memory bound: ≤ ~512 MB worst case, and the sample cap keeps
      // real partitions far below it).
      val rows = graft.core.GraftSession.withObjectAggFallbackKeys(
        v.sparkSession, 1L << 19) { centroids.orderBy(col("cell_id")).collect() }
      val ids = rows.map(_.getLong(0)).toSeq
      val cents = rows.map(_.getSeq[Double](1)).toSeq
      v.select(col("__id"), col("__v"),
          posexplode(VectorFunctions.nearestCells(col("__v"), ids, cents, np))
            .as(Seq("__p", "cell_id")))
        .select(col("cell_id"), col("__id"), col("__v"),
          (col("__p") + 1).cast("int").as("__r"))
    } else {
      val assign = v.crossJoin(broadcast(centroids))
        .withColumn("__d", VectorFunctions.sqDist(col("__v"), col("__cv")))
      val wAssign = Window.partitionBy(col("__id")).orderBy(col("__d").asc, col("cell_id").asc)
      assign.withColumn("__r", row_number().over(wAssign))
        .filter(col("__r") <= np)
        .select(col("cell_id"), col("__id"), col("__v"), col("__r"))
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val members = pruned.filter(col("__r") === 1)
      .select(col("cell_id"), col("__id").as("neighbor_id"), col("__v").as("__nv"),
        VectorFunctions.l2Norm(col("__v")).as("__nn"))
    val probes = pruned.filter(col("__r") <= nProbe)
      .select(col("cell_id"), col("__id").as("query_id"), col("__v").as("__qv"),
        VectorFunctions.l2Norm(col("__v")).as("__qn"))
    val scored = probes.join(members, Seq("cell_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", pairCosine(col("__qv"), col("__qn"), col("__nv"), col("__nn")))
      .select("query_id", "neighbor_id", "cosine")
    // cache lifecycle: `pruned`'s release defers to the operator-cache
    // listener in BOTH tiers (first caller action → unpersist). The eager
    // tier DID unpersist inline here once — pruned is fully consumed by
    // topKByAgg's forced count — but Spark's non-cascading uncache
    // (SPARK-24596) INVALIDATES the materialized data of every dependent
    // cache entry, i.e. the top-k output the count just built under the
    // scoped ObjectHashAggregate fallback raise. The caller's action then
    // silently re-executed the whole aggregate over the scored stream
    // OUTSIDE the scope, at the default 128-key threshold: every partition
    // degraded to the sort-based fallback and externally sorted its slice
    // of the n·nProbe·(n/cells) stream. Invisible at sf10 (the wasted sort
    // is seconds), a 3-6× blowup at sf100 (measured: knn3 ~700 s vs the
    // ~200 s r7 row; all 32 tasks jstack'd inside SortBasedAggregator).
    // Holding pruned's (n·nProbe, vector-wide) cache until the caller's
    // first action is the cheap side of that trade at every scale.
    val top = topKByAgg(scored, k, nOpt)
    graft.core.OperatorCaches.owned(
      top.select("query_id", "neighbor_id", "rank", "cosine"), Seq(pruned))
  }
}
