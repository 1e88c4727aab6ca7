package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines (beyond reference —
 * the reference's only sampling is a seeded `randomSplit`, SURVEY §2.1
 * S10). At 100 TB the properties that matter are REPEATABILITY and
 * PUSHDOWN, and `rand()`-based sampling has neither: the sample changes
 * with partitioning/retries, and no other engine can reproduce it. These
 * operators decide membership from the ROW KEY through a fixed integer
 * mixer, so:
 *
 *  - the same row is in the same sample on every run, every engine, every
 *    partitioning (a DuckDB oracle can replay the exact arithmetic);
 *  - membership is a pure Column predicate — codegen'd, no shuffle, no
 *    driver coordination, pushable below wide plans;
 *  - rates compose: a stratum's sample at 2% is a SUBSET of the same
 *    stratum's sample at 5% (membership is `h < rate·M` for a fixed
 *    per-key h), so growing a training set never resamples history —
 *    the property seeded `rand()` cannot give.
 *
 * The mixer is a 31-bit LCG step (`(key mod 2³¹)·1103515245 + 12345
 * mod 2³¹`, the POSIX rand constants): the pre-fold keeps the multiply
 * inside a 64-bit long for ANY long key, so ANSI-mode overflow checking
 * (Spark 4 default) never trips, and the identical expression is exact
 * integer arithmetic in any SQL engine. An LCG step is NOT crypto-grade
 * mixing, but sampling
 * needs only low correlation between key order and h — for sequential
 * ids the low bits cycle while `h < rate·2³¹` reads the HIGH end, which
 * the multiplier disperses.
 */
object Sampling {

  private val M: Long = 1L << 31

  /** The per-row sampling hash:
    * `((key mod 2³¹) · 1103515245 + 12345) mod 2³¹`, non-negative. The
    * key folds to 31 bits FIRST so the multiply stays below 2⁶² for any
    * long key — no ANSI overflow at any scale (keys 2³¹ apart collide,
    * which costs sampling nothing). */
  def samplingHash(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(M)) * lit(1103515245L) + lit(12345L), lit(M))

  /** Uniform deterministic sample: keep rows with `h(key) < rate · 2³¹`. */
  def uniform(df: DataFrame, key: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.filter(samplingHash(key) < lit((rate * M).toLong))
  }

  /** Deterministic per-group cap — "at most k rows per group", the source-
    * balancing primitive of LLM data mixes (cap each domain/language/shard
    * so no source dominates). WHICH k rows survive is decided by the
    * sampling hash (ties by key), so the cap is a uniform deterministic
    * sample of the group, repeatable across runs and engines — `limit`
    * inside a group would be partitioning luck. Catalyst plans the
    * rank-filter as WindowGroupLimit: each map task pre-prunes to its
    * local top-k per group BEFORE the exchange, so at 100 TB the shuffle
    * carries O(groups · k) per task, not the raw corpus (same plan
    * property the W12 audit enforces). */
  def capPerGroup(df: DataFrame, group: Column, key: Column, k: Int): DataFrame = {
    require(k > 0, s"cap must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(samplingHash(key), key)
    df.withColumn("__cap_rn", row_number().over(w))
      .filter(col("__cap_rn") <= k)
      .drop("__cap_rn")
  }

  /**
   * Temperature-based group rebalancing — the multilingual-LLM mixing rule
   * (sample group g at a rate making expected kept counts ∝ n_g^alpha, so
   * dominant languages/domains shrink and small ones keep everything):
   * `rate_g = (n_min / n_g)^(1−alpha)`, the smallest group at rate 1.
   * `alpha = 1` keeps the natural distribution, `alpha = 0` fully
   * balances. Membership reuses [[samplingHash]], so the kept set is
   * repeatable across runs/engines and NESTS as alpha falls (lower alpha
   * keeps a subset of each group's higher-alpha sample).
   *
   * Plan shape at 100 TB: one tiny partial-aggregated count per group, a
   * BROADCAST of the |groups|-row rate table back onto the corpus, and a
   * codegen'd filter — the corpus itself never shuffles.
   *
   * Cross-engine exactness: thresholds pass through `floor(rate · 2³¹)`.
   * For `alpha = 0.5` the rate is computed with `sqrt` — correctly
   * rounded in IEEE 754, so an oracle replays thresholds bit-exactly.
   * Other alphas use `pow`, which libm implementations round differently
   * in the last ulp; boundary rows can then differ across engines (the
   * operator is still self-deterministic).
   */
  def temperatureMix(df: DataFrame, group: Column, key: Column, alpha: Double): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0,1]: $alpha")
    val counts = df.groupBy(group.as("__grp")).agg(count(lit(1)).as("__n"))
    val minN = counts.agg(min(col("__n")).as("__n_min"))
    val ratio = col("__n_min").cast("double") / col("__n")
    val rate = if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val thresholds = counts.crossJoin(broadcast(minN))
      .select(col("__grp"), floor(rate * M).cast("long").as("__thr"))
    df.join(broadcast(thresholds), group === col("__grp"))
      .filter(samplingHash(key) < col("__thr"))
      .drop("__grp", "__thr")
  }

  /**
   * Leakage-free train/test split: membership is decided by the hash of
   * the row's NEAR-DUP CLUSTER id, not its own key, so near-duplicate
   * documents can never straddle the split — the leakage a naive random
   * split injects (a test doc whose near-copy sat in training scores as
   * memorization, not generalization). `clusters` is a
   * `(nodeCol, componentCol)` labeling as produced by
   * [[graft.dedup.Dedup.connectedComponents]]; rows absent from it are
   * singletons and split by their own key (component labels are minimum
   * member keys, so the two key spaces agree).
   *
   * Plan shape at 100 TB: one equi-join of the corpus against the
   * cluster labeling on the row key — co-partitionable, AQE broadcasts
   * it when the dup set is small — then the pure LCG filter. Same
   * nesting property as [[uniform]]: growing `trainRate` only moves
   * whole clusters from test to train.
   */
  def splitByCluster(df: DataFrame, key: Column, clusters: DataFrame,
                     nodeCol: String, componentCol: String,
                     trainRate: Double): DataFrame = {
    require(trainRate >= 0 && trainRate <= 1, s"trainRate must be in [0,1]: $trainRate")
    val labels = clusters.select(col(nodeCol).as("__node"),
      col(componentCol).as("__component"))
    df.join(labels, key === col("__node"), "left")
      .withColumn("split_key", coalesce(col("__component"), key))
      .withColumn("split",
        when(samplingHash(col("split_key")) < lit((trainRate * M).toLong), "train")
          .otherwise("test"))
      .drop("__node", "__component")
  }

  /** Stratified deterministic sample: per-stratum rates over the same
    * key hash — strata not named in `rates` are dropped entirely (a
    * training-mix spec lists what it wants). The threshold lookup is a
    * literal CASE chain, so the whole predicate stays inside whole-stage
    * codegen and pushes down to the scan. */
  def stratified(df: DataFrame, stratum: Column, key: Column,
                 rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "stratified sampling needs at least one stratum rate")
    rates.values.foreach(r =>
      require(r >= 0 && r <= 1, s"rates must be in [0,1]: $rates"))
    // deterministic CASE order (sorted) so plans and oracles match textually
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(lit(-1L)) { case (acc, (s, r)) =>
        when(stratum === lit(s), lit((r * M).toLong)).otherwise(acc)
      }
    df.filter(samplingHash(key) < threshold)
  }
}
