package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Session factory with the engine's scale-oriented defaults.
 *
 * The reference (see /root/reference/src/cehrbert_data/utils/spark_utils.py and
 * cohorts/spark_app_base.py) creates bare `SparkSession.builder.getOrCreate()`
 * sessions and leaves every knob at default; at 100 TB that means 200 shuffle
 * partitions, no AQE skew handling, and ambient-timezone semantics. Here we pin:
 *
 *  - AQE on (runtime coalescing + skew-join splitting) so the same plan survives
 *    a 1000-executor cluster with skewed person/user keys;
 *  - UTC session timezone — the reference relies on ambient TZ, which breaks
 *    oracle comparisons and cross-site reproducibility;
 *  - `nanosAsLong` so parquet TIMESTAMP(NANOS) columns (increasingly common from
 *    arrow writers) load instead of erroring; [[Tables]] restores TimestampType.
 */
object GraftSession {

  /** Apply engine defaults to an arbitrary builder (used by Verify/Bench mains).
    * Static confs only — width knobs that depend on the cluster's parallelism
    * (`initialPartitionNum`) are runtime-settable and derived in [[tune]],
    * which [[local]] applies automatically; externally built sessions should
    * call `tune(spark)` once after `getOrCreate()`. */
  def withDefaults(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // parallelismFirst stays at its default (true): measured at sf0.1/32
    // cores, size-first coalescing (false) collapsed the heavy aggregations
    // to single advisory-sized tasks and cost ~20% total bench time
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // NOTE (r15 optimization round): `canChangeCachedPlanOutputPartitioning`
    // is deliberately LEFT AT SPARK'S DEFAULT (false) session-wide. Measured
    // A/B at sf0.1/32: enabling it globally let AQE coalesce the dedup/ANN
    // operators' corpus-scale persisted intermediates to a handful of
    // partitions, serializing the tokenize/shingle-heavy consumers behind
    // them (ngram1 2.79→3.41 s, knn3 3.43→4.79 s, dedup2 2.20→2.83 s,
    // same window). The streaming dedup sinks — where the un-coalesced
    // cache was measured to fan 254 near-empty partitions into 254 output
    // files per micro-batch — enable it on their own cloned stream session
    // instead (see StreamingEvents.enableCachedPlanAqe).

  /** Start AQE shuffles this many times wider than the cluster's default
    * parallelism, floored at 256, and let runtime coalescing shrink them:
    * with `shuffle.partitions` pinned near the core count, a 10×-data step
    * makes every sort-merge partition 10× larger until it spills — at the
    * sf100 probe the j1 sentinel went 14× for 10× data purely from SMJ
    * spill at width 32. Wide-then-coalesce keeps per-partition sorts
    * memory-sized at large sf while AQE collapses the extra partitions at
    * small sf (`parallelismFirst` above keeps the small-sf floor at the
    * core count, so this is spill insurance, not a small-scale regression).
    *
    * DERIVED, not a literal (r8): a fixed 256 equals 8 × this sandbox's 32
    * cores but CAPS the initial width on a 1000-core cluster — the inverse
    * of the knob's intent. Pure function so the derivation is spec-testable
    * without mocking a cluster. */
  def initialShufflePartitions(defaultParallelism: Int): Int =
    math.max(256, 8 * math.max(1, defaultParallelism))

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
            appName: String = "graft"): SparkSession = {
    val s = withDefaults(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
  }

  /** Ensure runtime-settable engine confs on an externally created session,
    * including the parallelism-derived shuffle-width knobs. Does NOT touch
    * `spark.sql.shuffle.partitions`: on a cluster that is a capacity choice
    * the deployment owns (and AQE's wide-then-coalesce below makes the
    * initial width the operative knob anyway). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      initialShufflePartitions(spark.sparkContext.defaultParallelism).toString)
    spark
  }

  /**
   * Run `body` with `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
   * raised to `keys`, restoring the previous value after.
   *
   * WHY scoped (r8, was session-wide in r7): ObjectHashAggregateExec's
   * sort-based fallback triggers at 128 (!) distinct keys per partition —
   * for BOUNDED-buffer aggregates (TopKPairsAggregate's k slots, SimHashAgg's
   * long[64]) that silently re-introduces the full-stream external sort those
   * aggregates exist to avoid (measured at the sf100 probe: the IVF
   * probe-join stream is ~4×10⁹ rows; the fallback sort exhausted 60 GB of
   * spill disk while the k-slot hash buffers would have needed ~15 MB/task).
   * But the threshold is the ONLY memory guard ObjectHashAggregate has, and
   * it counts KEYS, not bytes — raising it session-wide also unguards
   * aggregates with UNBOUNDED per-key state (collect_list/collect_set event
   * sequences hold multi-KB per group), where 2M un-spillable keys per task
   * is an executor OOM, not a speedup. So the raise is scoped: each
   * bounded-buffer call site wraps ONLY its own materialization, passing a
   * `keys` budget sized from its measured per-key bytes, and everything else
   * keeps Spark's conservative default (the fallback sort IS the memory
   * guard for unbounded aggregates).
   *
   * The threshold is read at execution time (physical planning of each
   * action), so the wrap is only effective around an ACTION that
   * materializes the aggregate — the call sites persist the (small, bounded)
   * aggregate output and force it inside the wrap, so later caller actions
   * read the cache and never replan the aggregate.
   *
   * CRITICAL (r13): when the materialization pattern is persist+force, the
   * `persist()` call itself must ALSO be inside the wrap. CacheManager
   * snapshots the session conf at cache REGISTRATION (it compiles the
   * cached plan against a session whose conf is copied then), and the
   * cache-building execution runs under that snapshot — a raise applied
   * only around the force leaves the cached aggregate at the 128-key
   * default, silently re-introducing the exact external sort this scope
   * exists to prevent. Measured: knn3's sf100 median was ~745 s with
   * persist outside the wrap vs the hash-based plan with it inside; the
   * executors jstack inside SortBasedAggregator while the scoped count
   * runs. Pattern: `withObjectAggFallbackKeys(s, keys) { val out =
   * plan.persist(...); OperatorCaches.owned(out, Seq(out), skipMatches=1);
   * out.count(); out }`.
   */
  def withObjectAggFallbackKeys[T](spark: SparkSession, keys: Long)(body: => T): T = {
    val conf = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(conf)
    spark.conf.set(conf, keys.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }
}
