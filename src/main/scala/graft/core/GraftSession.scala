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

  /** Apply engine defaults to an arbitrary builder (used by Verify/Bench mains). */
  def withDefaults(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", classOf[GraftExtensions].getName)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // parallelismFirst stays at its default (true): measured at sf0.1/32
    // cores, size-first coalescing (false) collapsed the heavy aggregations
    // to single advisory-sized tasks and cost ~20% total bench time
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
    // Start AQE shuffles WIDE (8× the local core count) and let runtime
    // coalescing shrink them: with shuffle.partitions pinned at the core
    // count, a 10×-data step makes every sort-merge partition 10× larger
    // until it spills — at the sf100 probe the j1 sentinel went 14× for
    // 10× data purely from SMJ spill at width 32. Wide-then-coalesce keeps
    // per-partition sorts memory-sized at large sf while AQE collapses the
    // extra partitions at small sf (parallelismFirst above keeps the
    // small-sf floor at the core count, so this is spill insurance, not a
    // small-scale regression).
    .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    // TypedImperativeAggregates (TopKPairsAggregate, SimHashAgg) plan as
    // ObjectHashAggregate, whose sort-based fallback triggers at 128 (!)
    // distinct keys per partition — silently re-introducing the full-stream
    // external sort those aggregates exist to avoid (measured: the IVF
    // probe-join stream at the sf100 probe is ~4×10⁹ rows; the fallback
    // sort exhausted 60 GB of spill disk while the k-slot hash buffers
    // would have needed ~15 MB/task). 2M keys × ~120 B (top-k buffer) ≈
    // 240 MB/task bounds the worst case at bench core counts; partitions
    // with even more distinct groups still degrade to sort, by design.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 21).toString)

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
    s
  }

  /** Ensure runtime-settable engine confs on an externally created session. */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 21).toString)
    spark
  }
}
