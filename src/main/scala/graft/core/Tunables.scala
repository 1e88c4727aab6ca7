package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Runtime-overridable engine tunables (`spark.graft.*` confs).
 *
 * The adaptive operators pick execution shapes at measured data-size
 * crossovers (quantile cumulate tiers, the top-k / simhash scoped
 * materialization thresholds, ledger compaction width). The shipped
 * defaults are crossovers MEASURED on this sandbox (32 cores / 128 GiB) —
 * a cluster with a different memory-to-core ratio moves every one of them,
 * so hard-coding the literal would repeat the `initialPartitionNum` mistake
 * (a sandbox constant silently capping a 1000-core cluster). Call sites
 * read the boundary through here at call time: the measured value remains
 * the default, a deployment overrides per session
 * (`spark.conf.set("spark.graft….", …)`), and every read lands in
 * [[Decisions]] so a cluster run's driver log records which boundary value
 * actually steered each adaptive choice.
 */
object Tunables {

  /** Read a long tunable: `spark.graft.*` conf if set, else `default`.
    * Records the effective value in [[Decisions]] (`tunable.<key>`). */
  def long(spark: SparkSession, key: String, default: Long): Long = {
    require(key.startsWith("spark.graft."), s"tunable key must be spark.graft.*: $key")
    val v = spark.conf.getOption(key) match {
      case Some(s) =>
        try s.trim.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$key must be a long, got '$s'")
        }
      case None => default
    }
    Decisions.record(s"tunable.$key", v)
    v
  }
}
