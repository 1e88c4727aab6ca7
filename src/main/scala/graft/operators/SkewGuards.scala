package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Giant-group (skew) guards shared by the near-duplicate and LSH paths.
 *
 * Every guarded operator has the same shape: a blocking key (LSH band bucket,
 * SimHash chunk, shingle, hyperplane bucket) whose self-join emits d² rows
 * for a group of d — so one boilerplate key shared by 10⁵ rows is a skew
 * bomb. The guard's premise is that the OVER-cap key set is tiny (it is
 * degenerate boilerplate): find it with a map-side-combinable hash agg —
 * only (key, partial-count) rows shuffle — and BROADCAST-anti-join it away,
 * streaming the big table through. Never semi-join against the huge
 * under-cap majority, and never tag rows with `count().over(Window)` (a full
 * sort-shuffle of the table).
 */
object SkewGuards {

  /** The distinct `keys` tuples whose row count exceeds `cap` — tiny by the
    * cap's premise, safe to broadcast. */
  def overCapKeys(df: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(keys.map(col): _*)

  /** `df` minus every row of an over-cap group, via a broadcast anti-join on
    * [[overCapKeys]]. Column order of `df` is preserved (using-column joins
    * move the keys first, which silently breaks positional consumers). */
  def dropOverCapRows(df: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    df.join(broadcast(overCapKeys(df, keys, cap)), keys, "left_anti")
      .select(df.columns.map(col).toSeq: _*)

  /**
   * Adaptive variant of [[dropOverCapRows]]: EAGERLY materializes the
   * over-cap key set (one map-side-combinable pass over `df` — pass a
   * persisted `df` so the probe shares the scan with the downstream plan)
   * and, when NO group exceeds the cap, returns `df` untouched with
   * `capActive = false` so callers can skip their recovery complements —
   * the guarded plan IS the plain plan then.
   *
   * Contract: the plan choice is frozen against the input as of the call.
   * Build the DataFrame when you run it, not against a source that will
   * grow in between — a later re-evaluation against mutated input would
   * run the unguarded plan. When groups WERE dropped, the key set stays
   * cached until the first action over the returned plan succeeds
   * ([[graft.core.OperatorCaches]]); in the common empty case the probe
   * cache is released immediately.
   */
  def adaptiveDropOverCapRows(df: DataFrame, keys: Seq[String],
                              cap: Int): (DataFrame, Boolean) = {
    val big = overCapKeys(df, keys, cap)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capActive = !big.isEmpty
    graft.core.Decisions.record(
      s"skewGuard(${keys.mkString("+")},cap=$cap).capActive", capActive)
    if (!capActive) { big.unpersist(); (df, false) }
    else (graft.core.OperatorCaches.owned(
      df.join(broadcast(big), keys, "left_anti")
        .select(df.columns.map(col).toSeq: _*), Seq(big)), true)
  }
}
