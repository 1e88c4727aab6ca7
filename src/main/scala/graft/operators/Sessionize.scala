package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-and-island sessionization (SURVEY §2.5 W13).
 *
 * The reference computes visit "partitions" by flagging rows whose gap from
 * the previous row exceeds a threshold and running-summing the flags over an
 * ordered per-person window (/root/reference/src/cehrbert_data/tools/
 * connect_omop_visit.py:19-52; same pattern ehrshot_to_omop.py:634-673).
 *
 * Scale: one shuffle on the partition keys; the running sum is a streaming
 * window frame (`rowsBetween(unboundedPreceding, currentRow)`), so Spark
 * evaluates it in a single sorted pass per key group — no buffering of the
 * whole partition. Skewed keys are handled by AQE; the operator adds no
 * driver round-trips.
 */
object Sessionize {

  /**
   * Assign a session id per `partitionCols` group: a new session starts when
   * the gap between consecutive `ts` values exceeds `gapSeconds`.
   *
   * @param orderCols  total order within a partition (include a unique
   *                   tiebreaker for determinism, e.g. an event id)
   * @return input plus `sessionCol` (1-based island index within the group)
   */
  def byGap(df: DataFrame, partitionCols: Seq[String], ts: Column,
            orderCols: Seq[Column], gapSeconds: Long,
            sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val prevTs = lag(ts, 1).over(w)
    val newSession =
      when(prevTs.isNull, 1)
        .when(unix_timestamp(ts) - unix_timestamp(prevTs) > gapSeconds, 1)
        .otherwise(0)
    df.withColumn(sessionCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: bounds, size, and duration in seconds. */
  def summarize(sessionized: DataFrame, partitionCols: Seq[String], ts: Column,
                sessionCol: String = "session_id"): DataFrame =
    sessionized
      .groupBy((partitionCols :+ sessionCol).map(col): _*)
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(ts)) - unix_timestamp(min(ts))).as("duration_sec"))
}
