package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interval (range) joins and as-of / nearest-match joins (SURVEY §2.3 J6/J7).
 *
 * The reference attaches events to visits by joining on person and a
 * `BETWEEN visit_start-1d AND visit_end+1d` residual, then keeps the best
 * candidate with a `row_number` window (/root/reference/src/cehrbert_data/
 * utils/spark_utils.py:740-752, tools/ehrshot_to_omop.py:497-511).
 *
 * Scale notes: ALWAYS carry an equi key (person/user) next to the range
 * predicate — Catalyst then plans a shuffled hash/sort-merge join on the equi
 * key with the range as a residual filter, instead of a broadcast-nested-loop
 * over the whole table. The window dedup shuffles on the left row id, which is
 * already the join output partitioning, so AQE usually elides the extra
 * exchange. For the no-equi-key case at 100 TB, bucketize the time dimension
 * (see [[bucketedRangeJoin]]) to restore an equi key.
 */
object TemporalJoins {

  /** Inner range join: left rows paired with right rows whose
    * `[rightStart, rightEnd]` interval contains `leftTs`, with mandatory
    * equi keys to keep the join hash-partitioned. */
  def rangeJoin(left: DataFrame, right: DataFrame, leftKeys: Seq[String],
                rightKeys: Seq[String], leftTs: Column, rightStart: Column,
                rightEnd: Column): DataFrame = {
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _)
    left.join(right, keyCond && leftTs.between(rightStart, rightEnd))
  }

  /**
   * As-of join (backward): for each left row, the single most recent right
   * row with `rightTs <= leftTs` within the same equi-key group.
   *
   * @param leftId     unique id column names on the left (window partition for
   *                   the top-1 dedup)
   * @param tieBreak   extra right-side ordering after recency, for determinism
   */
  def asOfBackward(left: DataFrame, right: DataFrame, leftKeys: Seq[String],
                   rightKeys: Seq[String], leftTs: Column, rightTs: Column,
                   leftId: Seq[String], tieBreak: Seq[Column] = Nil): DataFrame = {
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _)
    val joined = left.join(right, keyCond && (rightTs <= leftTs))
    val w = Window.partitionBy(leftId.map(col): _*)
      .orderBy((rightTs.desc +: tieBreak): _*)
    joined.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1)
      .drop("__rank")
  }

  /**
   * Union+sort formulation of the backward as-of join — the 100 TB shape.
   *
   * [[asOfBackward]] materializes left×(right at-or-before) per key before
   * the top-1 window: a key with r right rows multiplies the join output r×.
   * Here both sides union into one stream sorted by (key, ts), and a
   * last-non-null running window carries the most recent right payload to
   * each left row — ONE shuffle on the equi key, output linear in |L|+|R|
   * regardless of per-key density.
   *
   * Semantics match `asOfBackward(..., tieBreak = tieBreakAsc.reverse desc)`:
   * among right rows sharing the winning timestamp, the LAST under
   * `tieBreakAsc` ascending order wins. Left rows with no prior right row
   * are dropped (inner as-of). Rows with a null timestamp on either side are
   * dropped before the union — in [[asOfBackward]] they fall out because the
   * `rightTs <= leftTs` join condition evaluates null; here asc ordering
   * would otherwise sort them FIRST in every partition and invent matches.
   *
   * @param valueCols   right columns to surface on the output
   * @param tieBreakAsc right columns breaking timestamp ties (last wins)
   */
  def asOfBackwardSorted(left: DataFrame, right: DataFrame, leftKeys: Seq[String],
                         rightKeys: Seq[String], leftTs: Column, rightTs: Column,
                         valueCols: Seq[String],
                         tieBreakAsc: Seq[String] = Nil): DataFrame = {
    val payloadCols = (tieBreakAsc ++ valueCols).distinct
    // Null equi-keys likewise never match under `===` but WOULD group
    // together under partitionBy — drop them on both sides too.
    val rKeysOk = rightKeys.map(right(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true))
    val lKeysOk = leftKeys.map(left(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true))
    val r2 = right.filter(rightTs.isNotNull && rKeysOk).select(
      rightKeys.zip(leftKeys).map { case (r, l) => right(r).as(l) } ++
        Seq(rightTs.as("__ts"), lit(0).as("__side"),
          struct(payloadCols.map(right(_)): _*).as("__rv")): _*)
    val l2 = left
      .filter(leftTs.isNotNull && lKeysOk)
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(r2.schema("__rv").dataType))
    val unioned = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(leftKeys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(left.columns.map(col) ++
        valueCols.map(c => col(s"__match.$c").as(c)): _*)
  }

  /**
   * Nearest-match join: like as-of but keeps the candidate minimizing
   * `abs(rightTs - leftTs)` regardless of direction
   * (reference ehrshot_to_omop.py:502-511 `matching_rank`).
   */
  def nearest(left: DataFrame, right: DataFrame, leftKeys: Seq[String],
              rightKeys: Seq[String], leftTs: Column, rightTs: Column,
              leftId: Seq[String], toleranceSec: Option[Long] = None,
              tieBreak: Seq[Column] = Nil): DataFrame = {
    val keyCond = leftKeys.zip(rightKeys)
      .map { case (l, r) => left(l) === right(r) }
      .reduce(_ && _)
    val dist = abs(unix_timestamp(rightTs) - unix_timestamp(leftTs))
    val cond = toleranceSec.map(t => keyCond && dist <= t).getOrElse(keyCond)
    val joined = left.join(right, cond)
    val w = Window.partitionBy(leftId.map(col): _*)
      .orderBy((dist.asc +: tieBreak): _*)
    joined.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1)
      .drop("__rank")
  }

  /**
   * Range join without a natural equi key: bucket both sides by time so the
   * join becomes equi on (bucket) with the range residual. Right intervals
   * are exploded into every bucket they overlap; results are distinct on the
   * pair id columns. This is the 100 TB fallback when intervals are short
   * relative to `bucketSeconds` — pick the bucket ≈ p99 interval length.
   */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame, leftTs: Column,
                        rightStart: Column, rightEnd: Column,
                        bucketSeconds: Long): DataFrame = {
    val lb = left.withColumn("__bucket", floor(unix_timestamp(leftTs) / bucketSeconds))
    val rb = right.withColumn("__bucket",
      explode(sequence(floor(unix_timestamp(rightStart) / bucketSeconds),
        floor(unix_timestamp(rightEnd) / bucketSeconds))))
    lb.join(rb, Seq("__bucket"))
      .filter(leftTs.between(rightStart, rightEnd))
      .drop("__bucket")
  }
}
