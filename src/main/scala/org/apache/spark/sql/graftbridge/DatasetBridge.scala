package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/**
 * Re-bind a DataFrame's logical plan to ANOTHER session sharing the same
 * SparkContext — `Dataset.ofRows` is `private[sql]`, so this one-file
 * subpackage re-exposes it (same mechanism as [[ColumnBridge]]; no Spark
 * internals modified).
 *
 * WHY: the bucketed-ledger writes must PLAN under their AQE-off clone
 * session (see [[graft.streaming.BucketedLedger.writeSession]]). The
 * public way to move a frame across sessions is
 * `clone.createDataFrame(df.rdd, df.schema)` — but `.rdd` inserts a
 * full serialize-to-external-Row / re-encode round trip AND severs the
 * plan from the shared CacheManager (the upstream cached micro-batch is
 * re-read through a deserializer instead of scanned columnar). Re-binding
 * the ANALYZED plan keeps execution columnar end to end; the clone's own
 * QueryExecution re-plans it under the clone's conf, which is the whole
 * point of the hand-off.
 */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `df`'s analyzed plan re-bound to `target` (same SparkContext). */
  def rebind(df: DataFrame, target: SparkSession): DataFrame =
    ofRows(target, df.queryExecution.analyzed)
}
