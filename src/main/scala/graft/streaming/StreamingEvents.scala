package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming surface for the event pipeline — beyond reference
 * parity (the reference is batch-only; SURVEY §2.10): the same normalization,
 * windowed rollups and sessionization semantics, expressed over readStream so
 * a deployment can run the identical logic continuously.
 *
 *  - [[windowedCounts]]: watermarked sliding-window counts (streaming A4);
 *  - [[sessionize]]: stateful gap-based sessions via flatMapGroupsWithState —
 *    the streaming twin of the batch gap-and-island W13 operator, with
 *    event-time timeout so state is bounded;
 *  - all transforms are shuffle-keyed by user_id, the natural high-cardinality
 *    key, so the stateful operators scale horizontally.
 */
object StreamingEvents {

  /** File-source stream with an explicit schema (streams cannot infer). */
  def readEventStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked per-user/type hourly windowed counts (streaming analogue of
    * the hourly rollup A4). */
  def windowedCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), col("event_type"),
        window(col("ts"), "1 hour").as("hour_window"))
      .agg(count(lit(1)).as("n_events"), avg("value").as("avg_value"))

  /**
   * Streaming exact dedup (the streaming twin of `Dedup.exact`): drop rows
   * whose content fingerprint was already seen within the watermark. State is
   * one (fingerprint) key per distinct document bounded by the watermark —
   * `dropDuplicatesWithinWatermark` expires state as event time advances, so
   * an unbounded stream cannot accumulate unbounded dedup state.
   */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Int)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Int)

  /**
   * Stateful sessionization: emit a session row when a user's gap exceeds
   * `gapSeconds` (or state times out past the watermark). Same session
   * boundaries as the batch [[graft.operators.Sessionize]].
   */
  def sessionize(events: Dataset[SessionEvent], gapSeconds: Long,
                 watermark: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      if (state.hasTimedOut) {
        state.getOption.foreach { s =>
          out ::= SessionOut(userId, new Timestamp(s.sessionStart),
            new Timestamp(s.lastTs), s.nEvents)
        }
        state.remove()
        return out.iterator
      }
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastTs <= gapSeconds * 1000 =>
            cur = Some(s.copy(lastTs = math.max(s.lastTs, t), nEvents = s.nEvents + 1))
          case Some(s) =>
            out ::= SessionOut(userId, new Timestamp(s.sessionStart),
              new Timestamp(s.lastTs), s.nEvents)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000)
      }
      out.reverse.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
