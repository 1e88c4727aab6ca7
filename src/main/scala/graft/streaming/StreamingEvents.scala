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

  /**
   * foreachBatch exact-dedup sink — the batch [[graft.dedup.Dedup.exact]]
   * operator composed into the streaming surface, for dedup windows LONGER
   * than a watermark can hold ([[dedupStream]] bounds its state by event
   * time; this sink's memory of seen content is a parquet fingerprint
   * LEDGER, so "ever seen" is the whole stream's history).
   *
   * Per micro-batch: (1) intra-batch duplicates collapse via the batch
   * operator (keeper = first by `keepOrder`); (2) cross-batch duplicates
   * drop via a left-anti join against the ledger — a shuffle join on the
   * uniform 64-bit fingerprint, the same 100 TB-safe shape as batch exact
   * dedup (only (fingerprint) rows shuffle, never document bodies);
   * (3) survivors append to `outPath`, their fingerprints to the ledger.
   *
   * Delivery: foreachBatch is at-least-once on retry — a batch that fails
   * AFTER the output append but BEFORE the ledger append can re-emit its
   * rows on restart (they are not yet in the ledger). The ledger itself
   * converges (appending the same fingerprints twice leaves later batches'
   * anti-join unchanged), so duplicates are bounded by one failed batch;
   * an exactly-once deployment would write output + ledger through a
   * transactional table format instead of raw parquet.
   */
  def exactDedupSink(docs: DataFrame, textCol: String, keepOrder: Seq[String],
                     outPath: String, ledgerPath: String,
                     checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val marked = graft.dedup.Dedup.exact(batch, col(textCol),
            keepOrder.map(col))
          .filter(!col("is_dup"))
        val seen =
          try s.read.parquet(ledgerPath).select(col("fingerprint").as("dup_group"))
          catch { case _: org.apache.spark.sql.AnalysisException =>
            // first batch: no ledger yet
            s.range(0).select(col("id").as("dup_group"))
          }
        val fresh = marked.join(seen, Seq("dup_group"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        fresh.drop("dup_group", "dup_rank", "is_dup")
          .write.mode("append").parquet(outPath)
        fresh.select(col("dup_group").as("fingerprint"))
          .write.mode("append").parquet(ledgerPath)
        fresh.unpersist()
        ()
      }
      .start()

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
