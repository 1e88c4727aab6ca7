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

  /**
   * foreachBatch NEAR-duplicate sink — [[graft.dedup.MinHash.nearDuplicates]]
   * composed into the streaming surface the way [[exactDedupSink]] composes
   * `Dedup.exact`: intra-batch near-dups collapse with the full batch
   * operator (exact-Jaccard verification, cluster keeper = min id via
   * [[graft.dedup.Dedup.connectedComponents]] — the same semantics as the
   * batch dedup4 clusters), and cross-batch near-dups drop against a parquet
   * SIGNATURE LEDGER of every previously kept document.
   *
   * Cross-batch state is the MinHash signature (k longs per kept doc), not
   * the shingle sets — so ledger rows are constant-size and the cross-batch
   * check is LSH-shaped end to end: batch docs and ledger docs band-join on
   * [[graft.dedup.MinHash.bandKeys]] (recomputed from the stored signature —
   * no band state persisted), and candidate pairs are scored by signature
   * slot agreement, the standard unbiased MinHash estimate of Jaccard
   * (P[slot agrees] = J, so `threshold` applies directly, ±1/√k). The
   * deliberate asymmetry — exact Jaccard within a batch, estimated Jaccard
   * across batches — is the state-size trade: exactness needs shingle sets,
   * whose per-doc size is unbounded.
   *
   * The ledger is self-limiting: only documents that SURVIVED the check are
   * appended, so near-duplicate families never accumulate — a ledger band
   * bucket only holds mutually-dissimilar docs that happen to collide, which
   * is what keeps the band join skew-safe without a cap as the stream ages.
   *
   * Sub-`n`-token (incl. empty) documents always pass: their pairwise
   * Jaccard is 0 by convention (see [[graft.dedup.MinHash.nearDuplicates]]),
   * their sentinel signatures never enter the ledger, and their identity
   * dedup belongs to [[exactDedupSink]].
   *
   * Delivery matches [[exactDedupSink]]: at-least-once on retry, duplicates
   * bounded by one failed batch, ledger append idempotent for later batches.
   */
  def nearDupSink(docs: DataFrame, idCol: String, textCol: String,
                  threshold: Double, outPath: String, ledgerPath: String,
                  checkpointPath: String, n: Int = 3, bands: Int = 8,
                  rowsPerBand: Int = 4, seed: Long = 42L,
                  maxBucketSize: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val k = bands * rowsPerBand
        val b = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

        // (1) intra-batch: full batch operator (exact-Jaccard verified),
        // cluster keeper = component min id
        val pairs = graft.dedup.MinHash.nearDuplicates(b, idCol, col(textCol),
          threshold, n, bands, rowsPerBand, seed, maxBucketSize, exactStar = true)
        val comps = graft.dedup.Dedup.connectedComponents(pairs, "left_id", "right_id")
        val intra = b.join(
          comps.filter(col("node") =!= col("component"))
            .select(col("node").as(idCol)),
          Seq(idCol), "left_anti")

        // (2) cross-batch: band-join batch signatures against the ledger,
        // drop docs whose slot-agreement estimate reaches the threshold
        val sigs = intra.withColumn("__sig",
            graft.dedup.MinHash.signature(col(textCol), n, k, seed))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ledger =
          try s.read.parquet(ledgerPath).select(col("__lsig"))
          catch { case _: org.apache.spark.sql.AnalysisException =>
            s.range(0).select(array().cast("array<bigint>").as("__lsig"))
          }
        // try_element_at: the first-batch ledger placeholder is a ZERO-length
        // array (schema-only), where ANSI element_at throws; null =!= -1
        // filters it out, which is exactly right
        def banded(df: DataFrame, sigCol: String) =
          df.filter(try_element_at(col(sigCol), lit(1)) =!= -1L)
            .select(df.columns.map(col) :+
              explode(graft.dedup.MinHash.bandKeys(col(sigCol), bands, rowsPerBand)).as("__b"): _*)
            .select(df.columns.map(col) :+ col("__b.band_idx").as("band_idx")
              :+ col("__b.band_hash").as("band_hash"): _*)
        val est = aggregate(
          zip_with(col("__sig"), col("__lsig"),
            (a, c) => when(a === c, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / lit(k)
        val dropIds = banded(sigs.select(col(idCol), col("__sig")), "__sig")
          .join(banded(ledger, "__lsig"), Seq("band_idx", "band_hash"))
          .filter(est >= threshold)
          .select(idCol).distinct()
        val kept = sigs.join(dropIds, Seq(idCol), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

        // (3) survivors to the output, their signatures to the ledger
        kept.drop("__sig").write.mode("append").parquet(outPath)
        kept.filter(element_at(col("__sig"), 1) =!= -1L)
          .select(col("__sig").as("__lsig"))
          .write.mode("append").parquet(ledgerPath)
        kept.unpersist(); sigs.unpersist(); b.unpersist()
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
