package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.streaming.StreamingEvents.SessionEvent

/** Streaming specs: windowed counts and stateful sessionization over a
  * MemoryStream, checked against the batch Sessionize operator's semantics. */
class StreamingEventsSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Drop a ledger table AND its warehouse directory (a previous test JVM's
    * managed files outlive the in-memory catalog). */
  private def dropLedger(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${name}__compacting")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq(name, name + "__compacting").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(wh, t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("windowedCounts aggregates per hour window with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String, Double)]
    val events = input.toDF().toDF("user_id", "ts", "event_type", "value")

    val q = StreamingEvents.windowedCounts(events)
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    input.addData(
      (1L, ts("2024-01-01 10:05:00"), "click", 1.0),
      (1L, ts("2024-01-01 10:45:00"), "click", 3.0),
      (1L, ts("2024-01-01 11:05:00"), "click", 5.0))
    q.processAllAvailable()
    val rows = spark.table("wc").collect()
    q.stop()

    val h10 = rows.find(r => r.getAs[Long]("n_events") == 2)
    assert(h10.isDefined && h10.get.getAs[Double]("avg_value") == 2.0)
  }

  test("stateful sessionize emits closed sessions at gap boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = StreamingEvents.sessionize(input.toDS(), gapSeconds = 3600)

    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    // two bursts 2h apart: first session closes when the second begins
    input.addData(
      SessionEvent(1L, ts("2024-01-01 10:00:00"), 1),
      SessionEvent(1L, ts("2024-01-01 10:30:00"), 2),
      SessionEvent(1L, ts("2024-01-01 12:30:00"), 3))
    q.processAllAvailable()
    // advance watermark so the open session can time out on a later batch
    input.addData(SessionEvent(2L, ts("2024-01-01 18:00:00"), 4))
    q.processAllAvailable()
    input.addData(SessionEvent(2L, ts("2024-01-01 23:30:00"), 5))
    q.processAllAvailable()
    val rows = spark.table("sess").orderBy("session_start").collect()
    q.stop()

    assert(rows.length >= 1)
    val first = rows(0)
    assert(first.getAs[Long]("user_id") == 1L)
    assert(first.getAs[Timestamp]("session_start") == ts("2024-01-01 10:00:00"))
    assert(first.getAs[Timestamp]("session_end") == ts("2024-01-01 10:30:00"))
    assert(first.getAs[Int]("n_events") == 2)
  }

  test("exactDedupSink: batch Dedup.exact composed via foreachBatch, ledger spans batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-dedup-sink").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    dropLedger("sed_ledger")
    val q = StreamingEvents.exactDedupSink(docs, "text", keepOrder = Seq("doc_id"),
      outPath = s"$dir/out", ledgerTable = "sed_ledger",
      checkpointPath = s"$dir/ckpt")
    // batch 1: intra-batch duplicate (docs 1/2) + a unique doc
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "alpha beta gamma"),
      (2L, ts("2024-01-01 10:01:00"), "alpha beta gamma"),
      (3L, ts("2024-01-01 10:02:00"), "delta epsilon"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate of batch 1 content (doc 4 — hours past
    // any watermark reach) + a new doc; ledger must still drop doc 4
    input.addData(
      (4L, ts("2024-01-02 09:00:00"), "alpha beta gamma"),
      (5L, ts("2024-01-02 09:01:00"), "zeta eta"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L),
      s"keeper set wrong: $kept — intra-batch keeper is min doc_id; cross-batch dups must drop")
    // ledger holds exactly the three distinct fingerprints
    assert(spark.table("sed_ledger").distinct().count() == 3)
  }

  test("nearDupSink: MinHash near-dup composed via foreachBatch, signature ledger spans batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-neardup-sink").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    // long shared template so doc pairs sit solidly above/below J = 0.5
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "distant river winds slowly through the quiet green valley at dawn"
    val nearDup = base.replace("quiet", "silent") // J ≈ 0.9
    val unrelated = "completely different subject matter entirely about " +
      "compilers optimizing sparse matrix multiplication kernels on gpus"

    dropLedger("snd_ledger")
    val q = StreamingEvents.nearDupSink(docs, "doc_id", "text",
      threshold = 0.5, outPath = s"$dir/out", ledgerTable = "snd_ledger",
      checkpointPath = s"$dir/ckpt")
    // batch 1: near-dup pair (1, 2) — keeper is component min id — plus an
    // unrelated doc
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), base),
      (2L, ts("2024-01-01 10:01:00"), nearDup),
      (3L, ts("2024-01-01 10:02:00"), unrelated))
    q.processAllAvailable()
    // batch 2: near-dup of batch-1 content (must drop via the signature
    // ledger — hours past any watermark) + a genuinely new doc
    input.addData(
      (4L, ts("2024-01-02 09:00:00"), nearDup),
      (5L, ts("2024-01-02 09:01:00"), "fresh content about ocean tides " +
        "and the gravitational influence of the moon on coastal waters"))
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L),
      s"keeper set wrong: $kept — intra-batch keeper is component min id; " +
        "cross-batch near-dups must drop against the signature ledger")
    // ledger holds `bands` banded rows per kept doc — 3 distinct signatures
    val ledger = spark.table("snd_ledger")
    assert(ledger.select("sig").distinct().count() == 3)
    assert(ledger.count() == 3 * 8, "one ledger row per (doc, band)")
  }

  test("sink batch plans never shuffle the ledger side (only the micro-batch moves)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

    def ledgerShuffled(df: org.apache.spark.sql.DataFrame, table: String): Unit = {
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: FileSourceScanExec if s.tableIdentifier.exists(_.table == table) => s
      }
      assert(scans.nonEmpty, s"expected a scan of $table in:\n$plan")
      assert(scans.forall(_.bucketedScan), s"ledger scan of $table lost bucketing:\n$plan")
      // flag a shuffle of RAW ledger rows: an exchange whose subtree holds
      // the ledger scan with no join in between (post-join shuffles carry
      // batch-derived rows — the tiny dropIds distinct — not the history)
      val shuffledLedger = plan.collect { case e: ShuffleExchangeExec => e }
        .filter { e =>
          e.collect {
            case s: FileSourceScanExec if s.tableIdentifier.exists(_.table == table) => s
          }.nonEmpty &&
            e.collect { case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j }.isEmpty
        }
      assert(shuffledLedger.isEmpty,
        s"a shuffle re-partitions the raw $table rows — the stream history " +
          s"shuffles every micro-batch:\n$plan")
    }

    // AQE + broadcast off: force the worst-case (large-ledger) join shape
    // the bucketing exists for, and keep executedPlan a plain walkable tree
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      dropLedger("plan_exact_ledger")
      val el = StreamingEvents.exactDedupLedger("plan_exact_ledger", buckets = 4)
      el.append(Seq(11L, 22L).toDF("fingerprint"))
      // >= n tokens so the signatures are real (sentinel sigs constant-fold
      // the ledger join away over a local batch relation)
      val batch = Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "zeta eta theta iota kappa")).toDF("doc_id", "text")
      ledgerShuffled(
        StreamingEvents.exactDedupBatch(batch, "text", Seq("doc_id"), el),
        "plan_exact_ledger")

      dropLedger("plan_near_ledger")
      val nl = StreamingEvents.nearDupLedger("plan_near_ledger", buckets = 4)
      val seedDocs = Seq((9L, "the quick brown fox jumps over the lazy dog at dawn"))
        .toDF("doc_id", "text")
      val seedSigs = seedDocs.withColumn("__sig",
        graft.dedup.MinHash.signature(col("text"), 3, 32, 42L))
      nl.append(StreamingEvents.bandedSignatures(seedSigs, bands = 8, rowsPerBand = 4))
      ledgerShuffled(
        StreamingEvents.nearDupBatch(batch, "doc_id", "text", 0.5, 3, 8, 4, 42L,
          None, nl),
        "plan_near_ledger")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("exactDedupSink ledger self-compacts across many batches, semantics unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-dedup-compact").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    dropLedger("sed_compact_ledger")
    // tight thresholds so the small stream actually crosses them
    val q = StreamingEvents.exactDedupSink(docs, "text", keepOrder = Seq("doc_id"),
      outPath = s"$dir/out", ledgerTable = "sed_compact_ledger",
      checkpointPath = s"$dir/ckpt", ledgerBuckets = 2, compactAfterFiles = 4)
    // 6 batches: each adds one new doc and repeats one older doc
    (0 until 6).foreach { i =>
      input.addData(
        (i * 10L, ts(f"2024-01-01 ${10 + i}%02d:00:00"), s"unique content number $i"),
        (i * 10L + 1L, ts(f"2024-01-01 ${10 + i}%02d:01:00"), "repeated content"))
      q.processAllAvailable()
    }
    q.stop()

    val ledger = StreamingEvents.exactDedupLedger("sed_compact_ledger", 2, 4)
    assert(ledger.fileCount(spark) <= 6,
      s"ledger fragmented to ${ledger.fileCount(spark)} files — compaction never ran " +
        "(6 batches x 2 buckets = up to 12 without it)")
    assert(graft.core.Decisions.snapshot.exists { case (k, v) =>
      k.startsWith("ledger.compact(sed_compact_ledger") && v == "true" },
      "no compaction decision recorded")
    // semantics: 6 unique docs + the first instance of the repeated doc
    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == (0 until 6).map(_ * 10L).toSet + 1L,
      s"keeper set wrong after compactions: $kept")
    assert(spark.table("sed_compact_ledger").distinct().count() == 7)
  }

  test("exactDedupSink with retention: expired fingerprints re-admit; live ones still drop") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-dedup-retained").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    // a retention window no append can satisfy (every fingerprint is
    // "expired" the instant it lands) — the deterministic degenerate case:
    // cross-batch duplicates must ALL re-admit, while intra-batch dedup
    // (which never consults the ledger) still collapses. The positive case
    // — live fingerprints suppressing — is the un-retained sink spec above;
    // the sliding mid-case is wall-clock and lives in the retention soak.
    dropLedger("sed_retained_ledger")
    val q = StreamingEvents.exactDedupSink(docs, "text", keepOrder = Seq("doc_id"),
      outPath = s"$dir/out", ledgerTable = "sed_retained_ledger",
      checkpointPath = s"$dir/ckpt",
      retention = Some("seen_at > current_timestamp() + interval 1 hour"))
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "retained alpha"),
      (2L, ts("2024-01-01 10:01:00"), "retained alpha"), // intra-batch dup
      (3L, ts("2024-01-01 10:02:00"), "retained beta"))
    q.processAllAvailable()
    input.addData(
      (4L, ts("2024-01-02 09:00:00"), "retained alpha"), // expired → re-admit
      (5L, ts("2024-01-02 09:01:00"), "retained beta"))  // expired → re-admit
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L),
      s"keeper set wrong: $kept — every cross-batch dup is past the window " +
        "and must re-admit; the intra-batch dup (2) must still collapse")
    // the retained ledger carries the append timestamp the window selects on
    val cols = spark.table("sed_retained_ledger").columns.toSet
    assert(cols == Set("fingerprint", "seen_at"), cols.toString)
  }

  test("nearDupSink with retention: expired signatures re-admit; intra-batch near-dups still collapse") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-neardup-retained").toString
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val base = "the quick brown fox jumps over the lazy dog while the " +
      "distant river winds slowly through the quiet green valley at dawn"
    val nearDup = base.replace("quiet", "silent") // J ≈ 0.9

    // the same deterministic degenerate window as the exact retained spec:
    // every banded signature is expired the instant it lands, so the
    // cross-batch near-dup MUST re-admit (the un-retained spec above pins
    // the suppressing case), while intra-batch collapse — which never
    // consults the ledger — is unaffected
    dropLedger("snd_retained_ledger")
    val q = StreamingEvents.nearDupSink(docs, "doc_id", "text",
      threshold = 0.5, outPath = s"$dir/out", ledgerTable = "snd_retained_ledger",
      checkpointPath = s"$dir/ckpt",
      retention = Some("seen_at > current_timestamp() + interval 1 hour"))
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), base),
      (2L, ts("2024-01-01 10:01:00"), nearDup)) // intra-batch near-dup
    q.processAllAvailable()
    input.addData(
      (4L, ts("2024-01-02 09:00:00"), nearDup)) // expired window → re-admit
    q.processAllAvailable()
    q.stop()

    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L),
      s"keeper set wrong: $kept — the batch-2 near-dup is past the window " +
        "and must re-admit as the new keeper; the intra-batch near-dup (2) " +
        "must still collapse")
    // banded rows carry the append timestamp the window selects on
    val cols = spark.table("snd_retained_ledger").columns.toSet
    assert(cols == Set("band_idx", "band_hash", "sig", "seen_at"), cols.toString)
  }

  test("dedupStream drops watermark-window duplicates by content fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")

    val q = StreamingEvents.dedupStream(docs, "text", "ts")
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    input.addData(
      (1L, ts("2024-01-01 10:00:00"), "same content here"),
      (2L, ts("2024-01-01 10:01:00"), "same content here"), // dup within watermark
      (3L, ts("2024-01-01 10:02:00"), "different content"))
    q.processAllAvailable()
    val kept = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    q.stop()

    assert(kept == Set(1L, 3L))
  }
}
