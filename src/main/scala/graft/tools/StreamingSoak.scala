package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.core.GraftSession
import graft.streaming.StreamingEvents

/**
 * Many-batch soak measurement for the foreachBatch dedup sinks — the
 * evidence behind the [[graft.streaming.BucketedLedger]] "flat per-batch"
 * claim, which until this tool existed was plan-derived only
 * (BucketedLedgerSpec pins the one-sided join SHAPE; this measures the
 * TIME).
 *
 * Six modes (SPARK_GRAFT_SOAK_MODE):
 *
 *  - `exact` (default): drives `batches` deterministic micro-batches
 *    through [[StreamingEvents.exactDedupSink]], with `dupRate` of each
 *    batch's documents repeating earlier batches' content (the cross-batch
 *    anti-join does real work every batch).
 *  - `neardup`: the same corpus schedule through
 *    [[StreamingEvents.nearDupSink]] — the banded signature ledger, the
 *    more shuffle-prone layout (bands× rows, two-key band join). The
 *    duplicates are EXACT copies, so their MinHash signatures are
 *    identical, every band matches, and the slot-agreement estimate is
 *    exactly 1.0 ≥ threshold: the output assertion stays exact (one row
 *    per distinct document) while the per-batch cost exercises the full
 *    LSH machinery (signatures, band explode, bucketed band join,
 *    intra-batch connected components).
 *  - `retention`: a bounded-window exact-dedup soak in three phases —
 *    emit corpus A (all unique), sleep past the retention window, re-emit
 *    A (every fingerprint has EXPIRED → all must re-admit), then
 *    immediately re-emit A again (every fingerprint was just re-stamped →
 *    all must drop). Output must hold exactly 2 rows per document: the
 *    re-admission count equals the expired-fingerprint count, asserted,
 *    not eyeballed. The tool validates its own timing margins (phases B+C
 *    must fit inside the window) and aborts as INVALID — distinct from
 *    FAILED — when the host is too slow for the configured window.
 *  - `neardup_retention`: the bounded-window soak for the NEAR-dup sink,
 *    with SIMILAR (one token of 40 changed, Jaccard ≈ 0.86 ≥ threshold
 *    0.7) successors instead of verbatim copies — certifying that
 *    banded-signature expiry governs SIMILARITY suppression, not just
 *    identity. Four phases: A emits the corpus (all admit); A2 emits
 *    similar variants inside the window (dropped via the banded ledger —
 *    statistical bound ≥ 90%, the LSH band/estimate miss rate is ~0.8%);
 *    sleep past the window; B emits a second similar variant (EVERY
 *    expired keeper's similar successor must admit, exactly — suppression
 *    after expiry is impossible, so this count is deterministic); C
 *    re-emits B's texts (just-stamped keepers → all drop, estimate 1.0).
 *    Use a window that fits two phases of near-dup batches (~4-5 s each):
 *    SPARK_GRAFT_SOAK_WINDOW_S=240 at the defaults.
 *  - `retention_compaction`: the retention soak with COMPACTION CYCLES
 *    CROSSING the expiry boundary — the last untested interaction in the
 *    ledger matrix. The sink runs with a compaction threshold low enough
 *    (2× buckets) that the appends themselves trigger rewrites inside
 *    BOTH phases, and the soak forces one more compaction AT the expiry
 *    boundary, asserting the physical half of the window semantics: after
 *    the boundary rewrite the ledger holds ZERO rows (every expired
 *    fingerprint physically removed, bucket spec intact), phase B
 *    re-admits the full corpus ACROSS that swap, phase C drops it all
 *    against the fresh stamps, and the final physical state holds exactly
 *    one fresh-stamped row per fingerprint with no pre-boundary stamp
 *    surviving.
 *  - `sessionize`: the STATE-path soak — per-batch flatness of
 *    flatMapGroupsWithState sessionization under timeout-bounded state,
 *    with exact session-count/shape asserts (half the users close a
 *    session every batch via successors; half carry ONE session in state
 *    across the whole stream, emitted only by the sentinel flush).
 *
 * Broadcast joins are disabled for the session in every mode, so the
 * ledger side exercises the bucketed one-sided plan from batch 1 — the
 * plan a 100 TB deployment is on once the ledger dwarfs the broadcast
 * threshold — instead of hiding O(history) behind small-table broadcasts.
 *
 * What to read from the output: per-batch wall time over a ledger that
 * grows every batch and compacts every ~`compactAfterFiles / buckets`
 * batches. Flat (no O(history) trend) non-compaction batches = the
 * bucketed ledger claim holds; a linear climb would mean the history is
 * being re-shuffled per batch. The file count must sawtooth under
 * `compactAfterFiles + buckets` and never trend.
 *
 * Env knobs: SPARK_GRAFT_SOAK_MODE (exact|neardup|retention|
 * neardup_retention|retention_compaction|sessionize),
 * SPARK_GRAFT_SOAK_BATCHES (default 100), SPARK_GRAFT_SOAK_DOCS (per
 * batch, default 2000), SPARK_GRAFT_SOAK_DUP_RATE (default 0.3),
 * SPARK_GRAFT_SOAK_WINDOW_S (retention window seconds, default 60),
 * SPARK_GRAFT_SOAK_OBSERVER (exact/neardup only: "1" runs a concurrent
 * read-only monitor session polling [[graft.streaming.BucketedLedger
 * .readOrEmpty]]/fileCount for the soak's whole life — the r12
 * "readers never corrupt the swap" claim time-verified under real
 * micro-batch traffic and live compactions, with torn reads asserted
 * against, not eyeballed), SPARK_GRAFT_CPUS (default 16). Prints one
 * JSON line (batch times, decile medians, compaction count, flatness
 * ratio, observer read/retry counts) for BENCH_NOTES.
 */
object StreamingSoak {

  final case class Doc(doc_id: Long, text: String)

  /** Deterministic 12-token body for unique doc `u`: token vocabulary is
    * large (50k) and per-token choice is a hash mix, so two distinct
    * uniques share ~0 shingles (Jaccard ≈ 0 — no accidental near-dups),
    * while an exact copy is Jaccard 1 in every mode. */
  private def body(u: Long): String =
    (0 until 12).map { j =>
      val mix = (u * 0x9e3779b97f4a7c15L + j * 0xbf58476d1ce4e5b9L)
      "w" + java.lang.Long.toUnsignedString((mix ^ (mix >>> 31)) % 50000)
    }.mkString("doc ", " ", "")

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted; if (s.isEmpty) 0 else s(s.size / 2)
  }

  /** Per-batch walls → exactly 10 decile medians (batch 0 excluded: it
    * pays stream-start + codegen warmup). `grouped(ceil(n/10))` yields 10
    * groups for any n ≥ 10 — the previous `(n)/10` floor produced 11
    * groups at n=99, making "decile 10" a 9-batch remainder. */
  private def deciles(wallMs: Seq[Double]): Seq[Double] = {
    val steady = wallMs.drop(1)
    steady.grouped(math.max(1, math.ceil(steady.size / 10.0).toInt))
      .map(g => median(g.toSeq)).toSeq
  }

  private def cleanState(spark: SparkSession, root: String, tables: Seq[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    tables.flatMap(t => Seq(t, t + "__compacting", t + "__old")).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      fs.delete(new org.apache.hadoop.fs.Path(wh, t), true)
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = sys.env.getOrElse("SPARK_GRAFT_SOAK_MODE", "exact")
    val batches = sys.env.getOrElse("SPARK_GRAFT_SOAK_BATCHES", "100").toInt
    val docsPerBatch = sys.env.getOrElse("SPARK_GRAFT_SOAK_DOCS", "2000").toInt
    val dupRate = sys.env.getOrElse("SPARK_GRAFT_SOAK_DUP_RATE", "0.3").toDouble
    val windowS = sys.env.getOrElse("SPARK_GRAFT_SOAK_WINDOW_S", "60").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt

    val spark = GraftSession.local(cpus, s"streaming-soak-$mode")
    spark.sparkContext.setLogLevel("ERROR")
    // force the ledger joins off the broadcast path: the soak's subject is
    // the bucketed one-sided plan, the only plan that exists at scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val root = s"/tmp/graft-soak-$mode"
    val ledgerTable = s"soak_ledger_$mode"
    cleanState(spark, root, Seq(ledgerTable))

    val buckets = 8
    val compactAfterFiles = 64

    mode match {
      case "exact" | "neardup" =>
        runDupStream(spark, mode, root, ledgerTable, buckets, compactAfterFiles,
          batches, docsPerBatch, dupRate)
      case "retention" =>
        runRetention(spark, root, ledgerTable, buckets, compactAfterFiles,
          batches, docsPerBatch, windowS)
      case "neardup_retention" =>
        runNearDupRetention(spark, root, ledgerTable, buckets,
          compactAfterFiles, batches, docsPerBatch, windowS)
      case "retention_compaction" =>
        runRetentionCompaction(spark, root, ledgerTable, buckets,
          batches, docsPerBatch, windowS)
      case "sessionize" =>
        runSessionize(spark, root, batches, docsPerBatch)
      case other => sys.error(s"unknown SPARK_GRAFT_SOAK_MODE: $other")
    }
    spark.stop()
  }

  /** sessionize: the STATE-path soak — many batches through
    * [[StreamingEvents.sessionize]] (flatMapGroupsWithState + event-time
    * timeout), certifying that per-batch cost stays flat while state is
    * BOUNDED by the timeout (a stateful op whose cost or state grew with
    * stream history would trend), with exact final session counts.
    *
    * Corpus: `docsPerBatch` users, every batch advancing event time by
    * 90 s (gap 60 s). FAST users (half) get events at (b·90, b·90+1) —
    * the intra-batch pair merges (gap 1), the next batch's pair closes it
    * (gap 89 > 60): exactly `batches` two-event sessions per user, closed
    * by successors batch after batch. SLOW users (half) get events at
    * (b·90, b·90+45) — every consecutive gap is 45 ≤ 60, so ONE session
    * per user spans the entire stream, carried in state across all
    * batches and emitted only by the final sentinel flush (far-future
    * event, as in the sq5 replay; the sentinel's own session never
    * emits). All users ride the same timeline, so the watermark
    * (10 s delay) never drops a real event.
    *
    * Expected output, exact: batches·(users/2) fast sessions (n_events 2
    * each) + users/2 slow sessions (n_events 2·batches each); total
    * emitted events = every event emitted exactly once. */
  private def runSessionize(spark: SparkSession, root: String,
                            batches: Int, docsPerBatch: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val users = math.max(2, docsPerBatch / 2 * 2) // even
    val fast = users / 2

    val stream = MemoryStream[StreamingEvents.SessionEvent]
    val q = StreamingEvents.sessionize(stream.toDS(), gapSeconds = 60,
        watermark = "10 seconds")
      .writeStream.format("parquet")
      .option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").start()

    def ts(ms: Long) = new java.sql.Timestamp(1735689600000L + ms)
    val wallMs = ArrayBuffer[Double]()
    (0 until batches).foreach { b =>
      val base = b.toLong * 90000L
      val events = (0 until users).flatMap { u =>
        val second = if (u < fast) 1000L else 45000L
        Seq(StreamingEvents.SessionEvent(u.toLong, ts(base), b.toLong * users * 2 + u * 2),
          StreamingEvents.SessionEvent(u.toLong, ts(base + second), b.toLong * users * 2 + u * 2 + 1))
      }
      val t0 = System.nanoTime()
      stream.addData(events)
      q.processAllAvailable()
      wallMs += (System.nanoTime() - t0) / 1e6
      if (b % 10 == 0) System.err.println(f"# batch $b%3d  ${wallMs.last}%8.1f ms")
    }
    // sentinel flush: advances the watermark past every open session's
    // timeout; its own session stays in state, never emitted
    stream.addData(Seq(StreamingEvents.SessionEvent(-1L,
      ts(batches.toLong * 90000L + 86400000L), -1L)))
    q.processAllAvailable()
    q.stop()

    val out = spark.read.parquet(s"$root/out")
    val n = out.count()
    val expected = batches.toLong * fast + (users - fast)
    require(n == expected, s"session count $n != expected $expected")
    val byKind = out.groupBy(col("n_events")).count()
      .as[(Int, Long)].collect().toMap
    require(byKind.get(2).contains(batches.toLong * fast) &&
      byKind.get(2 * batches).contains((users - fast).toLong) &&
      byKind.size == 2,
      s"session shapes wrong: $byKind (expected ${batches.toLong * fast} " +
        s"two-event + ${users - fast} ${2 * batches}-event)")
    require(out.filter(col("user_id") < 0).isEmpty,
      "the sentinel's own session must never emit")

    val dec = deciles(wallMs.toSeq)
    println(Map(
      "metric" -> "\"streaming_soak\"",
      "mode" -> "\"sessionize\"",
      "batches" -> batches.toString,
      "users" -> users.toString,
      "events_per_batch" -> (users * 2).toString,
      "total_s" -> f"${wallMs.sum / 1000}%.1f",
      "decile_median_ms" -> dec.map(d => f"$d%.1f").mkString("[", ",", "]"),
      "last_over_first_decile" -> f"${dec.last / dec.head}%.3f",
      "sessions" -> n.toString,
      "open_sessions_flushed" -> (users - fast).toString
    ).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
  }

  /** exact/neardup: growing ledger, `dupRate` exact-copy duplicates. */
  private def runDupStream(spark: SparkSession, mode: String, root: String,
                           ledgerTable: String, buckets: Int,
                           compactAfterFiles: Int, batches: Int,
                           docsPerBatch: Int, dupRate: Double): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Doc]
    val query: StreamingQuery =
      if (mode == "exact")
        StreamingEvents.exactDedupSink(stream.toDF(), "text",
          keepOrder = Seq("doc_id"), outPath = s"$root/out",
          ledgerTable = ledgerTable, checkpointPath = s"$root/ckpt",
          ledgerBuckets = buckets, compactAfterFiles = compactAfterFiles)
      else
        StreamingEvents.nearDupSink(stream.toDF(), "doc_id", "text",
          threshold = 0.7, outPath = s"$root/out",
          ledgerTable = ledgerTable, checkpointPath = s"$root/ckpt",
          ledgerBuckets = buckets, compactAfterFiles = compactAfterFiles)
    val ledger =
      if (mode == "exact") StreamingEvents.exactDedupLedger(ledgerTable, buckets, compactAfterFiles)
      else StreamingEvents.nearDupLedger(ledgerTable, buckets, compactAfterFiles)

    // optional concurrent observer: a READ-ONLY monitor session polling the
    // ledger while the writer appends/compacts — the BucketedLedgerSpec race
    // soak's contract (action-time retry, torn reads asserted) running for
    // the full soak life instead of 15 spec-scale cycles
    val observe = sys.env.getOrElse("SPARK_GRAFT_SOAK_OBSERVER", "0") == "1"
    val stopObserver = new java.util.concurrent.atomic.AtomicBoolean(false)
    val observerError = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val observerReads = new java.util.concurrent.atomic.AtomicInteger(0)
    val observerRetries = new java.util.concurrent.atomic.AtomicInteger(0)
    val observer: Option[Thread] = if (!observe) None else Some {
      val session = spark.newSession()
      val t = new Thread(() => {
        // per the readOrEmpty contract: analysis-time swap misses retry
        // inside readOrEmpty; ACTION-time file deletion is the caller's
        // half, so the monitor wraps its count() in the same short retry
        def withRetry[T](body: => T): T = {
          var attempt = 0
          var out: Option[T] = None
          while (out.isEmpty) {
            try out = Some(body)
            catch {
              // MidSwapListing is in the set because readOrEmpty rethrows
              // it once its own 5-attempt budget is exhausted — a probe
              // straddle during a host stall wave can outlive that budget
              case e @ (_: org.apache.spark.SparkException |
                        _: org.apache.spark.sql.AnalysisException |
                        _: java.io.FileNotFoundException |
                        _: graft.streaming.BucketedLedger.MidSwapListing) =>
                if (attempt >= 5) throw e
                attempt += 1; observerRetries.incrementAndGet()
                Thread.sleep(20L * attempt)
            }
          }
          out.get
        }
        var lastCount = 0L
        try while (!stopObserver.get()) {
          // a 0 count after a nonzero one is NOT a torn read: when a
          // probe-straddle exhausts readOrEmpty's internal retry budget it
          // returns the empty fallback frame (count 0) — a transient, so
          // it re-enters the retry loop instead of failing the soak. A
          // genuine shrink (0 < c < lastCount) still fails immediately.
          val c = withRetry {
            val n = ledger.readOrEmpty(session).count()
            if (n == 0 && lastCount > 0)
              throw new graft.streaming.BucketedLedger.MidSwapListing(
                s"empty fallback frame after $lastCount rows (probe straddle)")
            n
          }
          require(c >= lastCount, s"torn read: ledger shrank $lastCount -> $c")
          lastCount = c
          withRetry(ledger.fileCount(session))
          observerReads.incrementAndGet()
        } catch { case t: Throwable => observerError.set(t) }
      }, "soak-ledger-observer")
      t.start()
      t
    }

    // deterministic corpus: a duplicate in batch i repeats a uniformly-
    // spread earlier unique VERBATIM. The xorshift-ish mix keeps the dup
    // choice deterministic without java.util.Random state threading.
    var nextUnique = 0L
    val wallMs = ArrayBuffer.empty[Double]
    val files = ArrayBuffer.empty[Int]
    var compactions = 0
    (0 until batches).foreach { i =>
      val docs = (0 until docsPerBatch).map { j =>
        val id = i.toLong * docsPerBatch + j
        val dup = nextUnique > 0 && {
          val mix = (id * 0x9e3779b97f4a7c15L) >>> 40
          (mix % 1000) < (dupRate * 1000).toLong
        }
        val u = if (dup) ((id * 0x2545f4914f6cdd1dL) >>> 33) % nextUnique
                else { nextUnique += 1; nextUnique - 1 }
        Doc(id, body(u))
      }
      val t0 = System.nanoTime()
      stream.addData(docs)
      query.processAllAvailable()
      val ms = (System.nanoTime() - t0) / 1e6
      wallMs += ms
      val f = ledger.fileCount(spark)
      files += f
      val compacted = i > 0 && f < files(i - 1)
      if (compacted) compactions += 1
      System.err.println(f"# batch $i%3d  ${ms}%8.1f ms  ledger_files=$f%3d" +
        (if (compacted) "  [compacted]" else ""))
    }
    query.stop()
    observer.foreach { t =>
      stopObserver.set(true)
      t.join(30000)
      require(observerError.get() == null,
        s"observer failed mid-compaction: ${observerError.get()}")
      require(observerReads.get() > 0, "observer never completed a read")
    }

    // correctness: exactly one output row per distinct document ever
    // emitted — intra-batch and cross-batch duplicates (exact copies, so
    // estimate 1.0 in neardup mode) all dropped
    val out = spark.read.parquet(s"$root/out")
    val outCount = out.count()
    val outDistinct = out.select(col("text")).distinct().count()
    require(outCount == nextUnique && outDistinct == nextUnique,
      s"soak dedup broken: $outCount rows / $outDistinct distinct, " +
        s"expected $nextUnique uniques")

    val dec = deciles(wallMs.toSeq)
    val flatness = if (dec.size >= 2 && dec.head > 0) dec.last / dec.head else 1.0
    println(Map(
      "metric" -> "\"streaming_soak\"",
      "mode" -> s""""$mode"""",
      "batches" -> batches.toString,
      "docs_per_batch" -> docsPerBatch.toString,
      "dup_rate" -> dupRate.toString,
      "unique_docs" -> nextUnique.toString,
      "compactions" -> compactions.toString,
      "max_ledger_files" -> files.max.toString,
      "decile_median_ms" -> dec.map(d => f"$d%.1f").mkString("[", ",", "]"),
      "last_over_first_decile" -> f"$flatness%.3f",
      "total_s" -> f"${wallMs.sum / 1000}%.1f",
      "observer_reads" -> (if (observe) observerReads.get.toString else "null"),
      "observer_retries" -> (if (observe) observerRetries.get.toString else "null")
    ).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
  }

  /** 40-token body for the near-dup retention phases: long enough that a
    * one-token change keeps Jaccard ≈ 0.86 (39 shingles at n=3, 3 affected
    * by the last-token swap → 36/42), comfortably above the 0.7 threshold
    * with the k=32 estimate's σ ≈ 0.06. Distinct uniques still share ~0
    * shingles (hash-mixed 50k vocabulary). */
  private def bodyLong(u: Long): String =
    (0 until 40).map { j =>
      val mix = (u * 0x9e3779b97f4a7c15L + j * 0xbf58476d1ce4e5b9L)
      "w" + java.lang.Long.toUnsignedString((mix ^ (mix >>> 31)) % 50000)
    }.mkString("doc ", " ", "")

  /** SIMILAR (not identical) successor of unique `u`: [[bodyLong]] with
    * only the LAST token swapped for a salt-derived one — deterministic,
    * distinct per salt, Jaccard vs the original ≈ 0.86. */
  private def variant(u: Long, salt: Int): String = {
    val toks = bodyLong(u).split(" ")
    toks(toks.length - 1) =
      s"v${salt}x${java.lang.Long.toUnsignedString((u * 0x2545f4914f6cdd1dL + salt) >>> 40)}"
    toks.mkString(" ")
  }

  /** neardup_retention: four-phase bounded-window near-dup soak with
    * similar (one-token-changed) successors (see object scaladoc). */
  private def runNearDupRetention(spark: SparkSession, root: String,
                                  ledgerTable: String, buckets: Int,
                                  compactAfterFiles: Int, batches: Int,
                                  docsPerBatch: Int, windowS: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val phaseBatches = math.max(2, batches / 10)
    val corpus = phaseBatches.toLong * docsPerBatch

    val stream = MemoryStream[Doc]
    val query = StreamingEvents.nearDupSink(stream.toDF(), "doc_id", "text",
      threshold = 0.7, outPath = s"$root/out",
      ledgerTable = ledgerTable, checkpointPath = s"$root/ckpt",
      ledgerBuckets = buckets, compactAfterFiles = compactAfterFiles,
      retention = Some(s"seen_at > current_timestamp() - interval $windowS seconds"))

    def emit(phase: String, idBase: Long, text: Long => String): Double = {
      val t0 = System.nanoTime()
      (0 until phaseBatches).foreach { i =>
        val docs = (0 until docsPerBatch).map { j =>
          val u = i.toLong * docsPerBatch + j
          Doc(idBase + u, text(u))
        }
        val b0 = System.nanoTime()
        stream.addData(docs)
        query.processAllAvailable()
        System.err.println(
          f"# $phase batch $i%3d  ${(System.nanoTime() - b0) / 1e6}%8.1f ms")
      }
      (System.nanoTime() - t0) / 1e9
    }
    def outCount(): Long = spark.read.parquet(s"$root/out").count()

    // phase A: the corpus, all unique → all admitted
    val aS = emit("A", 0L, bodyLong)
    val afterA = outCount()
    require(afterA == corpus,
      s"phase A broken: $afterA rows admitted, expected the full corpus $corpus")

    // phase A2, inside the window: SIMILAR successors must be suppressed
    // by the banded ledger. LSH is probabilistic here (band miss + estimate
    // noise ≈ 0.8% at J≈0.86), so the bound is statistical: ≥ 90% dropped —
    // a broken similarity path admits ~100%.
    val a2S = emit("A2", 10_000_000L, u => variant(u, 1))
    require(aS + a2S < windowS * 0.9,
      f"INVALID RUN (not a dedup failure): phases A+A2 took ${aS + a2S}%.1f s, " +
        f"too close to the $windowS s window — raise SPARK_GRAFT_SOAK_WINDOW_S")
    val afterA2 = outCount()
    val admittedA2 = afterA2 - corpus
    require(admittedA2 <= corpus / 10,
      s"within-window SIMILAR suppression broken: $admittedA2 of $corpus " +
        "one-token-changed successors admitted while their keepers' " +
        "signatures were still in the window")

    System.err.println(f"# phases A/A2 done ($aS%.1f/$a2S%.1f s, " +
      f"$admittedA2 LSH misses); sleeping past the $windowS s window")
    Thread.sleep((windowS + 15) * 1000L)

    // phase B: a SECOND similar variant after every signature expired —
    // admission is deterministic (nothing in-window can suppress), and the
    // count certifies banded-signature expiry ⇒ similar successor admitted
    val bT0 = System.nanoTime()
    val bS = emit("B", 20_000_000L, u => variant(u, 2))
    val afterB = outCount()
    require(afterB == afterA2 + corpus,
      s"expiry re-admission broken: ${afterB - afterA2} similar successors " +
        s"admitted after expiry, expected ALL $corpus (expired banded " +
        "signatures must not suppress)")

    // phase C: B's texts verbatim against the just-stamped B keepers —
    // estimate exactly 1.0 ≥ threshold, all drop
    val cS = emit("C", 30_000_000L, u => variant(u, 2))
    val bcS = (System.nanoTime() - bT0) / 1e9
    query.stop()
    require(bcS < windowS * 0.9,
      f"INVALID RUN (not a dedup failure): phases B+C took $bcS%.1f s, " +
        f"too close to the $windowS s window — raise SPARK_GRAFT_SOAK_WINDOW_S")
    val finalCount = outCount()
    require(finalCount == afterB,
      s"re-stamped drop broken: ${finalCount - afterB} verbatim copies of " +
        "phase-B keepers admitted against in-window signatures")

    println(Map(
      "metric" -> "\"streaming_soak\"",
      "mode" -> "\"neardup_retention\"",
      "phase_batches" -> phaseBatches.toString,
      "docs_per_batch" -> docsPerBatch.toString,
      "corpus" -> corpus.toString,
      "window_s" -> windowS.toString,
      "phase_a_s" -> f"$aS%.1f",
      "phase_a2_s" -> f"$a2S%.1f",
      "phase_b_s" -> f"$bS%.1f",
      "phase_c_s" -> f"$cS%.1f",
      "similar_dropped_in_window" -> (corpus - admittedA2).toString,
      "lsh_misses_in_window" -> admittedA2.toString,
      "readmitted_after_expiry" -> corpus.toString
    ).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
  }

  /** retention_compaction: the retention soak with compaction cycles
    * crossing the expiry boundary (see object scaladoc). */
  private def runRetentionCompaction(spark: SparkSession, root: String,
                                     ledgerTable: String, buckets: Int,
                                     batches: Int, docsPerBatch: Int,
                                     windowS: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // threshold 2×buckets: each append lands ≤ buckets files, so every
    // ~3rd append crosses the threshold — compactions run INSIDE the
    // phases, not just at the boundary we force below
    val compactAfterFiles = buckets * 2
    val phaseBatches = math.max(4, batches / 10)
    val corpus = phaseBatches.toLong * docsPerBatch
    val retention = s"seen_at > current_timestamp() - interval $windowS seconds"

    val stream = MemoryStream[Doc]
    val query = StreamingEvents.exactDedupSink(stream.toDF(), "text",
      keepOrder = Seq("doc_id"), outPath = s"$root/out",
      ledgerTable = ledgerTable, checkpointPath = s"$root/ckpt",
      ledgerBuckets = buckets, compactAfterFiles = compactAfterFiles,
      retention = Some(retention))
    // independent handle on the SAME catalog table, for the forced
    // boundary compaction and the physical-state reads; safe because the
    // sink only writes inside processAllAvailable, which has returned
    val handle = StreamingEvents.exactDedupLedger(ledgerTable, buckets,
      compactAfterFiles = buckets, retention = Some(retention))

    def emitCorpus(phase: String, idBase: Long): Double = {
      val t0 = System.nanoTime()
      (0 until phaseBatches).foreach { i =>
        val docs = (0 until docsPerBatch).map { j =>
          val u = i.toLong * docsPerBatch + j
          Doc(idBase + u, body(u))
        }
        val b0 = System.nanoTime()
        stream.addData(docs)
        query.processAllAvailable()
        System.err.println(
          f"# $phase batch $i%3d  ${(System.nanoTime() - b0) / 1e6}%8.1f ms")
      }
      (System.nanoTime() - t0) / 1e9
    }
    // refresh first: the sink appends/compacts through a CLONED session,
    // and this session's relation cache otherwise pins a stale (even
    // empty) file index across the boundary swap
    def physicalRows(): Long = {
      spark.catalog.refreshTable(ledgerTable)
      spark.table(ledgerTable).count()
    }

    val aS = emitCorpus("A", 0L)
    val inPhaseCompactsA = compactDecisions(ledgerTable)
    require(inPhaseCompactsA >= 1,
      s"expected at least one in-phase compaction during phase A " +
        s"(threshold $compactAfterFiles, ${phaseBatches}×≤$buckets appends); " +
        "the soak is not exercising the crossing it exists for")
    val physA = physicalRows()
    require(physA >= corpus, // duplicates of stamps can't exist yet
      s"phase A ledger holds $physA physical rows, expected >= $corpus")
    System.err.println(f"# phase A done in $aS%.1f s " +
      f"($inPhaseCompactsA compactions, $physA physical rows); " +
      f"sleeping past the $windowS s window")
    Thread.sleep((windowS + 15) * 1000L)

    // the forced boundary compaction: every phase-A stamp has expired, so
    // the rewrite must physically remove ALL of them while the bucket spec
    // and catalog entry stay intact for phase B's appends
    require(handle.maybeCompact(spark),
      "boundary compaction did not run (file count under threshold?)")
    val physBoundary = physicalRows()
    require(physBoundary == 0L,
      s"boundary compaction left $physBoundary physical rows; expected 0 " +
        "(every phase-A stamp expired)")
    System.err.println("# boundary compaction: ledger physically empty, spec intact")
    // reset the decision registry so the post-boundary count is per-phase:
    // the key embeds the pre-compaction file count, and B's appends replay
    // A's file-count trajectory exactly — same-size compactions collapse
    // onto one key across phases (observed: B's compaction vanished into
    // A's). The registry is this soak JVM's own; clearing is safe.
    graft.core.Decisions.clear()

    val bT0 = System.nanoTime()
    val bS = emitCorpus("B", 10_000_000L) // all expired → re-admit across the swap
    val cS = emitCorpus("C", 20_000_000L) // all just re-stamped → drop
    val bcS = (System.nanoTime() - bT0) / 1e9
    query.stop()
    require(bcS < windowS * 0.9,
      f"INVALID RUN (not a dedup failure): phases B+C took $bcS%.1f s, " +
        f"too close to the $windowS s window — raise SPARK_GRAFT_SOAK_WINDOW_S " +
        "or shrink the corpus")

    // final physical state: one fresh-stamped row per fingerprint at most
    // one compaction behind (C appends nothing, B may leave uncompacted
    // duplicates of NOTHING — every B fingerprint appended once)
    val compactsAfterBoundary = compactDecisions(ledgerTable)
    require(compactsAfterBoundary >= 1,
      "no compaction ran after the expiry boundary (inside phases B/C)")
    spark.catalog.refreshTable(ledgerTable)
    val finalPhys = spark.table(ledgerTable)
    val finalRows = finalPhys.count()
    val distinctFps = finalPhys.select("fingerprint").distinct().count()
    require(finalRows == corpus && distinctFps == corpus,
      s"final ledger physical state: $finalRows rows / $distinctFps " +
        s"distinct fingerprints, expected $corpus / $corpus")

    val out = spark.read.parquet(s"$root/out")
    val outCount = out.count()
    val outDistinct = out.select(col("text")).distinct().count()
    require(outCount == 2 * corpus && outDistinct == corpus,
      s"re-admission across the compaction swap broken: $outCount rows / " +
        s"$outDistinct distinct, expected ${2 * corpus} / $corpus")

    println(Map(
      "metric" -> "\"streaming_soak\"",
      "mode" -> "\"retention_compaction\"",
      "phase_batches" -> phaseBatches.toString,
      "docs_per_batch" -> docsPerBatch.toString,
      "corpus" -> corpus.toString,
      "window_s" -> windowS.toString,
      "compact_after_files" -> compactAfterFiles.toString,
      "phase_a_s" -> f"$aS%.1f",
      "phase_b_s" -> f"$bS%.1f",
      "phase_c_s" -> f"$cS%.1f",
      "compactions_phase_a" -> inPhaseCompactsA.toString,
      "compactions_after_boundary" -> compactsAfterBoundary.toString,
      "boundary_physical_rows" -> physBoundary.toString,
      "final_physical_rows" -> finalRows.toString,
      "readmitted_across_swap" -> (outCount - corpus).toString
    ).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
  }

  /** Count of RAN ledger compactions recorded for `table` so far (the
    * Decisions key embeds the pre-compaction file count, so distinct
    * crossings at distinct sizes each leave a key; a repeat at the same
    * size collapses — fine for the >= assertions here). */
  private def compactDecisions(table: String): Int =
    graft.core.Decisions.snapshot.count { case (k, v) =>
      k.startsWith(s"ledger.compact($table") && v == "true"
    }

  /** retention: three-phase bounded-window soak (see object scaladoc). */
  private def runRetention(spark: SparkSession, root: String,
                           ledgerTable: String, buckets: Int,
                           compactAfterFiles: Int, batches: Int,
                           docsPerBatch: Int, windowS: Int): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // phase size: a tenth of the batch budget, at least 2 batches (keeps
    // phases B+C comfortably inside the retention window even when the
    // overall soak budget is long)
    val phaseBatches = math.max(2, batches / 10)
    val corpus = phaseBatches.toLong * docsPerBatch

    val stream = MemoryStream[Doc]
    val query = StreamingEvents.exactDedupSink(stream.toDF(), "text",
      keepOrder = Seq("doc_id"), outPath = s"$root/out",
      ledgerTable = ledgerTable, checkpointPath = s"$root/ckpt",
      ledgerBuckets = buckets, compactAfterFiles = compactAfterFiles,
      retention = Some(s"seen_at > current_timestamp() - interval $windowS seconds"))

    def emitCorpus(phase: String, idBase: Long): Double = {
      val t0 = System.nanoTime()
      (0 until phaseBatches).foreach { i =>
        val docs = (0 until docsPerBatch).map { j =>
          val u = i.toLong * docsPerBatch + j
          Doc(idBase + u, body(u))
        }
        val b0 = System.nanoTime()
        stream.addData(docs)
        query.processAllAvailable()
        System.err.println(
          f"# $phase batch $i%3d  ${(System.nanoTime() - b0) / 1e6}%8.1f ms")
      }
      (System.nanoTime() - t0) / 1e9
    }

    val aS = emitCorpus("A", 0L)
    System.err.println(f"# phase A done in $aS%.1f s; sleeping past the $windowS s window")
    Thread.sleep((windowS + 15) * 1000L)
    val bT0 = System.nanoTime()
    val bS = emitCorpus("B", 10_000_000L) // every A fingerprint expired → re-admit
    val cS = emitCorpus("C", 20_000_000L) // every fingerprint just re-stamped → drop
    val bcS = (System.nanoTime() - bT0) / 1e9
    query.stop()

    // timing validity BEFORE correctness: phase C's drops are only
    // guaranteed while the B re-stamps are still inside the window
    require(bcS < windowS * 0.9,
      f"INVALID RUN (not a dedup failure): phases B+C took $bcS%.1f s, " +
        f"too close to the $windowS s window — raise SPARK_GRAFT_SOAK_WINDOW_S " +
        "or shrink the corpus")

    val out = spark.read.parquet(s"$root/out")
    val outCount = out.count()
    val outDistinct = out.select(col("text")).distinct().count()
    require(outCount == 2 * corpus && outDistinct == corpus,
      s"retention re-admission broken: $outCount rows / $outDistinct " +
        s"distinct, expected ${2 * corpus} rows (= corpus $corpus admitted " +
        "in phase A + ALL of it re-admitted after expiry in phase B, none " +
        "in phase C)")

    println(Map(
      "metric" -> "\"streaming_soak\"",
      "mode" -> "\"retention\"",
      "phase_batches" -> phaseBatches.toString,
      "docs_per_batch" -> docsPerBatch.toString,
      "corpus" -> corpus.toString,
      "window_s" -> windowS.toString,
      "phase_a_s" -> f"$aS%.1f",
      "phase_b_s" -> f"$bS%.1f",
      "phase_c_s" -> f"$cS%.1f",
      "readmitted" -> (outCount - corpus).toString,
      "expired" -> corpus.toString
    ).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
  }
}
