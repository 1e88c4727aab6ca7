package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The sinks' persistent "seen" state: bucketed so the per-batch join is
  * one-sided (only the micro-batch shuffles), self-compacting so a
  * long-lived stream cannot explode into per-batch small files. */
class BucketedLedgerSpec extends SparkSpecBase {

  import spark.implicits._

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Drop the catalog entry AND its warehouse directory: a previous test
    * JVM's managed-table data outlives the in-memory catalog, and a fresh
    * CREATE then fails LOCATION_ALREADY_EXISTS. */
  private def dropLedger(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${name}__compacting")
    spark.sql(s"DROP TABLE IF EXISTS ${name}__old")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq(name, name + "__compacting", name + "__old").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(wh, t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("append/read roundtrip; appends are pre-partitioned to <= buckets files") {
    val l = BucketedLedger("bl_roundtrip", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_roundtrip")
    assert(l.readOrEmpty(spark).count() === 0L)
    l.append(Seq(1L, 2L, 3L).toDF("fingerprint"))
    l.append(Seq(4L, 5L).toDF("fingerprint"))
    assert(l.readOrEmpty(spark).as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(l.fileCount(spark) <= 8, "two appends must add at most 2 x buckets files")
  }

  test("anti-join against the ledger shuffles ONLY the batch side") {
    val l = BucketedLedger("bl_onesided", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_onesided")
    l.append((1L to 100L).toDF("fingerprint"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val batch = (90L to 110L).toDF("fingerprint")
      val fresh = batch.join(l.readOrEmpty(spark), Seq("fingerprint"), "left_anti")
      val plan = formatted(fresh)
      assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length === 1,
        s"expected exactly one shuffle (the batch side), plan:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"ledger scan lost its bucketing, plan:\n$plan")
      assert(fresh.as[Long].collect().toSet === (101L to 110L).toSet)
    }
  }

  test("alias over the bucketed scan keeps the join one-sided (sink shape)") {
    val l = BucketedLedger("bl_alias", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_alias")
    l.append((1L to 50L).toDF("fingerprint"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val seen = l.readOrEmpty(spark).select(col("fingerprint").as("dup_group"))
      val batch = (40L to 60L).toDF("dup_group")
      val plan = formatted(batch.join(seen, Seq("dup_group"), "left_anti"))
      assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length === 1,
        s"aliased ledger side must not re-shuffle, plan:\n$plan")
    }
  }

  test("compaction rewrites to exactly `buckets` files and keeps the table bucketed") {
    val l = BucketedLedger("bl_compact", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT",
      compactAfterFiles = 5)
    dropLedger("bl_compact")
    (0 until 4).foreach { i =>
      l.append((i * 10L until i * 10L + 10L).toDF("fingerprint"))
      val did = l.maybeCompact(spark)
      info(s"iter $i: files=${l.fileCount(spark)} compacted=$did")
    }
    assert(l.fileCount(spark) <= 5,
      s"compaction never brought file count down: ${l.fileCount(spark)}")
    assert(l.readOrEmpty(spark).as[Long].collect().toSet === (0L until 40L).toSet)
    // post-compaction the join must still be one-sided
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val plan = formatted(
        Seq(1L).toDF("fingerprint").join(l.readOrEmpty(spark), Seq("fingerprint"), "left_anti"))
      assert(plan.contains("Bucketed: true"), s"compaction lost bucket metadata:\n$plan")
      assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length === 1)
    }
  }

  // --- crash-window recovery: a compaction swap can die at any step; no
  // --- half-state may cost the ledger its history (the "empty ledger →
  // --- every historical duplicate re-admits" failure mode).

  test("recovery: crash between the renames (main gone, temp complete) — reads resolve the temp WITHOUT mutating; the next append heals") {
    val l = BucketedLedger("bl_crash_mid", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_crash_mid")
    l.append((1L to 20L).toDF("fingerprint"))
    // simulate: temp written + main renamed away, crash before temp renamed
    // in — the temp (content-identical here) is the only surviving copy
    spark.sql("ALTER TABLE bl_crash_mid RENAME TO bl_crash_mid__compacting")
    assert(!spark.catalog.tableExists("bl_crash_mid"))

    // a READ (e.g. an external monitor) sees the full history but performs
    // NO catalog mutation — a reader racing the writer's swap window must
    // not rename tables out from under the writer
    val read = l.readOrEmpty(spark)
    assert(read.as[Long].collect().toSet === (1L to 20L).toSet,
      "read through the surviving temp copy must carry the full history")
    assert(!spark.catalog.tableExists("bl_crash_mid"),
      "readOrEmpty must not heal — healing is writer-only")
    assert(spark.catalog.tableExists("bl_crash_mid__compacting"))

    // the WRITER's next append heals the half-state, and dedup behaves as
    // if the crash never happened: every historical fingerprint still drops
    l.append(Seq(100L).toDF("fingerprint"))
    assert(spark.catalog.tableExists("bl_crash_mid"), "append must reinstate the main table")
    assert(!spark.catalog.tableExists("bl_crash_mid__compacting"))
    val batch = (15L to 25L).toDF("fingerprint")
    val fresh = batch.join(l.readOrEmpty(spark), Seq("fingerprint"), "left_anti")
    assert(fresh.as[Long].collect().toSet === (21L to 25L).toSet)
  }

  test("recovery: crash with only the set-aside __old copy — read-only resolve, then the writer restores it") {
    val l = BucketedLedger("bl_crash_old", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_crash_old")
    l.append((1L to 10L).toDF("fingerprint"))
    spark.sql("ALTER TABLE bl_crash_old RENAME TO bl_crash_old__old")

    assert(l.readOrEmpty(spark).as[Long].collect().toSet === (1L to 10L).toSet)
    assert(!spark.catalog.tableExists("bl_crash_old"),
      "readOrEmpty must not heal — healing is writer-only")

    l.recover(spark) // what append/maybeCompact run first
    assert(spark.catalog.tableExists("bl_crash_old"))
    assert(!spark.catalog.tableExists("bl_crash_old__old"))
    assert(l.readOrEmpty(spark).as[Long].collect().toSet === (1L to 10L).toSet)
  }

  test("recovery: dangling __old after a completed swap is dropped, main untouched") {
    val l = BucketedLedger("bl_crash_dangle", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_crash_dangle")
    l.append((1L to 10L).toDF("fingerprint"))
    // a stale set-aside copy from a swap that completed through the rename
    // but died before its final drop
    Seq(99L).toDF("fingerprint").write.format("parquet")
      .saveAsTable("bl_crash_dangle__old")
    l.recover(spark)
    assert(!spark.catalog.tableExists("bl_crash_dangle__old"))
    assert(l.readOrEmpty(spark).as[Long].collect().toSet === (1L to 10L).toSet)
  }

  test("recovery: maybeCompact on the mid-swap state never destroys the only copy") {
    val l = BucketedLedger("bl_crash_compact", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT",
      compactAfterFiles = 2)
    dropLedger("bl_crash_compact")
    (0 until 3).foreach(i => l.append(Seq(i * 10L, i * 10L + 1L).toDF("fingerprint")))
    spark.sql("ALTER TABLE bl_crash_compact RENAME TO bl_crash_compact__compacting")
    // the old code's first act was DROP TABLE IF EXISTS <tmp> — here that
    // temp is the ONLY copy; the new code must recover before any drop
    l.maybeCompact(spark)
    assert(l.readOrEmpty(spark).as[Long].collect().toSet ===
      Set(0L, 1L, 10L, 11L, 20L, 21L))
  }

  // --- bucket-spec validation on reuse

  test("append onto a pre-existing table with a mismatched bucket spec fails loudly") {
    dropLedger("bl_mismatch")
    (1L to 10L).toDF("fingerprint").write.format("parquet")
      .bucketBy(8, "fingerprint").saveAsTable("bl_mismatch")
    val l = BucketedLedger("bl_mismatch", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    val e = intercept[IllegalArgumentException] {
      l.append(Seq(11L).toDF("fingerprint"))
    }
    assert(e.getMessage.contains("bucket spec"), e.getMessage)
    // and an unbucketed pre-existing table is rejected too
    dropLedger("bl_mismatch")
    (1L to 10L).toDF("fingerprint").write.format("parquet")
      .saveAsTable("bl_mismatch")
    val l2 = BucketedLedger("bl_mismatch", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    intercept[IllegalArgumentException] { l2.append(Seq(11L).toDF("fingerprint")) }
  }

  test("reused table with a WIDER schema fails loudly (compaction would drop its columns)") {
    dropLedger("bl_wide")
    Seq((1L, "keepme")).toDF("fingerprint", "extra").write.format("parquet")
      .bucketBy(4, "fingerprint").saveAsTable("bl_wide")
    val l = BucketedLedger("bl_wide", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    val e = intercept[IllegalArgumentException] {
      l.append(Seq(2L).toDF("fingerprint"))
    }
    assert(e.getMessage.contains("schema"), e.getMessage)
    // ... and maybeCompact runs the same gate before any rewrite
    val l2 = BucketedLedger("bl_wide", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT",
      compactAfterFiles = 4)
    intercept[IllegalArgumentException] { l2.maybeCompact(spark) }
    dropLedger("bl_wide")
  }

  test("recover() re-arms the bucket-spec check: a healed-in table with the wrong spec is caught") {
    dropLedger("bl_rearm")
    val l = BucketedLedger("bl_rearm", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    l.append(Seq(1L).toDF("fingerprint")) // validates the spec, arms the flag
    // simulate an out-of-band swap: main vanishes, a WRONGLY-bucketed copy
    // sits at __old; recover() renames it in and must re-validate
    spark.sql("DROP TABLE bl_rearm")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val p = new org.apache.hadoop.fs.Path(wh, "bl_rearm")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    Seq(2L).toDF("fingerprint").write.format("parquet")
      .bucketBy(8, "fingerprint").saveAsTable("bl_rearm__old")
    val e = intercept[IllegalArgumentException] {
      l.append(Seq(3L).toDF("fingerprint")) // recover() heals, then re-checks
    }
    assert(e.getMessage.contains("bucket spec"), e.getMessage)
    dropLedger("bl_rearm")
  }

  test("ledger writes never flip the caller session's AQE flag (cloned-session scope)") {
    val l = BucketedLedger("bl_aqe", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT",
      compactAfterFiles = 2)
    dropLedger("bl_aqe")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true",
      "precondition: the spec session runs with AQE on")
    (0 until 3).foreach(i => l.append(Seq(i.toLong).toDF("fingerprint")))
    assert(l.maybeCompact(spark), "appends should have tripped compaction")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true",
      "write path must scope AQE-off to its clone, not the caller session")
    // and the AQE-off clone still pinned the file count
    assert(l.fileCount(spark) === 2)
    assert(l.readOrEmpty(spark).as[Long].collect().toSet === Set(0L, 1L, 2L))
    dropLedger("bl_aqe")
  }

  test("writeSession is memoized per parent session (no per-write SessionState churn)") {
    val l = BucketedLedger("bl_ws", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    val w1 = l.writeSession(spark)
    val w2 = l.writeSession(spark)
    assert(w1 eq w2, "same parent must reuse the cached AQE-off clone")
    assert(w1.conf.get("spark.sql.adaptive.enabled") === "false")
    assert(w1 ne spark)
    // a different parent session gets its own clone (one-slot cache:
    // single-writer discipline means parents don't interleave)
    val other = spark.newSession()
    val w3 = l.writeSession(other)
    assert(w3 ne w1, "clone must be keyed on the parent session identity")
    assert(w3.conf.get("spark.sql.adaptive.enabled") === "false")
  }

  test("writeSession memo survives GC while the parent session is live") {
    // r13 defect: the memo weakly referenced a (parent, clone) TUPLE,
    // which nothing else referenced — any GC could clear it while the
    // parent was strongly live, reverting to per-write SessionState
    // churn. The fixed shape weakly keys the PARENT only.
    val l = BucketedLedger("bl_ws_gc", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    val w1 = l.writeSession(spark)
    System.gc(); System.runFinalization(); System.gc()
    val w2 = l.writeSession(spark)
    assert(w1 eq w2, "GC with a live parent must not clear the write-session memo")
  }

  test("concurrent reader never corrupts live compactions and retries through the swap window") {
    // the r12 design claim, time-verified at spec scale: a read-only
    // monitor polling readOrEmpty/fileCount while the single writer runs
    // live append+compaction cycles must (a) never crash the writer's
    // swap, (b) never see a torn ledger (counts only grow), and (c) come
    // through any mid-swap window via the bounded retry instead of
    // surfacing a transient table-not-found.
    val l = BucketedLedger("bl_race", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT",
      compactAfterFiles = 2) // every append trips a compaction: max swap pressure
    dropLedger("bl_race")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val monitorError = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val monitorReads = new java.util.concurrent.atomic.AtomicInteger(0)
    val monitorSession = spark.newSession()
    val monitor = new Thread(() => {
      // per the readOrEmpty contract, a monitor scanning concurrently
      // with live compactions wraps its ACTION in the same short retry
      // the resolve step uses (analysis-time misses are retried inside
      // readOrEmpty; action-time file deletion is the caller's half)
      def withRetry[T](body: => T): T = {
        var attempt = 0
        var out: Option[T] = None
        while (out.isEmpty) {
          try out = Some(body)
          catch {
            case e @ (_: org.apache.spark.SparkException |
                      _: org.apache.spark.sql.AnalysisException |
                      _: java.io.FileNotFoundException) =>
              if (attempt >= 5) throw e
              attempt += 1; Thread.sleep(20L * attempt)
          }
        }
        out.get
      }
      var lastCount = 0L
      try while (!stop.get()) {
        val c = withRetry(l.readOrEmpty(monitorSession).count())
        assert(c >= lastCount, s"torn read: ledger shrank $lastCount -> $c")
        lastCount = c
        withRetry(l.fileCount(monitorSession))
        monitorReads.incrementAndGet()
      } catch { case t: Throwable => monitorError.set(t) }
    }, "ledger-race-monitor")
    monitor.start()
    val cycles = 15
    (0 until cycles).foreach { i =>
      l.append(Seq(2L * i, 2L * i + 1).toDF("fingerprint"))
      l.maybeCompact(spark)
    }
    stop.set(true)
    monitor.join(30000)
    assert(monitorError.get() === null,
      s"monitor failed mid-compaction: ${monitorError.get()}")
    assert(monitorReads.get() > 0, "monitor never completed a read")
    assert(l.readOrEmpty(spark).as[Long].collect().toSet ===
      (0 until 2 * cycles).map(_.toLong).toSet)
    dropLedger("bl_race")
  }

  // --- retention: bounded-window dedup semantics

  test("retention: expired rows re-admit immediately and are removed by compaction") {
    val l = BucketedLedger("bl_retain", buckets = 2,
      keys = Seq("fingerprint"),
      schemaDdl = "fingerprint BIGINT, seen_at TIMESTAMP",
      compactAfterFiles = 2,
      retention = Some("seen_at >= timestamp'2026-01-01 00:00:00'"))
    dropLedger("bl_retain")
    val rows = Seq(
      (1L, Timestamp.valueOf("2025-06-01 00:00:00")), // expired
      (2L, Timestamp.valueOf("2026-06-01 00:00:00"))  // inside the window
    ).toDF("fingerprint", "seen_at")
    l.append(rows)

    // eager half: the per-batch join view excludes the expired row, so
    // fingerprint 1 re-admits while fingerprint 2 still drops
    val batch = Seq(1L, 2L, 3L).toDF("fingerprint")
    val fresh = batch.join(l.readOrEmpty(spark).select("fingerprint"),
      Seq("fingerprint"), "left_anti")
    assert(fresh.as[Long].collect().toSet === Set(1L, 3L))

    // physical half: the compaction rewrite drops the expired row from disk
    l.append(Seq((4L, Timestamp.valueOf("2026-07-01 00:00:00")),
      (5L, Timestamp.valueOf("2026-07-02 00:00:00"))).toDF("fingerprint", "seen_at"))
    assert(l.maybeCompact(spark), "appends should have tripped compaction")
    assert(spark.table("bl_retain").select("fingerprint").as[Long].collect().toSet
      === Set(2L, 4L, 5L), "compaction must physically remove expired rows")
    assert(l.fileCount(spark) <= 2)
  }

  test("retention: a compaction that expires EVERY row reads as empty, not mid-swap, and keeps working") {
    // the retention_compaction soak's boundary case: a fully-expired
    // ledger rewrites to ZERO data files — before the EmptyMarker, the
    // reader misread that stable empty listing as a torn swap and threw
    val l = BucketedLedger("bl_retain_empty", buckets = 2,
      keys = Seq("fingerprint"),
      schemaDdl = "fingerprint BIGINT, seen_at TIMESTAMP",
      compactAfterFiles = 2,
      retention = Some("seen_at >= timestamp'2026-01-01 00:00:00'"))
    dropLedger("bl_retain_empty")
    l.append(Seq(
      (1L, Timestamp.valueOf("2025-06-01 00:00:00")),
      (2L, Timestamp.valueOf("2025-06-02 00:00:00"))).toDF("fingerprint", "seen_at"))
    l.append(Seq(
      (3L, Timestamp.valueOf("2025-06-03 00:00:00"))).toDF("fingerprint", "seen_at"))
    assert(l.maybeCompact(spark), "appends should have tripped compaction")
    assert(l.fileCount(spark) === 0, "every row expired — zero data files")
    // the marked empty state must read as an EMPTY ledger (no throw, no
    // rows), so every historical fingerprint correctly re-admits
    assert(l.readOrEmpty(spark).count() === 0L)
    // and the ledger stays fully functional: append after the empty swap
    l.append(Seq(
      (4L, Timestamp.valueOf("2026-06-01 00:00:00"))).toDF("fingerprint", "seen_at"))
    assert(l.readOrEmpty(spark).select("fingerprint").as[Long].collect().toSet
      === Set(4L))
  }

  test("retention filter keeps the ledger-side join one-sided and bucketed") {
    val l = BucketedLedger("bl_retain_plan", buckets = 4,
      keys = Seq("fingerprint"),
      schemaDdl = "fingerprint BIGINT, seen_at TIMESTAMP",
      retention = Some("seen_at >= timestamp'2026-01-01 00:00:00'"))
    dropLedger("bl_retain_plan")
    l.append((1L to 100L).map(i =>
      (i, Timestamp.valueOf("2026-06-01 00:00:00"))).toDF("fingerprint", "seen_at"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val fresh = (90L to 110L).toDF("fingerprint")
        .join(l.readOrEmpty(spark).select("fingerprint"), Seq("fingerprint"), "left_anti")
      val plan = formatted(fresh)
      assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length === 1,
        s"retention filter must not cost the one-sided plan:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(fresh.as[Long].collect().toSet === (101L to 110L).toSet)
    }
  }
}
