package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.StructType

/**
 * Bucketed, self-compacting parquet LEDGER for the foreachBatch dedup sinks
 * — the persistent "seen" state that must be consulted by every micro-batch
 * for the whole life of the stream.
 *
 * WHY bucketed (the 100 TB argument): the sinks' cross-batch check is an
 * anti-/band-join of the (small) micro-batch against the (ever-growing)
 * ledger. A plain parquet ledger re-SHUFFLES the entire stream history into
 * that join every batch — O(history) per batch, unbounded. Stored as a
 * catalog bucketed table on the join key ([[graft.core.Bucketing]]
 * semantics), the ledger side is pre-partitioned ON DISK: the join reads
 * matching buckets in place and only the micro-batch side moves — per-batch
 * cost O(batch + ledger-scan), with no history shuffle. (At small ledger
 * sizes Spark may broadcast the ledger instead — also shuffle-free; the
 * bucketing is what keeps the plan one-sided once the ledger dwarfs the
 * broadcast threshold.)
 *
 * WHY self-compacting: one append per micro-batch is a small-files
 * explosion over a long-lived stream (files ∝ batches × buckets). Appends
 * are pre-partitioned to one file per bucket, and once the file count
 * exceeds `compactAfterFiles` the table is rewritten to exactly `buckets`
 * files. The rewrite swap is NON-destructive (rename main aside → rename
 * compacted temp in → drop the set-aside copy), so at every instant at
 * least one complete copy of the ledger exists under some name; a crash at
 * any point is healed by [[recover]], which every entry point runs first.
 * Compaction cost is one ledger rewrite amortized over
 * `compactAfterFiles / buckets` batches, and it rewrites key-plus-signature
 * rows — never document bodies.
 *
 * RETENTION (optional): `retention` is a SQL boolean expression over the
 * ledger columns selecting the rows to KEEP (e.g.
 * `"seen_at > now() - interval 30 days"` against a `seen_at` column the
 * caller appends). Expired rows stop suppressing duplicates immediately —
 * [[readOrEmpty]] filters them out of every per-batch join (a pushed-down
 * parquet filter; the bucketed scan's partitioning survives a Filter, so
 * the join stays one-sided) — and are physically removed at the next
 * compaction rewrite. This gives bounded-window dedup semantics: a
 * fingerprint older than the window re-admits, one inside it still drops.
 *
 * Delivery note: append-then-compact inside foreachBatch keeps the sinks'
 * at-least-once story — a crash between append and compaction leaves a
 * valid (merely uncompacted) ledger.
 */
final case class BucketedLedger(table: String, buckets: Int,
                                keys: Seq[String], schemaDdl: String,
                                compactAfterFiles: Int = 64,
                                retention: Option[String] = None) {
  require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
    s"ledger table must be a plain SQL identifier: $table")
  require(keys.nonEmpty, "ledger needs at least one bucket key")
  require(buckets > 0 && compactAfterFiles >= buckets,
    s"compactAfterFiles ($compactAfterFiles) must be >= buckets ($buckets) " +
      "or every append would trigger a rewrite")

  def schema: StructType = StructType.fromDDL(schemaDdl)

  private val tmpT = table + "__compacting"
  private val oldT = table + "__old"

  /** The ledger as a DataFrame — a bucketed catalog scan when the table
    * exists (its HashPartitioning rides into joins), else an empty frame
    * with the ledger schema (first micro-batch). With `retention` set,
    * expired rows are filtered out here so they never suppress a duplicate
    * past the window, even before compaction physically removes them. */
  def readOrEmpty(spark: SparkSession): DataFrame = {
    recover(spark)
    if (spark.catalog.tableExists(table)) {
      // the sinks append/compact through the streaming query's CLONED
      // session; this session's relation cache can therefore point at
      // files a compaction has since deleted. Refresh costs one file
      // listing (≤ compactAfterFiles + buckets files by construction) and
      // makes the scan correct from ANY session.
      spark.catalog.refreshTable(table)
      val t = spark.table(table)
      retention.fold(t)(r => t.filter(expr(r)))
    }
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  /**
   * Heal a half-completed compaction swap. The swap sequence is
   * write `__compacting` → rename main to `__old` → rename `__compacting`
   * to main → drop `__old`; a crash leaves exactly one of these states:
   *
   *  - main present, stale `__compacting` (crash before the first rename):
   *    main is authoritative; the stale temp is dropped by the next
   *    compaction's own cleanup — nothing to do here.
   *  - main MISSING, `__compacting` present (crash between the renames):
   *    the temp holds the complete compacted ledger (no append can
   *    interleave — the sink's batches are sequential), so finish the swap
   *    by renaming it in, then drop any `__old` leftover.
   *  - main MISSING, only `__old` present: restore the set-aside copy.
   *  - main present, `__old` dangling (crash before the final drop): the
   *    swap completed; drop the leftover.
   *
   * Every public entry point calls this first, so a restarted stream (or
   * any reader) never observes the "no table → empty ledger → every
   * historical duplicate re-admits" failure the destructive swap had.
   * Cost when healthy: two catalog existence probes.
   */
  def recover(spark: SparkSession): Unit = {
    val cat = spark.catalog
    if (!cat.tableExists(table)) {
      if (cat.tableExists(tmpT)) {
        spark.sql(s"ALTER TABLE $tmpT RENAME TO $table")
        graft.core.Decisions.record(s"ledger.recover($table, from=$tmpT)", true)
      } else if (cat.tableExists(oldT)) {
        spark.sql(s"ALTER TABLE $oldT RENAME TO $table")
        graft.core.Decisions.record(s"ledger.recover($table, from=$oldT)", true)
      }
    }
    if (cat.tableExists(table) && cat.tableExists(oldT))
      spark.sql(s"DROP TABLE $oldT")
  }

  /** The writes below pin their file count with an explicit
    * `repartition(buckets, keys)` — AQE would re-plan that exchange (the
    * planned-write shuffle coalesces under
    * `coalescePartitions`, measured: a 2-bucket rewrite produced 4-6 files
    * tracking the INPUT file count), so it is scoped off for the write
    * action. Session-scoped conf: concurrent queries on the same session
    * briefly plan without AQE — acceptable for the tiny ledger writes. */
  private def withAqeOff[T](spark: SparkSession)(body: => T): T = {
    val conf = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try body finally spark.conf.set(conf, prev)
  }

  /** Reusing an existing catalog table with the WRONG bucket layout would
    * silently break the one-sided join (Spark re-shuffles a ledger whose
    * bucket keys don't equal the join keys) — fail loudly instead. Checked
    * once per ledger instance, on the first append that finds the table. */
  @volatile private var bucketSpecChecked = false
  private def requireBucketSpec(spark: SparkSession): Unit =
    if (!bucketSpecChecked && spark.catalog.tableExists(table)) {
      val spec = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(table)).bucketSpec
      val ok = spec.exists(s =>
        s.numBuckets == buckets &&
          s.bucketColumnNames.map(_.toLowerCase) == keys.map(_.toLowerCase))
      require(ok,
        s"existing table $table has bucket spec ${spec.orNull}, but this " +
          s"ledger needs bucketBy($buckets, ${keys.mkString(", ")}); " +
          "reusing it would re-shuffle the ledger side of every batch join")
      bucketSpecChecked = true
    }

  /** Append `rows` (must match the ledger schema). Pre-partitioned on the
    * bucket keys so each append adds at most `buckets` files — without it a
    * W-task write adds up to W × buckets files, compaction or not. */
  def append(rows: DataFrame): Unit = {
    val spark = rows.sparkSession
    recover(spark)
    requireBucketSpec(spark)
    withAqeOff(spark) {
      rows.repartition(buckets, keys.map(col): _*)
        .write.mode("append").format("parquet")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .saveAsTable(table)
    }
  }

  /** Data-file count straight off the filesystem — NOT
    * `spark.table(...).inputFiles`, which reads through the calling
    * session's relation cache and goes stale when another session appends
    * (measured: the streaming sinks append through the query's CLONED
    * session, so a monitoring caller on the original session saw a
    * frozen count forever). The compaction trigger and any external
    * observer must agree on fragmentation, so both read the live listing. */
  def fileCount(spark: SparkSession): Int =
    if (!spark.catalog.tableExists(table)) 0
    else {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(TableIdentifier(table)).location)
      val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(loc)) 0
      else fs.listStatus(loc).count { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }

  /** Rewrite the ledger to exactly `buckets` files when fragmentation
    * exceeds `compactAfterFiles`. Returns true when a rewrite ran (recorded
    * in [[graft.core.Decisions]] either way).
    *
    * The rewrite reads the RAW parquet files, not the catalog table: a
    * bucketed-write whose source is the same-bucketed table scan elides the
    * exchange entirely and emits one output file PER INPUT FILE (measured —
    * a "compaction" that compacts nothing). The raw read has no bucketing
    * metadata, so the explicit repartition stands and the rewrite lands at
    * `buckets` files. With `retention` set, expired rows are dropped here —
    * the physical half of the bounded-window semantics.
    *
    * The swap is non-destructive — rename main aside, rename the compacted
    * temp in, then drop the set-aside copy — so a complete ledger exists
    * under some name at every instant; [[recover]] (run by every entry
    * point, including this one) heals whichever half-state a crash leaves.
    * The initial `DROP TABLE IF EXISTS $tmpT` only ever removes a STALE
    * temp: recover() has just ensured the main table exists, so the temp is
    * never the only copy when that drop runs. */
  def maybeCompact(spark: SparkSession): Boolean = {
    recover(spark)
    val n = fileCount(spark)
    val go = n > compactAfterFiles
    graft.core.Decisions.record(s"ledger.compact($table, files=$n)", go)
    if (go) {
      spark.sql(s"DROP TABLE IF EXISTS $tmpT")
      val loc = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier(table))
        .location.toString
      withAqeOff(spark) {
        val raw = spark.read.schema(schema).parquet(loc)
        retention.fold(raw)(r => raw.filter(expr(r)))
          .repartition(buckets, keys.map(col): _*)
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, keys.head, keys.tail: _*)
          .saveAsTable(tmpT)
      }
      spark.sql(s"ALTER TABLE $table RENAME TO $oldT")
      spark.sql(s"ALTER TABLE $tmpT RENAME TO $table")
      spark.sql(s"DROP TABLE $oldT")
    }
    go
  }
}
