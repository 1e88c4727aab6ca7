package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
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
 * files (write-to-temp → drop → catalog rename, so a reader never sees a
 * half-written ledger; the rename also preserves the bucket metadata that
 * makes the join one-sided). Compaction cost is one ledger rewrite
 * amortized over `compactAfterFiles / buckets` batches, and rewriting
 * key-plus-signature rows — never document bodies.
 *
 * Delivery note: append-then-compact inside foreachBatch keeps the sinks'
 * at-least-once story — a crash between append and compaction leaves a
 * valid (merely uncompacted) ledger.
 */
final case class BucketedLedger(table: String, buckets: Int,
                                keys: Seq[String], schemaDdl: String,
                                compactAfterFiles: Int = 64) {
  require(table.matches("[A-Za-z_][A-Za-z0-9_]*"),
    s"ledger table must be a plain SQL identifier: $table")
  require(keys.nonEmpty, "ledger needs at least one bucket key")
  require(buckets > 0 && compactAfterFiles >= buckets,
    s"compactAfterFiles ($compactAfterFiles) must be >= buckets ($buckets) " +
      "or every append would trigger a rewrite")

  def schema: StructType = StructType.fromDDL(schemaDdl)

  /** The ledger as a DataFrame — a bucketed catalog scan when the table
    * exists (its HashPartitioning rides into joins), else an empty frame
    * with the ledger schema (first micro-batch). */
  def readOrEmpty(spark: SparkSession): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

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

  /** Append `rows` (must match the ledger schema). Pre-partitioned on the
    * bucket keys so each append adds at most `buckets` files — without it a
    * W-task write adds up to W × buckets files, compaction or not. */
  def append(rows: DataFrame): Unit = {
    val spark = rows.sparkSession
    withAqeOff(spark) {
      rows.repartition(buckets, keys.map(col): _*)
        .write.mode("append").format("parquet")
        .bucketBy(buckets, keys.head, keys.tail: _*)
        .saveAsTable(table)
    }
  }

  def fileCount(spark: SparkSession): Int =
    if (spark.catalog.tableExists(table)) spark.table(table).inputFiles.length
    else 0

  /** Rewrite the ledger to exactly `buckets` files when fragmentation
    * exceeds `compactAfterFiles`. Returns true when a rewrite ran (recorded
    * in [[graft.core.Decisions]] either way).
    *
    * The rewrite reads the RAW parquet files, not the catalog table: a
    * bucketed-write whose source is the same-bucketed table scan elides the
    * exchange entirely and emits one output file PER INPUT FILE (measured —
    * a "compaction" that compacts nothing). The raw read has no bucketing
    * metadata, so the explicit repartition stands and the rewrite lands at
    * `buckets` files. Write-to-temp → drop → catalog rename keeps a valid
    * ledger visible at every step (a crash in between leaves either the
    * fragmented original or a dangling `__compacting` temp that the next
    * compaction overwrites). */
  def maybeCompact(spark: SparkSession): Boolean = {
    val n = fileCount(spark)
    val go = n > compactAfterFiles
    graft.core.Decisions.record(s"ledger.compact($table, files=$n)", go)
    if (go) {
      val tmp = table + "__compacting"
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      val loc = spark.sessionState.catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .location.toString
      withAqeOff(spark) {
        spark.read.schema(schema).parquet(loc)
          .repartition(buckets, keys.map(col): _*)
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, keys.head, keys.tail: _*)
          .saveAsTable(tmp)
      }
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    }
    go
  }
}
