package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table helpers: the co-located-join primitive for repeated joins
 * on the same key at 100 TB.
 *
 * A fact table bucketed on its join key is pre-shuffled ON DISK: every join
 * (or aggregation) keyed on the bucket columns against another table with
 * the same bucketing reads matching buckets 1:1 and skips the exchange
 * entirely — the dominant cost of iterative cohort/feature pipelines that
 * join person-keyed tables dozens of times. The reference re-shuffles
 * per-join; persisting the partitioning is strictly better whenever a table
 * is joined more than once.
 */
object Bucketing {

  /**
   * Write `df` as a bucketed (optionally bucket-sorted) parquet table
   * registered in the session catalog. `buckets` should be sized so one
   * bucket ≈ one comfortable task (≲ 1 GiB input) at the table's full scale.
   */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
                    keys: Seq[String], sortKeys: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val base = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val sorted =
      if (sortKeys.nonEmpty) base.sortBy(sortKeys.head, sortKeys.tail: _*) else base
    sorted.saveAsTable(name)
  }

  /** Catalog read-back; bucketing metadata rides along automatically. */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
