package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Lineage-truncation barriers.
 *
 * The reference materializes intermediate DataFrames to parquet and re-reads
 * them (~20 sites; /root/reference/src/cehrbert_data/decorators/
 * patient_event_decorator_base.py:38-43, utils/spark_utils.py:733-813) both to
 * keep decorator-chain plans shallow and, in places, as a *semantic* barrier so
 * nondeterministically minted ids become stable (ehrshot_to_omop.py:486-494).
 *
 * At scale the parquet round-trip is often the right call (it survives executor
 * loss and truncates lineage across reused branches); `localCheckpoint` is the
 * cheap in-memory variant for iterative drivers ([[graft.operators.TransitiveClosure]]).
 */
object Checkpoints {

  /** Parquet write + reload barrier (reference `try_persist_data` semantics). */
  def persist(df: DataFrame, folder: String, name: String): DataFrame = {
    val p = s"$folder/$name"
    df.write.mode("overwrite").parquet(p)
    df.sparkSession.read.parquet(p)
  }

  /** Optional barrier: identity when no persistence folder is configured. */
  def maybePersist(df: DataFrame, folder: Option[String], name: String): DataFrame =
    folder.map(persist(df, _, name)).getOrElse(df)

  /** In-memory lineage cut for iterative algorithms (eager). */
  def cut(df: DataFrame): DataFrame = df.localCheckpoint(true)
}
