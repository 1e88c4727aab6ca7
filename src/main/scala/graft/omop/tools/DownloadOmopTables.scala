package graft.omop.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.functions.{col, lit}

import graft.omop.OmopSchema

/**
 * JDBC ingest of OMOP tables + seeded patient train/test split.
 *
 * Reference: /root/reference/src/cehrbert_data/tools/download_omop_tables.py:29-139
 * (SURVEY §2.1 S5/S6/S10).
 *
 * Scale: keyed tables read with `numPartitions` range partitions on the
 * table's id column, bounds probed via a 1-row MAX() query — the JDBC source
 * then issues parallel range-bounded queries; non-keyed tables stream on one
 * connection. (No database ships in this container, so this surface is
 * exercised only by its unit-level bound logic; the options match the
 * public JDBC source contract.)
 */
object DownloadOmopTables {

  /** Tables whose primary id column supports range partitioning. */
  val PartitionedTables: Map[String, String] = Map(
    OmopSchema.ConditionOccurrence -> "condition_occurrence_id",
    OmopSchema.ProcedureOccurrence -> "procedure_occurrence_id",
    OmopSchema.DrugExposure -> "drug_exposure_id",
    OmopSchema.Measurement -> "measurement_id",
    OmopSchema.Observation -> "observation_id",
    OmopSchema.DeviceExposure -> "device_exposure_id",
    OmopSchema.VisitOccurrence -> "visit_occurrence_id",
    OmopSchema.Person -> "person_id")

  final case class JdbcConfig(url: String, user: String, password: String,
                              driver: String = "com.microsoft.sqlserver.jdbc.SQLServerDriver",
                              numPartitions: Int = 16)

  private def reader(spark: SparkSession, cfg: JdbcConfig) =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)

  /** S5: range-partitioned scan; upper bound probed with SELECT MAX(id). */
  def downloadPartitioned(spark: SparkSession, cfg: JdbcConfig, table: String,
                          idColumn: String): DataFrame = {
    // positional read: identifier case-folding is dialect-specific (Derby
    // and Oracle upper-case unquoted aliases; Postgres lower-cases them)
    val maxId = reader(spark, cfg)
      .option("query", s"SELECT MAX($idColumn) AS max_id FROM $table")
      .load().collect()(0).getAs[Number](0).longValue()
    reader(spark, cfg)
      .option("dbtable", table)
      .option("partitionColumn", idColumn)
      .option("lowerBound", "1")
      .option("upperBound", maxId.toString)
      .option("numPartitions", cfg.numPartitions.toString)
      .load()
  }

  /** S6: plain single-connection scan for non-keyed tables. */
  def downloadPlain(spark: SparkSession, cfg: JdbcConfig, table: String): DataFrame =
    reader(spark, cfg).option("dbtable", table).load()

  def download(spark: SparkSession, cfg: JdbcConfig, table: String): DataFrame =
    PartitionedTables.get(table) match {
      case Some(id) => downloadPartitioned(spark, cfg, table, id)
      case None => downloadPlain(spark, cfg, table)
    }

  def run(spark: SparkSession, cfg: JdbcConfig, outputFolder: String,
          tables: Seq[String] = OmopSchema.CdmTables): Unit = {
    tables.foreach { t =>
      download(spark, cfg, t).write.mode("overwrite").parquet(s"$outputFolder/$t")
    }
    writePatientSplits(spark.read.parquet(s"$outputFolder/${OmopSchema.Person}"), outputFolder)
  }

  /** S10: 80/20 person split, seed 42, tagged `split` column
    * (download_omop_tables.py:131-139). */
  def patientSplits(person: DataFrame): DataFrame = {
    val Array(train, test) = person.select("person_id").randomSplit(Array(0.8, 0.2), 42)
    train.withColumn("split", lit("train"))
      .unionByName(test.withColumn("split", lit("test")))
  }

  def writePatientSplits(person: DataFrame, outputFolder: String): Unit =
    patientSplits(person).write.mode("overwrite").parquet(s"$outputFolder/patient_splits")
}
