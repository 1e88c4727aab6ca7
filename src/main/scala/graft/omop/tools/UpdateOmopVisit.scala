package graft.omop.tools

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Rewrite every domain table's `visit_occurrence_id` through the
 * `visit_mapping` produced by [[ConnectOmopVisits]] — the consumer half of
 * the visit-consolidation workflow: consolidation merges visits and emits
 * (visit_occurrence_id → master_visit_occurrence_id); this tool repoints all
 * domain events at the surviving master visits and copies the vocabulary
 * tables through so the output folder is a complete, self-contained CDM.
 *
 * Reference: tools/update_omop_visit.py:1-60 (semantics; note the reference
 * script builds the remapped frame but then writes the ORIGINAL `omop_table`
 * variable — this port writes the remapped rows, i.e. the tool's documented
 * intent). Table lists from tools/ehrshot_to_omop.py:17,71-79.
 *
 * Scale: the mapping holds one row per MERGED visit — a small fraction of
 * visit_occurrence and orders of magnitude smaller than measurement — so the
 * join is an equi-join on visit_occurrence_id that AQE turns into a
 * broadcast join in the common case; nothing about the rewrite is ever
 * wider than one shuffle of the domain table, and unmapped rows (the vast
 * majority) pass through the left join unchanged.
 */
object UpdateOmopVisit {

  /** table_mapping keys minus visit_occurrence (already rewritten by
    * ConnectOmopVisits) and death (has no visit_occurrence_id). */
  val DomainTables: Seq[String] = Seq("condition_occurrence",
    "procedure_occurrence", "drug_exposure", "measurement", "observation")

  /** VOCABULARY_TABLES + person: copied byte-for-byte, never rewritten. */
  val PassThroughTables: Seq[String] =
    Seq("concept", "concept_relationship", "concept_ancestor", "person")

  /** `coalesce(master_visit_occurrence_id, visit_occurrence_id)` over a left
    * join on the mapping; output column order mirrors the reference
    * (visit_occurrence_id first, remaining columns in input order). */
  def rewriteVisitIds(domain: DataFrame, visitMapping: DataFrame): DataFrame = {
    val m = visitMapping.select(
      col("visit_occurrence_id").as("__vid"),
      col("master_visit_occurrence_id").as("__master"))
    domain.join(m, domain("visit_occurrence_id") === col("__vid"), "left_outer")
      .select(
        coalesce(col("__master"), domain("visit_occurrence_id")).as("visit_occurrence_id") +:
          domain.columns.filterNot(_ == "visit_occurrence_id")
            .map(c => domain(c).as(c)).toSeq: _*)
  }

  /**
   * Full tool run: reads `outputFolder/visit_mapping`, rewrites every present
   * domain table from `inputFolder` into `outputFolder`, then copies
   * vocabulary tables (and person) from `vocabularyFolder` for any not
   * already present in the output.
   */
  def run(spark: SparkSession, inputFolder: String, outputFolder: String,
          vocabularyFolder: Option[String] = None): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val path = new Path(p)
      path.getFileSystem(hconf).exists(path)
    }
    val mapping = spark.read.parquet(s"$outputFolder/visit_mapping")
    DomainTables.filter(t => exists(s"$inputFolder/$t")).foreach { t =>
      val domain = spark.read.parquet(s"$inputFolder/$t")
      rewriteVisitIds(domain, mapping)
        .write.mode("overwrite").parquet(s"$outputFolder/$t")
    }
    vocabularyFolder.foreach { vocab =>
      PassThroughTables.foreach { t =>
        val src = new Path(s"$vocab/$t")
        val dst = new Path(s"$outputFolder/$t")
        val fs = src.getFileSystem(hconf)
        if (fs.exists(src) && !fs.exists(dst))
          FileUtil.copy(fs, src, dst.getFileSystem(hconf), dst,
            /* deleteSource = */ false, hconf)
      }
    }
  }
}
