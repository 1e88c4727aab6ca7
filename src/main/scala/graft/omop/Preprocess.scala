package graft.omop

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables

/**
 * Table-level normalization: lowercase columns, convention-cast date/datetime
 * columns, CDM 5.2→5.3 rename, optional vocabulary rollups.
 *
 * Reference: /root/reference/src/cehrbert_data/utils/spark_utils.py:240-296.
 */
object Preprocess {

  /** Lowercase + date/datetime casts (spark_utils.py:252-260). */
  def normalize(df: DataFrame): DataFrame = Tables.normalize(df)

  /** Full `preprocess_domain_table` semantics: concept tables pass through
    * untouched; visit_occurrence gets the CDM 5.2→5.3 rename; drug/condition/
    * procedure tables get optional rollups when vocabulary tables exist. */
  def domainTable(spark: SparkSession, inputFolder: String, name: String,
                  withDiagnosisRollup: Boolean = false,
                  withDrugRollup: Boolean = true): DataFrame = {
    val raw = spark.read.parquet(s"$inputFolder/$name")
    if (name.toLowerCase.contains("concept")) return raw

    var df = Tables.normalize(raw,
      renames =
        if (name == OmopSchema.VisitOccurrence)
          Map("discharge_to_concept_id" -> "discharged_to_concept_id")
        else Map.empty)

    def exists(t: String): Boolean = new java.io.File(s"$inputFolder/$t").exists()

    if (withDrugRollup && name == OmopSchema.DrugExposure &&
        exists(OmopSchema.Concept) && exists(OmopSchema.ConceptAncestor)) {
      df = Vocab.rollUpToDrugIngredients(df,
        spark.read.parquet(s"$inputFolder/${OmopSchema.Concept}"),
        spark.read.parquet(s"$inputFolder/${OmopSchema.ConceptAncestor}"))
    }
    if (withDiagnosisRollup) {
      if (name == OmopSchema.ConditionOccurrence &&
          exists(OmopSchema.Concept) && exists(OmopSchema.ConceptRelationship)) {
        df = Vocab.rollUpDiagnosis(df,
          spark.read.parquet(s"$inputFolder/${OmopSchema.Concept}"),
          spark.read.parquet(s"$inputFolder/${OmopSchema.ConceptRelationship}"))
      }
      if (name == OmopSchema.ProcedureOccurrence &&
          exists(OmopSchema.Concept) && exists(OmopSchema.ConceptAncestor)) {
        df = Vocab.rollUpProcedure(df,
          spark.read.parquet(s"$inputFolder/${OmopSchema.Concept}"),
          spark.read.parquet(s"$inputFolder/${OmopSchema.ConceptAncestor}"))
      }
    }
    df
  }
}
