package graft.omop

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{col, lit, when}

import graft.core.Checkpoints

/**
 * Vocabulary hierarchy operations: iterative concept ancestry closure, drug →
 * RxNorm-ingredient rollup, ICD 3-digit diagnosis rollup, and the four-way
 * procedure rollup (CPT4 hierarchy / ICD prefix / ICD10PCS 3-char / HCPCS
 * identity).
 *
 * Reference: /root/reference/src/cehrbert_data/utils/vocab_utils.py:4-361.
 * The reference's `extract_parent_code` Python UDF (code.split(".")[0],
 * :199-202) is a native split() here.
 *
 * Scale: every rollup is (distinct concept ids) ⨝ vocabulary — both sides are
 * vocabulary-sized (≪ events), so these build broadcast-able mapping tables
 * applied to the fact table with a single left join. The ancestry closure is
 * a driver-side fixpoint loop with a lineage cut per iteration (Spark has no
 * recursive CTE); vocabulary DAGs are ~20 levels deep at most.
 */
object Vocab {

  /** Iterative `Subsumes` transitive closure seeded from `conceptIds`
    * (vocab_utils.py:4-64). Returns (ancestor_concept_id,
    * descendant_concept_id, distance) with the reference's frontier rule:
    * a concept already present as a descendant is never re-expanded. */
  def buildAncestryTableFor(conceptRelationship: DataFrame,
                            conceptIds: Seq[Long]): DataFrame = {
    val subsumes = conceptRelationship
      .where(col("relationship_id") === "Subsumes")
      .select(col("concept_id_1"), col("concept_id_2"))

    var ancestry = Checkpoints.cut(
      subsumes.where(col("concept_id_1").isin(conceptIds: _*))
        .select(col("concept_id_1").as("ancestor_concept_id"),
          col("concept_id_2").as("descendant_concept_id"),
          lit(1).as("distance")))

    def frontier(acc: DataFrame): DataFrame = {
      val next = acc.join(subsumes, acc("descendant_concept_id") === subsumes("concept_id_1"))
        .select(acc("ancestor_concept_id"),
          subsumes("concept_id_2").as("descendant_concept_id"),
          (acc("distance") + 1).as("distance"))
      next.join(acc.select(col("descendant_concept_id").as("__seen")).distinct(),
          next("descendant_concept_id") === col("__seen"), "left_anti")
    }

    var candidates = Checkpoints.cut(frontier(ancestry))
    while (candidates.limit(1).count() != 0) {
      ancestry = Checkpoints.cut(ancestry.union(candidates).distinct())
      candidates = Checkpoints.cut(frontier(ancestry))
    }
    ancestry
  }

  /** All descendants of the given ancestors via concept_ancestor
    * (vocab_utils.py:67-89). */
  def getDescendantConcepts(conceptAncestor: DataFrame, concept: DataFrame,
                            conceptIds: Seq[Long]): DataFrame =
    conceptAncestor
      .where(col("ancestor_concept_id").isin(conceptIds: _*))
      .join(concept, col("descendant_concept_id") === col("concept_id"))
      .select(concept.columns.map(concept(_)): _*)
      .distinct()

  /** Drug → RxNorm Ingredient (vocab_utils.py:92-114). */
  def rollUpToDrugIngredients(drugExposure: DataFrame, concept: DataFrame,
                              conceptAncestor: DataFrame): DataFrame = {
    val de = graft.core.Tables.lowercaseColumns(drugExposure)
    val drugIngredient = de.select("drug_concept_id").distinct()
      .join(conceptAncestor, col("drug_concept_id") === col("descendant_concept_id"))
      .join(concept, col("ancestor_concept_id") === col("concept_id"))
      .where(concept("concept_class_id") === "Ingredient")
      .select(col("drug_concept_id"), col("concept_id").as("ingredient_concept_id"))

    val fields =
      F.coalesce(col("ingredient_concept_id"), col("drug_concept_id")).as("drug_concept_id") +:
        de.schema.fieldNames.filter(_ != "drug_concept_id").map(col).toSeq
    de.join(F.broadcast(drugIngredient), Seq("drug_concept_id"), "left_outer")
      .select(fields: _*)
  }

  private val ThreeDigitCodeClasses = Seq(
    "3-char nonbill code", "3-dig nonbill code", "3-char billing code",
    "3-dig billing code", "3-dig billing E code", "3-dig billing V code",
    "3-dig nonbill E code", "3-dig nonbill V code")

  /** Condition source → 3-digit ICD parent (vocab_utils.py:117-195). */
  def rollUpDiagnosis(conditionOccurrence: DataFrame, concept: DataFrame,
                      conceptRelationship: DataFrame): DataFrame = {
    val co = graft.core.Tables.lowercaseColumns(conditionOccurrence)

    val conditionIcd = co.select("condition_source_concept_id").distinct()
      .join(concept, col("condition_source_concept_id") === col("concept_id"))
      .where(concept("domain_id") === "Condition")
      .where(concept("vocabulary_id") =!= "SNOMED")
      .select(col("condition_source_concept_id"),
        col("vocabulary_id").as("child_vocabulary_id"),
        col("concept_class_id").as("child_concept_class_id"))

    val hierarchy = conditionIcd
      .join(conceptRelationship, col("condition_source_concept_id") === col("concept_id_1"))
      .join(concept,
        col("concept_id_2") === col("concept_id") &&
          col("concept_class_id").isin(ThreeDigitCodeClasses: _*),
        "left")
      .select(col("condition_source_concept_id").as("source_concept_id"),
        col("child_concept_class_id"),
        col("concept_id").as("parent_concept_id"),
        col("concept_name").as("parent_concept_name"),
        col("vocabulary_id").as("parent_vocabulary_id"),
        col("concept_class_id").as("parent_concept_class_id"))
      .distinct()
      .withColumn("ancestor_concept_id",
        when(col("child_concept_class_id").isin(ThreeDigitCodeClasses: _*),
          col("source_concept_id")).otherwise(col("parent_concept_id")))
      .where(col("ancestor_concept_id").isNotNull)

    val fields =
      co.schema.fieldNames.filter(_ != "condition_source_concept_id").map(col).toSeq :+
        F.coalesce(col("ancestor_concept_id"), col("condition_source_concept_id"))
          .as("condition_source_concept_id")
    co.join(F.broadcast(hierarchy),
        co("condition_source_concept_id") === hierarchy("source_concept_id"), "left")
      .select(fields: _*)
      .withColumn("condition_concept_id", col("condition_source_concept_id"))
  }

  /** Procedure rollup: CPT4 hierarchy + ICD prefix + ICD10PCS 3-char + HCPCS
    * identity, unioned (vocab_utils.py:198-361). */
  def rollUpProcedure(procedureOccurrence: DataFrame, concept: DataFrame,
                      conceptAncestor: DataFrame): DataFrame = {
    val po = graft.core.Tables.lowercaseColumns(procedureOccurrence)

    val procedureCode = po.select("procedure_source_concept_id").distinct()
      .join(concept, col("procedure_source_concept_id") === col("concept_id"))
      .where(concept("domain_id") === "Procedure")
      .select(col("procedure_source_concept_id").as("source_concept_id"),
        col("vocabulary_id").as("child_vocabulary_id"),
        col("concept_class_id").as("child_concept_class_id"),
        col("concept_code").as("child_concept_code"))

    // -- CPT4 via concept_ancestor hierarchy
    val cptCode = procedureCode.where(col("child_vocabulary_id") === "CPT4")
    val cptHierarchy = cptCode
      .join(conceptAncestor, cptCode("source_concept_id") === conceptAncestor("descendant_concept_id"))
      .join(concept, conceptAncestor("ancestor_concept_id") === concept("concept_id"))
      .where(concept("vocabulary_id") === "CPT4")
      .select(col("source_concept_id"), col("child_concept_class_id"),
        col("ancestor_concept_id").as("parent_concept_id"),
        col("min_levels_of_separation"),
        col("concept_class_id").as("parent_concept_class_id"))

    val level1Base = cptHierarchy
      .where(col("min_levels_of_separation") === 1)
      .where(col("child_concept_class_id") === "CPT4")
      .where(col("parent_concept_class_id") === "CPT4 Hierarchy")
      .select("source_concept_id", "parent_concept_id")
    val level1 = level1Base
      .join(conceptAncestor,
        level1Base("source_concept_id") === conceptAncestor("descendant_concept_id") &&
          conceptAncestor("min_levels_of_separation") === 1,
        "left")
      .select(col("source_concept_id"), col("parent_concept_id"),
        col("ancestor_concept_id").as("root_concept_id"))
      .withColumn("isroot",
        when(col("root_concept_id") === 45889197, col("source_concept_id"))
          .otherwise(col("parent_concept_id")))
      .select(col("source_concept_id"), col("isroot").as("ancestor_concept_id"))

    val level0Ids = cptHierarchy.groupBy("source_concept_id")
      .agg(F.max("min_levels_of_separation").as("max_levels"))
      .where(col("max_levels") === 0)
      .select(col("source_concept_id").as("cpt_level_0_concept_id"))
    val level0 = cptHierarchy
      .join(level0Ids, cptHierarchy("source_concept_id") === level0Ids("cpt_level_0_concept_id"))
      .select(col("source_concept_id"), col("parent_concept_id").as("ancestor_concept_id"))

    val cptRollup = level1.union(level0).dropDuplicates()

    // -- ICD9/ICD10 prefix before "." (native split, no UDF)
    def prefixMap(codes: DataFrame, parentCode: org.apache.spark.sql.Column): DataFrame =
      codes.withColumn("parent_concept_code", parentCode)
        .join(concept,
          col("parent_concept_code") === concept("concept_code") &&
            col("child_vocabulary_id") === concept("vocabulary_id"),
          "left")
        .select(col("source_concept_id"), col("concept_id").as("ancestor_concept_id"))
        .distinct()

    val icdMap = prefixMap(
      procedureCode.where(col("child_vocabulary_id").isin("ICD9CM", "ICD9Proc", "ICD10CM")),
      F.split(col("child_concept_code"), "\\.").getItem(0))

    val icd10pcsMap = prefixMap(
      procedureCode.where(col("child_vocabulary_id") === "ICD10PCS"),
      F.substring(col("child_concept_code"), 1, 3))

    val hcpcsMap = procedureCode.where(col("child_vocabulary_id") === "HCPCS")
      .withColumn("ancestor_concept_id", col("source_concept_id"))
      .select("source_concept_id", "ancestor_concept_id")
      .distinct()

    val hierarchy = cptRollup.union(icdMap).union(icd10pcsMap).union(hcpcsMap).distinct()

    val fields =
      po.schema.fieldNames.filter(_ != "procedure_source_concept_id").map(col).toSeq :+
        F.coalesce(col("ancestor_concept_id"), col("procedure_source_concept_id"))
          .as("procedure_source_concept_id")
    po.join(F.broadcast(hierarchy),
        po("procedure_source_concept_id") === hierarchy("source_concept_id"), "left")
      .select(fields: _*)
      .withColumn("procedure_concept_id", col("procedure_source_concept_id"))
  }
}
