package graft.omop.cohort.definitions

import graft.omop.cohort.{QueryBuilder, QuerySpec}

/**
 * Heart-failure 30-day readmission prediction task: target = HF inpatient
 * hospitalizations discharged alive (index at discharge), outcome = any
 * subsequent hospitalization (index at admission).
 *
 * Reference: /root/reference/src/cehrbert_data/prediction_cohorts/
 * hf_readmission.py:12-45 — concept sets and predicates preserved:
 * HF = descendants of 316139 via concept_ancestor; inpatient visit types
 * {9201, 262, 8971, 8920}; discharges excluding death/hospice/transfer
 * {4216643, 44814650, 8717, 8970, 8971}.
 */
object HfReadmission {

  val HfHospitalizationCohortName = "hf_hospitalization"
  val HospitalizationCohortName = "hospitalization"

  val DependencyList: Seq[String] = Seq("person", "condition_occurrence", "visit_occurrence")
  val DomainTableList: Seq[String] = Seq("condition_occurrence", "drug_exposure", "procedure_occurrence")

  private val hfHospitalizationSql =
    """WITH hf_concepts AS (
      |  SELECT DISTINCT descendant_concept_id AS concept_id
      |  FROM global_temp.concept_ancestor AS ca
      |  WHERE ca.ancestor_concept_id = 316139
      |)
      |SELECT DISTINCT
      |  v.person_id,
      |  v.visit_occurrence_id,
      |  COALESCE(v.visit_end_datetime, v.visit_end_date) AS index_date
      |FROM global_temp.visit_occurrence AS v
      |JOIN global_temp.condition_occurrence AS co
      |  ON v.visit_occurrence_id = co.visit_occurrence_id
      |JOIN hf_concepts AS hf
      |  ON co.condition_concept_id = hf.concept_id
      |WHERE v.visit_concept_id IN (9201, 262, 8971, 8920)
      |  AND v.discharged_to_concept_id NOT IN (4216643, 44814650, 8717, 8970, 8971)
      |  AND v.visit_start_date <= co.condition_start_date
      |  AND v.visit_end_date >= '{date_lower_bound}'
      |""".stripMargin

  private val hospitalizationSql =
    """SELECT DISTINCT
      |  v.person_id,
      |  v.visit_occurrence_id,
      |  COALESCE(v.visit_start_datetime, v.visit_start_date) AS index_date
      |FROM global_temp.visit_occurrence AS v
      |WHERE v.visit_concept_id IN (9201, 262, 8971, 8920)
      |""".stripMargin

  def target(dateLowerBound: String): QueryBuilder = QueryBuilder(
    cohortName = HfHospitalizationCohortName,
    dependencyList = DependencyList,
    query = QuerySpec(hfHospitalizationSql,
      Map("date_lower_bound" -> dateLowerBound), HfHospitalizationCohortName))

  def outcome: QueryBuilder = QueryBuilder(
    cohortName = HospitalizationCohortName,
    dependencyList = DependencyList,
    query = QuerySpec(hospitalizationSql, Map.empty, HospitalizationCohortName))
}
