package graft.omop.cohort.definitions

import graft.omop.cohort.{AncestorTableSpec, QueryBuilder, QuerySpec}

/**
 * Incident heart failure with clinical corroboration: entry = first HF
 * diagnosis at/after first visit; inclusion = BNP/NT-proBNP evidence,
 * HF-specific treatment (mechanical support / dialysis / artificial heart),
 * or an HF-visit drug exposure. Patients failing inclusion form the negative
 * cohort (used as questionable-outcome exclusion downstream).
 *
 * Reference: /root/reference/src/cehrbert_data/cohorts/heart_failure.py
 * (concept sets :18-103; queries :105-285; builder :317-423). The diuretics
 * ingredient set is derived through the non-standard ancestry closure +
 * 'Maps to' + concept_ancestor chain, as in the reference.
 */
object HeartFailure {

  val HfConceptTable = "hf_concept"
  val WorsenHfDxTable = "worsen_hf_dx_concepts"
  val PhysicalExamTable = "phy_exam_concepts"
  val BnpTable = "bnp_concepts"
  val NtProBnpTable = "nt_pro_bnp_concepts"
  val DrugTable = "drug_concepts"
  val MechanicalSupportTable = "mechanical_support_concepts"
  val DialysisTable = "dialysis_concepts"
  val ArtificialHeartTable = "artificial_heart_concepts"
  val DiureticsAncestorTable = "diuretics_ancestor_table"
  val DiureticsIngredientTable = "diuretics_concepts"
  val IntermediateCohortName = "intermediate_heart_failure"

  val HeartFailureConcepts: Seq[Long] = Seq(316139L)
  val WorsenHfDiagnosisConcepts: Seq[Long] = Seq(312437L, 4263848L, 46272935L, 4223659L, 315361L)
  val PhysicalExamConcepts: Seq[Long] = Seq(433595L, 200528L, 4117930L, 4329988L, 4289004L, 4285133L)
  val BnpConcepts: Seq[Long] = Seq(4307029L, 3031569L, 3011960L, 3052295L)
  val NtProBnpConcepts: Seq[Long] = Seq(3029187L, 42529224L, 3029435L, 42529225L)
  val DrugConcepts: Seq[Long] = Seq(956874L, 942350L, 987406L, 932745L,
    1309799L, 970250L, 992590L, 907013L, 1942960L)
  val MechanicalSupportConcepts: Seq[Long] = Seq(45888564L, 4052536L, 4337306L,
    2107514L, 45889695L, 2107500L, 45887675L, 43527920L, 2107501L, 45890116L,
    40756954L, 4338594L, 43527923L, 40757060L, 2100812L)
  val DialysisConcepts: Seq[Long] = Seq(4032243L, 45889365L)
  val ArtificialHeartConcepts: Seq[Long] = Seq(4144390L, 4150347L, 4281764L,
    725038L, 725037L, 2100816L, 2100822L, 725039L, 2100828L, 4337306L,
    4140024L, 4146121L, 4060257L, 4309033L, 4222272L, 4243758L, 4241906L,
    4080968L, 4224193L, 4052537L, 4050864L)
  val DiureticConcepts: Seq[Long] = Seq(4186999L)

  private val rollUpDiureticsSql =
    s"""SELECT DISTINCT c.*
       |FROM global_temp.$DiureticsAncestorTable AS a
       |JOIN global_temp.concept_relationship AS cr
       |  ON a.descendant_concept_id = cr.concept_id_1 AND cr.relationship_id = 'Maps to'
       |JOIN global_temp.concept_ancestor AS ca
       |  ON cr.concept_id_2 = ca.descendant_concept_id
       |JOIN global_temp.concept AS c
       |  ON ca.ancestor_concept_id = c.concept_id
       |WHERE c.concept_class_id = 'Ingredient'
       |""".stripMargin

  /** Earliest-HF-visit entry selection, shared by the entry + intermediate
    * queries (heart_failure.py:115-141). */
  private val entrySelect =
    s"""SELECT
       |  c.person_id,
       |  c.earliest_visit_start_date AS index_date,
       |  c.earliest_visit_occurrence_id AS visit_occurrence_id,
       |  COUNT(c.visit_occurrence_id) OVER (PARTITION BY c.person_id) AS num_of_diagnosis
       |FROM (
       |  SELECT DISTINCT
       |    v.person_id,
       |    v.visit_occurrence_id,
       |    first(DATE(c.condition_start_date)) OVER (PARTITION BY v.person_id
       |      ORDER BY DATE(c.condition_start_date)) AS earliest_condition_start_date,
       |    first(DATE(v.visit_start_date)) OVER (PARTITION BY v.person_id
       |      ORDER BY DATE(v.visit_start_date)) AS earliest_visit_start_date,
       |    first(v.visit_occurrence_id) OVER (PARTITION BY v.person_id
       |      ORDER BY DATE(v.visit_start_date)) AS earliest_visit_occurrence_id
       |  FROM global_temp.visit_occurrence AS v
       |  JOIN hf_conditions AS c ON v.visit_occurrence_id = c.visit_occurrence_id
       |) c
       |WHERE c.earliest_visit_start_date <= c.earliest_condition_start_date
       |""".stripMargin

  private val hfConditionsCte =
    s"""hf_conditions AS (
       |  SELECT * FROM global_temp.condition_occurrence AS co
       |  JOIN global_temp.$HfConceptTable AS hf ON co.condition_concept_id = hf.concept_id
       |)""".stripMargin

  private val entryCohortSql = s"WITH $hfConditionsCte\n$entrySelect"

  private val intermediateSql =
    s"""WITH $hfConditionsCte,
       |worsen_hf_diagnosis AS (
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.condition_occurrence AS co
       |  JOIN global_temp.$WorsenHfDxTable AS w_hf ON co.condition_concept_id = w_hf.concept_id
       |),
       |phy_exam_cohort AS (
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.condition_occurrence AS co
       |  JOIN global_temp.$PhysicalExamTable AS phy ON co.condition_concept_id = phy.concept_id
       |),
       |bnp_cohort AS (
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.measurement AS m
       |  JOIN global_temp.$BnpTable AS bnp
       |    ON m.measurement_concept_id = bnp.concept_id AND m.value_source_value > 500
       |  UNION ALL
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.measurement AS m
       |  JOIN global_temp.$NtProBnpTable AS nt_bnp
       |    ON m.measurement_concept_id = nt_bnp.concept_id AND m.value_source_value > 2000
       |),
       |drug_concepts AS (
       |  SELECT DISTINCT * FROM (
       |    SELECT * FROM global_temp.$DrugTable
       |    UNION
       |    SELECT * FROM global_temp.$DiureticsIngredientTable
       |  ) d
       |),
       |drug_cohort AS (
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.drug_exposure AS d
       |  JOIN drug_concepts AS dc ON d.drug_concept_id = dc.concept_id
       |),
       |mechanical_support_cohort AS (
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.procedure_occurrence AS p
       |  JOIN global_temp.$MechanicalSupportTable AS msc ON p.procedure_concept_id = msc.concept_id
       |),
       |dialysis_cohort AS (
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.procedure_occurrence AS p
       |  JOIN global_temp.$DialysisTable AS dc ON p.procedure_concept_id = dc.concept_id
       |),
       |artificial_heart_cohort AS (
       |  SELECT DISTINCT person_id, visit_occurrence_id
       |  FROM global_temp.procedure_occurrence AS p
       |  JOIN global_temp.$ArtificialHeartTable AS ahc ON p.procedure_concept_id = ahc.concept_id
       |),
       |treatment_cohort AS (
       |  SELECT * FROM mechanical_support_cohort
       |  UNION ALL
       |  SELECT * FROM dialysis_cohort
       |  UNION ALL
       |  SELECT * FROM artificial_heart_cohort
       |),
       |entry_cohort AS (
       |$entrySelect
       |)
       |SELECT
       |  c.*,
       |  CAST(COALESCE(bnp.person_id, tc.person_id, dc.person_id) IS NOT NULL AS INT) AS inclusion
       |FROM entry_cohort AS c
       |LEFT JOIN (SELECT DISTINCT person_id FROM bnp_cohort) AS bnp
       |  ON c.person_id = bnp.person_id
       |LEFT JOIN (SELECT DISTINCT person_id FROM treatment_cohort) AS tc
       |  ON c.person_id = tc.person_id
       |LEFT JOIN (
       |  SELECT DISTINCT hf.person_id
       |  FROM hf_conditions hf
       |  JOIN drug_cohort dc ON hf.visit_occurrence_id = dc.visit_occurrence_id
       |) AS dc ON c.person_id = dc.person_id
       |""".stripMargin

  private def mainSql(inclusion: Int): String =
    s"""SELECT person_id, index_date, visit_occurrence_id
       |FROM global_temp.$IntermediateCohortName
       |WHERE inclusion = $inclusion
       |""".stripMargin

  def queryBuilder(): QueryBuilder = QueryBuilder(
    cohortName = "heart_failure",
    dependencyList = Seq("person", "visit_occurrence", "condition_occurrence",
      "drug_exposure", "procedure_occurrence", "measurement"),
    query = QuerySpec(mainSql(1), Map.empty, "heart_failure"),
    negativeQuery = Some(QuerySpec(mainSql(0), Map.empty, QueryBuilder.NegativeCohort)),
    entryCohortQuery = Some(QuerySpec(entryCohortSql, Map.empty, QueryBuilder.EntryCohort)),
    dependencyQueries = Seq(
      QuerySpec(rollUpDiureticsSql, Map.empty, DiureticsIngredientTable),
      QuerySpec(intermediateSql, Map.empty, IntermediateCohortName)),
    ancestorTableSpecs = Seq(
      AncestorTableSpec(HeartFailureConcepts, HfConceptTable, isStandard = true),
      AncestorTableSpec(WorsenHfDiagnosisConcepts, WorsenHfDxTable, isStandard = true),
      AncestorTableSpec(PhysicalExamConcepts, PhysicalExamTable, isStandard = true),
      AncestorTableSpec(BnpConcepts, BnpTable, isStandard = true),
      AncestorTableSpec(NtProBnpConcepts, NtProBnpTable, isStandard = true),
      AncestorTableSpec(DrugConcepts, DrugTable, isStandard = true),
      AncestorTableSpec(MechanicalSupportConcepts, MechanicalSupportTable, isStandard = true),
      AncestorTableSpec(DialysisConcepts, DialysisTable, isStandard = true),
      AncestorTableSpec(ArtificialHeartConcepts, ArtificialHeartTable, isStandard = true),
      AncestorTableSpec(DiureticConcepts, DiureticsAncestorTable, isStandard = false)))
}
