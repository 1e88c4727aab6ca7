package graft.omop.cohort.definitions

import graft.omop.cohort.{AncestorTableSpec, QueryBuilder, QuerySpec}

/**
 * The clinical cohort library: each object yields the reference's
 * [[QueryBuilder]] for one phenotype, with concept sets and predicate
 * semantics preserved exactly.
 *
 * References under /root/reference/src/cehrbert_data/cohorts/:
 * atrial_fibrillation.py, ischemic_stroke.py, cabg.py,
 * coronary_artery_disease.py, type_two_diabietes.py, covid.py,
 * covid_inpatient.py, death.py, ventilation.py,
 * last_visit_discharged_home.py, heart_failure.py.
 *
 * Several cohorts share one shape — "first qualifying domain event per
 * patient, index at end-of-day" — expressed once in
 * [[CohortSql.firstEventEndOfDay]] instead of copy-pasted SQL.
 */
object CohortSql {

  /** End-of-day index timestamp: if the event datetime precedes the visit
    * start by ≤ 1 day the visit start date wins, else the event date
    * (reference pattern, e.g. atrial_fibrillation.py query). */
  def firstEventEndOfDay(domainTable: String, prefix: String, dateCol: String,
                         datetimeCol: String, conceptCol: String,
                         conceptTable: String, extraPredicate: String = ""): String =
    s"""SELECT DISTINCT
       |  c.person_id,
       |  c.index_date,
       |  c.visit_occurrence_id
       |FROM (
       |  SELECT DISTINCT
       |    $prefix.person_id,
       |    vo.visit_occurrence_id,
       |    CASE WHEN $prefix.$datetimeCol < vo.visit_start_datetime
       |              AND datediff(vo.visit_start_datetime, $prefix.$datetimeCol) <= 1
       |         THEN to_timestamp(concat(date_format(vo.visit_start_date, 'yyyy-MM-dd'), ' 23:59:00'),
       |                           'yyyy-MM-dd HH:mm:ss')
       |         ELSE to_timestamp(concat(date_format($prefix.$dateCol, 'yyyy-MM-dd'), ' 23:59:00'),
       |                           'yyyy-MM-dd HH:mm:ss')
       |    END AS index_date,
       |    ROW_NUMBER() OVER (PARTITION BY $prefix.person_id
       |      ORDER BY $prefix.$datetimeCol, $prefix.$dateCol, $prefix.visit_occurrence_id) AS r_number
       |  FROM global_temp.$domainTable AS $prefix
       |  JOIN global_temp.visit_occurrence AS vo
       |    ON $prefix.visit_occurrence_id = vo.visit_occurrence_id
       |  JOIN global_temp.$conceptTable AS ie
       |    ON $prefix.$conceptCol = ie.concept_id
       |) c
       |WHERE c.r_number = 1$extraPredicate
       |""".stripMargin
}

/** First atrial-fibrillation diagnosis (descendants of 313217). */
object AtrialFibrillation {
  val ConceptTable = "atrial_fibrillation_concepts"
  def queryBuilder(): QueryBuilder = QueryBuilder(
    cohortName = "atrial_fibrillation",
    dependencyList = Seq("person", "visit_occurrence", "condition_occurrence"),
    query = QuerySpec(CohortSql.firstEventEndOfDay("condition_occurrence", "co",
      "condition_start_date", "condition_start_datetime", "condition_concept_id",
      ConceptTable), Map.empty, "atrial_fibrillation"),
    ancestorTableSpecs = Seq(AncestorTableSpec(Seq(313217L), ConceptTable, isStandard = true)))
}

/** First ischemic-stroke diagnosis (descendants of 443454). */
object IschemicStroke {
  val ConceptTable = "ischemic_stroke_concepts"
  def queryBuilder(): QueryBuilder = QueryBuilder(
    cohortName = "ischemic_stroke",
    dependencyList = Seq("person", "visit_occurrence", "condition_occurrence"),
    query = QuerySpec(CohortSql.firstEventEndOfDay("condition_occurrence", "co",
      "condition_start_date", "condition_start_datetime", "condition_concept_id",
      ConceptTable), Map.empty, "ischemic_stroke"),
    ancestorTableSpecs = Seq(AncestorTableSpec(Seq(443454L), ConceptTable, isStandard = true)))
}

/** First CABG procedure (cabg.py concept list). */
object Cabg {
  val ConceptTable = "CABG"
  val Concepts: Seq[Long] = Seq(43528001L, 43528003L, 43528004L, 43528002L,
    4305852L, 4168831L, 2107250L, 2107216L, 2107222L, 2107231L, 4336464L,
    4231998L, 4284104L, 2100873L)
  def queryBuilder(dateLowerBound: String): QueryBuilder = QueryBuilder(
    cohortName = "cabg",
    dependencyList = Seq("person", "visit_occurrence", "procedure_occurrence"),
    query = QuerySpec(CohortSql.firstEventEndOfDay("procedure_occurrence", "po",
      "procedure_date", "procedure_datetime", "procedure_concept_id", ConceptTable,
      extraPredicate = s" AND c.index_date >= '$dateLowerBound'"),
      Map.empty, "cabg"),
    ancestorTableSpecs = Seq(AncestorTableSpec(Concepts, ConceptTable, isStandard = true)))
}

/** First CAD diagnosis, excluding patients with prior graft/stent procedures. */
object CoronaryArteryDisease {
  val CadTable = "CAD"
  val GraftStentTable = "graft_stent"
  val PriorProcedures: Seq[Long] = Seq(4296227L, 42537730L, 762043L, 44782770L, 42537729L)

  private def sql(dateLowerBound: String): String =
    s"""WITH prior_graft_stent AS (
       |  SELECT po.person_id, po.procedure_date
       |  FROM global_temp.procedure_occurrence AS po
       |  WHERE EXISTS (SELECT 1 FROM global_temp.$GraftStentTable AS gs
       |                WHERE po.procedure_concept_id = gs.concept_id)
       |),
       |candidates AS (
       |${CohortSql.firstEventEndOfDay("condition_occurrence", "co",
            "condition_start_date", "condition_start_datetime",
            "condition_concept_id", CadTable)}
       |)
       |SELECT c.* FROM candidates AS c
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM prior_graft_stent AS exclusion
       |  WHERE exclusion.person_id = c.person_id
       |    AND c.index_date > exclusion.procedure_date)
       |  AND c.index_date >= '$dateLowerBound'
       |""".stripMargin

  def queryBuilder(dateLowerBound: String): QueryBuilder = QueryBuilder(
    cohortName = "coronary_artery_disease",
    dependencyList = Seq("person", "visit_occurrence", "condition_occurrence",
      "procedure_occurrence"),
    query = QuerySpec(sql(dateLowerBound), Map.empty, "coronary_artery_disease"),
    ancestorTableSpecs = Seq(
      AncestorTableSpec(Seq(317576L), CadTable, isStandard = true),
      AncestorTableSpec(PriorProcedures, GraftStentTable, isStandard = true)))
}

/** First T2DM diagnosis with an antidiabetic drug and no exclusion
  * observation before index (type_two_diabietes.py). */
object TypeTwoDiabetes {
  val InclusionTable = "diabetes_inclusion_concepts"
  val ExclusionTable = "diabetes_exclusion_concepts"
  val DrugTable = "drug_inclusion_concepts"
  val ObservationExclusionTable = "observation_exclusion_concepts"

  val Inclusion: Seq[Long] = Seq(443238L, 201820L, 442793L, 4016045L)
  val Exclusion: Seq[Long] = Seq(40484648L, 201254L, 435216L, 4058243L, 30968L,
    438476L, 195771L, 193323L, 4019513L, 40484649L)
  val DrugInclusion: Seq[Long] = Seq(1503297L, 1594973L, 1597756L, 1559684L,
    1560171L, 1502855L, 1502809L, 1525215L, 1547504L, 1580747L, 40166035L,
    43013884L, 40239216L, 1516766L, 1502826L, 1510202L, 1529331L, 35605670L,
    35602717L, 1516976L, 1502905L, 46221581L, 1550023L, 35198096L, 42899447L,
    1544838L, 1567198L, 35884381L, 1531601L, 1588986L, 1513876L, 19013951L,
    1590165L, 1596977L, 1586346L, 19090204L, 1513843L, 1513849L, 1562586L,
    19090226L, 19090221L, 1586369L, 19090244L, 19090229L, 19090247L, 19090249L,
    19090180L, 19013926L, 19091621L, 19090187L)
  val ObservationExclusion: Seq[Long] = Seq(40769338L, 43021173L, 42539022L, 46270562L)

  private def sql(dateLowerBound: String): String =
    s"""WITH person_ids_to_include_drug AS (
       |  SELECT DISTINCT d.person_id
       |  FROM global_temp.drug_exposure AS d
       |  JOIN global_temp.$DrugTable AS e ON d.drug_concept_id = e.concept_id
       |),
       |person_ids_to_exclude_observation AS (
       |  SELECT DISTINCT o.person_id, o.observation_date
       |  FROM global_temp.observation AS o
       |  JOIN global_temp.$ObservationExclusionTable AS oec
       |    ON o.observation_concept_id = oec.concept_id
       |),
       |candidates AS (
       |${CohortSql.firstEventEndOfDay("condition_occurrence", "co",
            "condition_start_date", "condition_start_datetime",
            "condition_concept_id", InclusionTable)}
       |)
       |SELECT DISTINCT c.person_id, c.index_date, c.visit_occurrence_id
       |FROM candidates AS c
       |JOIN person_ids_to_include_drug AS d ON c.person_id = d.person_id
       |LEFT JOIN person_ids_to_exclude_observation AS eo
       |  ON c.person_id = eo.person_id AND c.index_date > eo.observation_date
       |WHERE eo.person_id IS NULL AND c.index_date >= '$dateLowerBound'
       |""".stripMargin

  def queryBuilder(dateLowerBound: String): QueryBuilder = QueryBuilder(
    cohortName = "type_two_diabetes",
    dependencyList = Seq("person", "condition_occurrence", "visit_occurrence",
      "drug_exposure", "observation"),
    query = QuerySpec(sql(dateLowerBound), Map.empty, "type_two_diabetes"),
    ancestorTableSpecs = Seq(
      AncestorTableSpec(Inclusion, InclusionTable, isStandard = true),
      AncestorTableSpec(Exclusion, ExclusionTable, isStandard = true),
      AncestorTableSpec(ObservationExclusion, ObservationExclusionTable, isStandard = true),
      AncestorTableSpec(DrugInclusion, DrugTable, isStandard = true)))
}

/** Earliest COVID-positive visit, index the day after (covid.py). */
object Covid {
  val CovidMeasurementConcepts = "723475,723479,706178,723473,723474,586515,706177,706163,706180,706181"
  private val sql =
    s"""SELECT DISTINCT
       |  c.person_id,
       |  DATE_ADD(FIRST(index_date) OVER (PARTITION BY person_id
       |    ORDER BY index_date, visit_occurrence_id), 1) AS index_date,
       |  FIRST(visit_occurrence_id) OVER (PARTITION BY person_id
       |    ORDER BY index_date, visit_occurrence_id) AS visit_occurrence_id
       |FROM (
       |  SELECT DISTINCT
       |    m.person_id,
       |    FIRST(visit_start_date) OVER (PARTITION BY v.person_id
       |      ORDER BY visit_start_date, v.visit_occurrence_id) AS index_date,
       |    FIRST(v.visit_occurrence_id) OVER (PARTITION BY v.person_id
       |      ORDER BY visit_start_date, v.visit_occurrence_id) AS visit_occurrence_id
       |  FROM global_temp.measurement AS m
       |  JOIN global_temp.visit_occurrence AS v
       |    ON m.visit_occurrence_id = v.visit_occurrence_id
       |  JOIN global_temp.concept AS c ON m.value_as_concept_id = c.concept_id
       |  WHERE m.measurement_concept_id IN ($CovidMeasurementConcepts)
       |    AND c.concept_name IN ('Detected', 'Positve')
       |  UNION
       |  SELECT
       |    co.person_id,
       |    FIRST(visit_start_date) OVER (PARTITION BY v.person_id
       |      ORDER BY visit_start_date, v.visit_occurrence_id) AS index_date,
       |    FIRST(v.visit_occurrence_id) OVER (PARTITION BY v.person_id
       |      ORDER BY visit_start_date, v.visit_occurrence_id) AS visit_occurrence_id
       |  FROM global_temp.condition_occurrence AS co
       |  JOIN global_temp.visit_occurrence AS v
       |    ON co.visit_occurrence_id = v.visit_occurrence_id
       |  WHERE co.condition_concept_id = 37311061
       |) c
       |""".stripMargin
  def queryBuilder(): QueryBuilder = QueryBuilder(
    cohortName = "covid19",
    dependencyList = Seq("person", "visit_occurrence", "measurement", "condition_occurrence"),
    query = QuerySpec(sql, Map.empty, "covid19"))
}

/** First COVID-positive inpatient/ER visit, with visit back-fill for tests
  * lacking a visit id (covid_inpatient.py). */
object CovidInpatient {
  private val sql =
    s"""WITH covid_positive AS (
       |  SELECT DISTINCT
       |    ROW_NUMBER() OVER (ORDER BY c.person_id, c.index_date) AS test_row_number, c.*
       |  FROM (
       |    SELECT DISTINCT
       |      m.person_id,
       |      COALESCE(vo.visit_start_datetime, m.measurement_datetime) AS index_date,
       |      vo.visit_occurrence_id,
       |      vo.visit_concept_id
       |    FROM global_temp.measurement AS m
       |    LEFT JOIN global_temp.visit_occurrence AS vo
       |      ON m.visit_occurrence_id = vo.visit_occurrence_id
       |    WHERE measurement_concept_id IN (${Covid.CovidMeasurementConcepts})
       |      AND value_source_value = 'Detected'
       |    UNION
       |    SELECT DISTINCT
       |      co.person_id,
       |      COALESCE(vo.visit_start_datetime, co.condition_start_datetime) AS index_date,
       |      vo.visit_occurrence_id,
       |      vo.visit_concept_id
       |    FROM global_temp.condition_occurrence AS co
       |    LEFT JOIN global_temp.visit_occurrence AS vo
       |      ON co.visit_occurrence_id = vo.visit_occurrence_id
       |    WHERE condition_concept_id = 37311061
       |  ) c
       |),
       |covid_test_with_no_visit AS (
       |  SELECT DISTINCT
       |    c.test_row_number,
       |    c.person_id,
       |    FIRST_VALUE(vo.visit_start_datetime) OVER (PARTITION BY c.person_id
       |      ORDER BY vo.visit_start_datetime DESC) AS index_date,
       |    FIRST_VALUE(vo.visit_occurrence_id) OVER (PARTITION BY c.person_id
       |      ORDER BY vo.visit_start_datetime DESC) AS visit_occurrence_id,
       |    FIRST_VALUE(vo.visit_concept_id) OVER (PARTITION BY c.person_id
       |      ORDER BY vo.visit_start_datetime DESC) AS visit_concept_id
       |  FROM covid_positive AS c
       |  JOIN global_temp.visit_occurrence AS vo
       |    ON c.person_id = vo.person_id
       |    AND c.index_date BETWEEN DATE_ADD(vo.visit_start_date, -7) AND vo.visit_start_date
       |  WHERE c.visit_occurrence_id IS NULL
       |),
       |all_covid_tests AS (
       |  SELECT DISTINCT
       |    c.person_id,
       |    COALESCE(c.index_date, cn.index_date) AS index_date,
       |    COALESCE(c.visit_occurrence_id, cn.visit_occurrence_id) AS visit_occurrence_id,
       |    COALESCE(c.visit_concept_id, cn.visit_concept_id) AS visit_concept_id
       |  FROM covid_positive AS c
       |  LEFT JOIN covid_test_with_no_visit AS cn ON c.test_row_number = cn.test_row_number
       |)
       |SELECT DISTINCT
       |  person_id,
       |  FIRST_VALUE(vo.index_date) OVER (PARTITION BY vo.person_id
       |    ORDER BY vo.index_date) AS index_date,
       |  FIRST_VALUE(vo.visit_occurrence_id) OVER (PARTITION BY vo.person_id
       |    ORDER BY vo.index_date) AS visit_occurrence_id
       |FROM (SELECT co.* FROM all_covid_tests AS co
       |      WHERE visit_concept_id IN (262, 9203, 9201)) vo
       |""".stripMargin
  def queryBuilder(): QueryBuilder = QueryBuilder(
    cohortName = "covid19",
    dependencyList = Seq("person", "visit_occurrence", "measurement", "condition_occurrence"),
    query = QuerySpec(sql, Map.empty, "covid19"))
}

/** Death after last visit, excluding DNR patients (death.py). */
object Mortality {
  private val sql =
    """WITH max_death_date_cte AS (
      |  SELECT person_id, MAX(death_date) AS death_date
      |  FROM global_temp.death GROUP BY person_id
      |),
      |last_visit_start_date AS (
      |  SELECT person_id, MAX(visit_start_date) AS last_visit_start_date
      |  FROM global_temp.visit_occurrence GROUP BY person_id
      |),
      |dnr AS (
      |  SELECT person_id, observation_datetime
      |  FROM global_temp.observation
      |  WHERE observation_concept_id IN (36712886, 4119499, 4275347)
      |)
      |SELECT
      |  d.person_id,
      |  d.death_date AS index_date,
      |  CAST(null AS INT) AS visit_occurrence_id
      |FROM max_death_date_cte AS d
      |JOIN last_visit_start_date AS v
      |  ON d.person_id = v.person_id AND v.last_visit_start_date <= d.death_date
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM dnr
      |  WHERE d.person_id = dnr.person_id
      |    AND dnr.observation_datetime <= d.death_date)
      |""".stripMargin
  def queryBuilder(): QueryBuilder = QueryBuilder(
    cohortName = "mortality",
    dependencyList = Seq("person", "death", "visit_occurrence", "observation"),
    query = QuerySpec(sql, Map.empty, "mortality"),
    entryCohortQuery = Some(QuerySpec(sql, Map.empty, QueryBuilder.EntryCohort)))
}

/** Mechanical-ventilation placements from a site-provided `vent` table. */
object Ventilation {
  private val sql =
    """SELECT DISTINCT
      |  vent.person_id,
      |  vent.earliest_placement_instant AS index_date,
      |  CAST(NULL AS INT) AS visit_occurrence_id
      |FROM global_temp.vent AS vent
      |""".stripMargin
  def queryBuilder(): QueryBuilder = QueryBuilder(
    cohortName = "ventilation",
    dependencyList = Seq("vent"),
    query = QuerySpec(sql, Map.empty, "ventilation"))
}

/** Last inpatient visit discharged home, before any death
  * (last_visit_discharged_home.py). */
object LastVisitDischargedHome {
  private def sql(dateLowerBound: String): String =
    s"""WITH death AS (
       |  SELECT person_id, MIN(death_date) AS death_date
       |  FROM global_temp.death AS d GROUP BY person_id
       |)
       |SELECT DISTINCT v.person_id, v.visit_occurrence_id, v.index_date
       |FROM (
       |  SELECT
       |    v.person_id,
       |    v.visit_occurrence_id,
       |    coalesce(v.visit_end_datetime, v.visit_end_date) AS index_date,
       |    v.discharged_to_concept_id,
       |    ROW_NUMBER() OVER (PARTITION BY v.person_id
       |      ORDER BY DATE(v.visit_end_date) DESC) AS rn
       |  FROM global_temp.visit_occurrence AS v
       |  LEFT JOIN death AS d ON v.person_id = d.person_id
       |  WHERE v.visit_concept_id IN (9201, 262)
       |    AND v.visit_end_date IS NOT NULL
       |    AND v.discharged_to_concept_id = 8536
       |    AND (d.death_date IS NULL OR v.visit_end_date <= d.death_date)
       |) AS v
       |WHERE v.rn = 1 AND v.index_date >= '$dateLowerBound'
       |""".stripMargin
  def queryBuilder(dateLowerBound: String): QueryBuilder = QueryBuilder(
    cohortName = "last_visit_discharge_home",
    dependencyList = Seq("person", "visit_occurrence", "death"),
    query = QuerySpec(sql(dateLowerBound), Map.empty, "last_visit_discharge_home"))
}
