package graft.omop.cohort.definitions

import org.apache.spark.sql.SparkSession

import graft.omop.cohort.{PredictionCohort, QueryBuilder, QuerySpec}

/**
 * The 12 prediction-task pairings (target cohort × outcome cohort), matching
 * /root/reference/src/cehrbert_data/prediction_cohorts/: hf_readmission,
 * copd_readmission, readmission, hospitalization, hospitalization_mortality,
 * mortality (last-visit-home × death), covid_death, covid_ventilation,
 * afib_ischemic_stroke, cad_cabg, cad_hf, t2dm_hf.
 *
 * Each task is `(args, ehrTables) => run`, so a CLI or notebook invokes:
 * `PredictionTasks.covidDeath(spark, args)`.
 */
object PredictionTasks {

  val DefaultDomainTables: Seq[String] =
    Seq("condition_occurrence", "drug_exposure", "procedure_occurrence")

  private val inpatientHospitalizationSql =
    """SELECT DISTINCT
      |  v.person_id,
      |  v.visit_occurrence_id,
      |  COALESCE(v.visit_start_datetime, v.visit_start_date) AS index_date
      |FROM global_temp.visit_occurrence AS v
      |WHERE v.visit_concept_id IN (9201, 262, 8971, 8920)
      |""".stripMargin

  /** Generic "any hospitalization" outcome (hf_readmission.py:37-45). */
  def hospitalizationOutcome: QueryBuilder = QueryBuilder(
    cohortName = "hospitalization",
    dependencyList = Seq("person", "condition_occurrence", "visit_occurrence"),
    query = QuerySpec(inpatientHospitalizationSql, Map.empty, "hospitalization"))

  def hfReadmission(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      HfReadmission.target(args.dateLowerBound), HfReadmission.outcome,
      DefaultDomainTables)

  /** COPD discharged-home hospitalizations vs any readmission
    * (copd_readmission.py:12-42). */
  def copdReadmission(spark: SparkSession, args: PredictionCohort.Args): Unit = {
    val copdSql =
      """WITH copd_conditions AS (
        |  SELECT DISTINCT descendant_concept_id AS concept_id
        |  FROM global_temp.concept_ancestor AS ca
        |  WHERE ca.ancestor_concept_id IN (255573, 258780)
        |)
        |SELECT DISTINCT
        |  v.person_id,
        |  v.visit_occurrence_id,
        |  COALESCE(v.visit_end_datetime, v.visit_end_date) AS index_date
        |FROM global_temp.visit_occurrence AS v
        |JOIN global_temp.condition_occurrence AS co
        |  ON v.visit_occurrence_id = co.visit_occurrence_id
        |JOIN copd_conditions AS copd ON co.condition_concept_id = copd.concept_id
        |WHERE v.visit_concept_id IN (9201, 262)
        |  AND v.discharged_to_concept_id = 8536
        |  AND v.visit_start_date <= co.condition_start_date
        |""".stripMargin
    val target = QueryBuilder("copd_readmission",
      Seq("person", "condition_occurrence", "visit_occurrence"),
      QuerySpec(copdSql, Map.empty, "copd_readmission"))
    val outcomeSql =
      """SELECT DISTINCT
        |  v.person_id,
        |  v.visit_occurrence_id,
        |  COALESCE(v.visit_start_datetime, v.visit_start_date) AS index_date
        |FROM global_temp.visit_occurrence AS v
        |WHERE v.visit_concept_id IN (9201, 262)
        |""".stripMargin
    val outcome = QueryBuilder("hospitalization",
      Seq("person", "condition_occurrence", "visit_occurrence"),
      QuerySpec(outcomeSql, Map.empty, "hospitalization"))
    PredictionCohort.create(spark, args, target, outcome, DefaultDomainTables)
  }

  /** Any discharge → any readmission (readmission.py:13-30). */
  def readmission(spark: SparkSession, args: PredictionCohort.Args): Unit = {
    val firstSql =
      """SELECT DISTINCT
        |  v.person_id,
        |  v.visit_occurrence_id,
        |  COALESCE(v.visit_end_datetime, CAST(v.visit_end_date AS TIMESTAMP)) AS index_date
        |FROM global_temp.visit_occurrence AS v
        |WHERE v.visit_concept_id IN (9201, 262, 8971, 8920)
        |""".stripMargin
    val secondSql =
      """SELECT DISTINCT
        |  v.person_id,
        |  v.visit_occurrence_id,
        |  COALESCE(v.visit_start_datetime, CAST(v.visit_start_date AS TIMESTAMP)) AS index_date
        |FROM global_temp.visit_occurrence AS v
        |WHERE v.visit_concept_id IN (9201, 262, 8971, 8920)
        |""".stripMargin
    PredictionCohort.create(spark, args,
      QueryBuilder("first_hospitalization",
        Seq("person", "condition_occurrence", "visit_occurrence"),
        QuerySpec(firstSql, Map.empty, "first_hospitalization")),
      QueryBuilder("second_hospitalization",
        Seq("person", "condition_occurrence", "visit_occurrence"),
        QuerySpec(secondSql, Map.empty, "second_hospitalization")),
      DefaultDomainTables)
  }

  /** Active patients (2-30 visits in the window) → future hospitalization
    * (hospitalization.py:13-57). */
  def hospitalization(spark: SparkSession, args: PredictionCohort.Args): Unit = {
    val totalWindow = args.observationWindow + args.holdOffWindow
    val targetSql =
      s"""WITH INDEX_VISIT_TABLE AS (
         |  SELECT DISTINCT
         |    person_id,
         |    FIRST(visit_start_datetime) OVER (PARTITION BY person_id
         |      ORDER BY visit_start_datetime, visit_occurrence_id) AS index_date,
         |    FIRST(visit_occurrence_id) OVER (PARTITION BY person_id
         |      ORDER BY visit_start_datetime, visit_occurrence_id) AS visit_occurrence_id
         |  FROM global_temp.visit_occurrence
         |  WHERE visit_end_date >= visit_start_date
         |),
         |HOSPITAL_TARGET AS (
         |  SELECT DISTINCT
         |    iv.person_id,
         |    iv.index_date + INTERVAL $totalWindow DAYS AS index_date,
         |    count(DISTINCT CASE WHEN v1.visit_concept_id IN (9201, 262)
         |          THEN v1.visit_occurrence_id END) AS num_of_hospitalizations,
         |    count(DISTINCT v1.visit_occurrence_id) AS num_of_visits
         |  FROM INDEX_VISIT_TABLE iv
         |  JOIN global_temp.visit_occurrence v1
         |    ON v1.person_id = iv.person_id
         |    AND DATEDIFF(v1.visit_start_date, iv.index_date) <= $totalWindow
         |  JOIN global_temp.observation_period op
         |    ON iv.person_id = op.person_id
         |    AND DATEDIFF(CAST(op.observation_period_end_date AS DATE),
         |                 CAST(op.observation_period_start_date AS DATE)) >= $totalWindow
         |  GROUP BY iv.person_id, iv.index_date
         |)
         |SELECT person_id, index_date, CAST(null AS INT) AS visit_occurrence_id
         |FROM HOSPITAL_TARGET
         |WHERE num_of_visits BETWEEN 2 AND 30
         |  AND index_date >= '${args.dateLowerBound}'
         |""".stripMargin
    val outcomeSql =
      """SELECT DISTINCT
        |  v.person_id,
        |  visit_start_date AS index_date,
        |  visit_occurrence_id
        |FROM global_temp.visit_occurrence AS v
        |WHERE v.visit_concept_id IN (9201, 262)
        |""".stripMargin
    PredictionCohort.create(spark, args,
      QueryBuilder("hospitalization_target",
        Seq("person", "condition_occurrence", "visit_occurrence"),
        QuerySpec(targetSql, Map.empty, "hospitalization_target")),
      QueryBuilder("hospitalization_outcome",
        Seq("person", "condition_occurrence", "visit_occurrence"),
        QuerySpec(outcomeSql, Map.empty, "hospitalization_outcome")),
      DefaultDomainTables)
  }

  /** Long (>48h) inpatient stays, index 24h after admission → in-hospital
    * mortality (hospitalization_mortality.py:9-44). */
  def hospitalizationMortality(spark: SparkSession, args: PredictionCohort.Args): Unit = {
    val targetSql =
      s"""SELECT DISTINCT v.person_id, v.visit_occurrence_id, v.index_date, v.expired
         |FROM (
         |  SELECT
         |    v.person_id,
         |    v.visit_occurrence_id,
         |    v.visit_start_datetime + INTERVAL 24 HOURS AS index_date,
         |    CASE WHEN v.discharged_to_concept_id == 4216643 THEN 1 ELSE 0 END AS expired,
         |    ROW_NUMBER() OVER (PARTITION BY v.person_id
         |      ORDER BY COALESCE(v.visit_end_datetime, v.visit_end_date) DESC) AS rn
         |  FROM global_temp.visit_occurrence AS v
         |  WHERE v.visit_concept_id IN (9201, 262)
         |    AND v.visit_end_datetime IS NOT NULL
         |    AND (unix_timestamp(v.visit_end_datetime) - unix_timestamp(v.visit_start_datetime)) / 3600 > 48
         |) AS v
         |WHERE v.rn = 1 AND v.index_date >= '${args.dateLowerBound}'
         |""".stripMargin
    val outcomeSql =
      """SELECT DISTINCT v.person_id, v.visit_occurrence_id, v.index_date AS index_date
        |FROM global_temp.hospitalization_target AS v
        |WHERE expired = 1
        |""".stripMargin
    PredictionCohort.create(spark, args,
      QueryBuilder("hospitalization_target", Seq("visit_occurrence"),
        QuerySpec(targetSql, Map.empty, "hospitalization_target")),
      QueryBuilder("hospitalization_mortality", Seq("visit_occurrence"),
        QuerySpec(outcomeSql, Map.empty, "hospitalization_mortality")),
      DefaultDomainTables)
  }

  def dischargeHomeDeath(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      LastVisitDischargedHome.queryBuilder(args.dateLowerBound),
      Mortality.queryBuilder(), DefaultDomainTables)

  def covidDeath(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      CovidInpatient.queryBuilder(), Mortality.queryBuilder(), DefaultDomainTables)

  def covidVentilation(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      Covid.queryBuilder(), Ventilation.queryBuilder(), DefaultDomainTables)

  def afibIschemicStroke(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      AtrialFibrillation.queryBuilder(), IschemicStroke.queryBuilder(), DefaultDomainTables)

  def cadCabg(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      CoronaryArteryDisease.queryBuilder(args.dateLowerBound),
      Cabg.queryBuilder(args.dateLowerBound), DefaultDomainTables)

  def cadHf(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      CoronaryArteryDisease.queryBuilder(args.dateLowerBound),
      HeartFailure.queryBuilder(), DefaultDomainTables)

  def t2dmHf(spark: SparkSession, args: PredictionCohort.Args): Unit =
    PredictionCohort.create(spark, args,
      TypeTwoDiabetes.queryBuilder(args.dateLowerBound),
      HeartFailure.queryBuilder(), DefaultDomainTables)
}
