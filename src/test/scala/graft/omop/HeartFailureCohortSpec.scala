package graft.omop

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import graft.SparkSpecBase
import graft.omop.cohort.{BaseCohortBuilder, QueryBuilder}
import graft.omop.cohort.definitions.HeartFailure

/**
 * End-to-end execution of the HeartFailure QueryBuilder SQL — the one cohort
 * whose text exercises §2.5 W11 (`COUNT(...) OVER (PARTITION BY ...)`) and
 * §2.7 U3 (`UNION` / `UNION ALL`) — against a hand-built OMOP fixture with a
 * hand-derived expected cohort. The bundled sample CDM has no HF vocabulary
 * rows (the cohort would be empty and the branches untested), so the fixture
 * is synthetic and engineered to light up every inclusion branch once:
 *   p1  BNP measurement > 500            → positive (and num_of_diagnosis=2,
 *       via a descendant HF concept — proves concept_ancestor resolution)
 *   p2  drug exposure on the HF visit    → positive (drug-seed branch)
 *   p3  dialysis procedure               → positive (treatment UNION ALL arm)
 *   p6  diuretics ingredient exposure    → positive (non-standard ancestry
 *       closure + 'Maps to' + ingredient rollup chain)
 *   p4  HF diagnosis, no corroboration   → negative cohort (inclusion=0)
 *   p5  HF condition pre-dating its earliest HF visit → fails entry entirely
 * A dialect drift in `COUNT OVER`, `first() OVER`, `UNION`/`UNION ALL`, or
 * the ancestry SQL breaks these assertions.
 *
 * Reference: /root/reference/src/cehrbert_data/cohorts/heart_failure.py
 * (queries :105-285), spark_app_base.py:89-273 (builder orchestration).
 */
class HeartFailureCohortSpec extends SparkSpecBase {

  private def d(s: String) = Date.valueOf(s)
  private def t(s: String) = Timestamp.valueOf(s + " 00:00:00")

  override def afterAll(): Unit = {
    for (v <- Seq(QueryBuilder.EntryCohort, QueryBuilder.NegativeCohort,
        QueryBuilder.CohortTableName, HeartFailure.IntermediateCohortName,
        HeartFailure.HfConceptTable, HeartFailure.WorsenHfDxTable,
        HeartFailure.PhysicalExamTable, HeartFailure.BnpTable,
        HeartFailure.NtProBnpTable, HeartFailure.DrugTable,
        HeartFailure.MechanicalSupportTable, HeartFailure.DialysisTable,
        HeartFailure.ArtificialHeartTable, HeartFailure.DiureticsAncestorTable,
        HeartFailure.DiureticsIngredientTable))
      spark.catalog.dropGlobalTempView(v)
    super.afterAll()
  }

  test("HeartFailure cohort SQL end-to-end on a hand-derived fixture") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-hf-omop").toString
    val out = Files.createTempDirectory("graft-hf-out").toString

    // ---- vocabulary ----
    val HfChild = 3161390L         // descendant of HF 316139
    val DiureticClass = 4186998L   // Subsumes-child of the diuretics seed
    val DiureticBrand = 1309001L   // 'Maps to' target, descendant of ...
    val DiureticIngredient = 1309000L // ... the RxNorm ingredient
    val concept = Seq(
      (316139L, "Heart failure", "Condition", "SNOMED", "Clinical Finding", "S"),
      (HfChild, "Acute heart failure", "Condition", "SNOMED", "Clinical Finding", "S"),
      (312437L, "Dyspnea", "Condition", "SNOMED", "Clinical Finding", "S"),
      (433595L, "Edema", "Condition", "SNOMED", "Clinical Finding", "S"),
      (4307029L, "BNP", "Measurement", "LOINC", "Lab Test", "S"),
      (3029187L, "NT-proBNP", "Measurement", "LOINC", "Lab Test", "S"),
      (956874L, "Furosemide injectable", "Drug", "RxNorm", "Clinical Drug", "S"),
      (45888564L, "Mechanical support", "Procedure", "CPT4", "Procedure", "S"),
      (4032243L, "Hemodialysis", "Procedure", "SNOMED", "Procedure", "S"),
      (4144390L, "Artificial heart", "Procedure", "SNOMED", "Procedure", "S"),
      (4186999L, "Diuretic", "Drug", "SNOMED", "Drug Class", null),
      (DiureticClass, "Loop diuretic", "Drug", "SNOMED", "Drug Class", null),
      (DiureticBrand, "Bumetanide 1mg tab", "Drug", "RxNorm", "Branded Drug", "S"),
      (DiureticIngredient, "Bumetanide", "Drug", "RxNorm", "Ingredient", "S"))
      .toDF("concept_id", "concept_name", "domain_id", "vocabulary_id",
        "concept_class_id", "standard_concept")
    // self rows (OMOP distance-0 convention) + the one real child edge
    val conceptAncestor = (concept.as[(Long, String, String, String, String, String)]
      .collect().map(c => (c._1, c._1)) :+
      ((316139L, HfChild)) :+ ((DiureticIngredient, DiureticBrand)))
      .toSeq.toDF("ancestor_concept_id", "descendant_concept_id")
    val conceptRelationship = Seq(
      (4186999L, DiureticClass, "Subsumes"),
      (DiureticClass, DiureticBrand, "Maps to"))
      .toDF("concept_id_1", "concept_id_2", "relationship_id")

    // ---- clinical tables ----
    // p1's birth_datetime overrides year_of_birth (coalesce branch); the
    // rest exercise the year_of_birth fallback through a null timestamp
    val person = Seq(1L, 2L, 3L, 4L, 5L, 6L)
      .map(p => (p, 1980, if (p == 1L) t("1980-05-15") else null, 8507L, 8527L))
      .toDF("person_id", "year_of_birth", "birth_datetime",
        "gender_concept_id", "race_concept_id")
    val visits = Seq(
      (101L, 1L, d("2015-01-10")), (102L, 1L, d("2015-02-10")),
      (201L, 2L, d("2015-03-01")),
      (301L, 3L, d("2015-04-01")),
      (401L, 4L, d("2015-05-01")),
      (501L, 5L, d("2015-06-01")),
      (601L, 6L, d("2015-07-01")))
      .toDF("visit_occurrence_id", "person_id", "visit_start_date")
    val conditions = Seq(
      // p1: two HF diagnoses on two visits, via the DESCENDANT concept
      (1L, 101L, HfChild, d("2015-01-10")),
      (1L, 102L, HfChild, d("2015-02-10")),
      (2L, 201L, 316139L, d("2015-03-01")),
      (3L, 301L, 316139L, d("2015-04-01")),
      (4L, 401L, 316139L, d("2015-05-01")),
      // p5: condition start PRE-DATES its visit start → fails entry
      (5L, 501L, 316139L, d("2015-05-01")),
      (6L, 601L, 316139L, d("2015-07-01")))
      .toDF("person_id", "visit_occurrence_id", "condition_concept_id",
        "condition_start_date")
    val measurement = Seq(
      (1L, 101L, 4307029L, 600.0),  // BNP > 500 → inclusion
      (4L, 401L, 4307029L, 100.0))  // below threshold → NOT corroborating
      .toDF("person_id", "visit_occurrence_id", "measurement_concept_id",
        "value_source_value")
    val drugs = Seq(
      (2L, 201L, 956874L),        // drug-seed branch, on the HF visit
      (6L, 601L, DiureticBrand))  // rolls up to the diuretics ingredient
      .toDF("person_id", "visit_occurrence_id", "drug_concept_id")
    val procedures = Seq((3L, 301L, 4032243L))
      .toDF("person_id", "visit_occurrence_id", "procedure_concept_id")
    val obsPeriod = Seq(1L, 2L, 3L, 4L, 5L, 6L)
      .map(p => (p, d("2014-01-01"), d("2016-12-31")))
      .toDF("person_id", "observation_period_start_date",
        "observation_period_end_date")

    for ((name, df) <- Seq(
        "concept" -> concept, "concept_ancestor" -> conceptAncestor,
        "concept_relationship" -> conceptRelationship, "person" -> person,
        "visit_occurrence" -> visits, "condition_occurrence" -> conditions,
        "measurement" -> measurement, "drug_exposure" -> drugs,
        "procedure_occurrence" -> procedures, "observation_period" -> obsPeriod))
      df.write.mode("overwrite").parquet(s"$in/$name")

    val builder = new BaseCohortBuilder(
      HeartFailure.queryBuilder(), in, out,
      dateLowerBound = "2010-01-01", dateUpperBound = "2020-01-01",
      ageLowerBound = 0, ageUpperBound = 100,
      priorObservationPeriod = 0, postObservationPeriod = 0)
    builder.build(spark)
    val cohort = builder.loadCohort(spark)

    // positives: every corroboration branch fires exactly once
    val got = cohort
      .select("person_id", "age", "index_date", "visit_occurrence_id")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.get(2).toString.substring(0, 10), r.getLong(3))).toSet
    assert(got === Set(
      (1L, 35, "2015-01-10", 101L),
      (2L, 35, "2015-03-01", 201L),
      (3L, 35, "2015-04-01", 301L),
      (6L, 35, "2015-07-01", 601L)))

    // entry cohort: W11 COUNT OVER — p1 has 2 qualifying diagnoses; p5 is
    // out (its earliest HF condition pre-dates its earliest HF visit)
    val entry = spark.table(s"global_temp.${QueryBuilder.EntryCohort}")
      .select("person_id", "num_of_diagnosis").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(entry === Set((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L), (6L, 1L)))

    // negative cohort: entered but uncorroborated (BNP below threshold)
    val neg = spark.table(s"global_temp.${QueryBuilder.NegativeCohort}")
      .select("person_id").distinct().collect().map(_.getLong(0)).toSet
    assert(neg === Set(4L))

    // the diuretics chain resolved through Subsumes → Maps to → ancestor:
    // exactly the ingredient concept
    val ingredients = spark
      .table(s"global_temp.${HeartFailure.DiureticsIngredientTable}")
      .select("concept_id").collect().map(_.getLong(0)).toSet
    assert(ingredients === Set(DiureticIngredient))
  }
}
