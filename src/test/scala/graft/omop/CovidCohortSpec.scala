package graft.omop

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import graft.SparkSpecBase
import graft.omop.cohort.BaseCohortBuilder
import graft.omop.cohort.definitions.Covid

/**
 * End-to-end execution of the Covid QueryBuilder SQL against a hand-built
 * OMOP fixture with a hand-derived expected cohort — the second
 * fixture-driven cohort spec (pattern proven by HeartFailureCohortSpec).
 * Covid is the one definition that enters through the MEASUREMENT branch
 * (value_as_concept_id → concept_name) and merges branches with `UNION`
 * before a second window — neither is exercised by the HF fixture:
 *   p1  two 'Detected' PCR visits          → earliest wins, index = +1 day
 *   p2  COVID condition only               → condition branch
 *   p3  condition visit EARLIER than its separate measurement visit →
 *       UNION yields two branch rows; the outer FIRST window must pick the
 *       condition one (cross-branch merge, not per-branch first)
 *   p4  COVID test, value 'Not detected'   → excluded by concept_name
 *   p5  value 'Positve' (sic)              → INCLUDED — the reference's
 *       typo is load-bearing dialect parity (covid.py:21); "fixing" it
 *       flips this person out of the cohort
 *   p6  'Detected' on a non-COVID measurement concept → excluded
 * A dialect drift in the nested FIRST() OVER windows, DATE_ADD's +1-day
 * indexing, `UNION` dedup, or the value-concept join breaks these
 * assertions.
 *
 * Reference: /root/reference/src/cehrbert_data/cohorts/covid.py:1-43,
 * spark_app_base.py:89-273 (builder orchestration).
 */
class CovidCohortSpec extends SparkSpecBase {

  private def d(s: String) = Date.valueOf(s)

  override def afterAll(): Unit = {
    spark.catalog.dropGlobalTempView("covid19")
    super.afterAll()
  }

  test("Covid cohort SQL end-to-end on a hand-derived fixture") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft-covid-omop").toString
    val out = Files.createTempDirectory("graft-covid-out").toString

    // value concepts: the measurement branch joins value_as_concept_id →
    // concept_name IN ('Detected', 'Positve')
    val Detected = 9900001L
    val Positve = 9900002L // reference's literal typo — see scaladoc
    val NotDetected = 9900003L
    val concept = Seq(
      (Detected, "Detected"), (Positve, "Positve"), (NotDetected, "Not detected"))
      .toDF("concept_id", "concept_name")
    // unused by this definition, but DefaultDependency instantiates them
    val conceptAncestor = Seq((1L, 1L))
      .toDF("ancestor_concept_id", "descendant_concept_id")
    val conceptRelationship = Seq((1L, 1L, "Maps to"))
      .toDF("concept_id_1", "concept_id_2", "relationship_id")

    val person = Seq(1L, 2L, 3L, 4L, 5L, 6L)
      .map(p => (p, 1980, null.asInstanceOf[Timestamp], 8507L, 8527L))
      .toDF("person_id", "year_of_birth", "birth_datetime",
        "gender_concept_id", "race_concept_id")
    val visits = Seq(
      (101L, 1L, d("2020-03-01")), (102L, 1L, d("2020-04-01")),
      (201L, 2L, d("2020-05-10")),
      (301L, 3L, d("2020-02-01")), (302L, 3L, d("2020-03-15")),
      (401L, 4L, d("2020-06-01")),
      (501L, 5L, d("2020-07-01")),
      (601L, 6L, d("2020-08-01")))
      .toDF("visit_occurrence_id", "person_id", "visit_start_date")
    val measurement = Seq(
      (1L, 101L, 723475L, Detected),     // p1 earliest PCR visit
      (1L, 102L, 706178L, Detected),     // p1 later PCR visit — must lose
      (3L, 302L, 723473L, Detected),     // p3 measurement arm (later visit)
      (4L, 401L, 723475L, NotDetected),  // excluded: negative result
      (5L, 501L, 706163L, Positve),      // the typo'd positive label
      (6L, 601L, 3020891L, Detected))    // excluded: not a COVID test
      .toDF("person_id", "visit_occurrence_id", "measurement_concept_id",
        "value_as_concept_id")
    val conditions = Seq(
      (2L, 201L, 37311061L),  // p2 condition-only entry
      (3L, 301L, 37311061L))  // p3 condition arm (earlier visit)
      .toDF("person_id", "visit_occurrence_id", "condition_concept_id")
    val obsPeriod = Seq(1L, 2L, 3L, 4L, 5L, 6L)
      .map(p => (p, d("2019-01-01"), d("2021-12-31")))
      .toDF("person_id", "observation_period_start_date",
        "observation_period_end_date")

    for ((name, df) <- Seq(
        "concept" -> concept, "concept_ancestor" -> conceptAncestor,
        "concept_relationship" -> conceptRelationship, "person" -> person,
        "visit_occurrence" -> visits, "condition_occurrence" -> conditions,
        "measurement" -> measurement, "observation_period" -> obsPeriod))
      df.write.mode("overwrite").parquet(s"$in/$name")

    val builder = new BaseCohortBuilder(
      Covid.queryBuilder(), in, out,
      dateLowerBound = "2020-01-01", dateUpperBound = "2021-01-01",
      ageLowerBound = 0, ageUpperBound = 100,
      priorObservationPeriod = 0, postObservationPeriod = 0)
    builder.build(spark)

    val got = builder.loadCohort(spark)
      .select("person_id", "age", "index_date", "visit_occurrence_id")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.get(2).toString.substring(0, 10), r.getLong(3))).toSet
    // index_date = earliest qualifying visit + 1 day (DATE_ADD in covid.py)
    assert(got === Set(
      (1L, 40, "2020-03-02", 101L),
      (2L, 40, "2020-05-11", 201L),
      (3L, 40, "2020-02-02", 301L), // condition arm beat the measurement arm
      (5L, 40, "2020-07-02", 501L)))
  }
}
