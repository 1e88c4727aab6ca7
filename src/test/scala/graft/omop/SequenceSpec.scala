package graft.omop

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.functions.TimeTokens.AttType
import graft.omop.decorators._

/**
 * End-to-end decorator-chain test on a hand-built OMOP fixture
 * (fixture-DataFrame style mirrors the reference's unit tests; expectations
 * derived from the reference decorator semantics under
 * /root/reference/src/cehrbert_data/decorators/).
 *
 * Fixture:
 *  - patient 1: two outpatient visits (9202), 10-day gap between end of v1
 *    and start of v2; one condition event in each.
 *  - patient 2: one inpatient visit (9201) spanning 2 days with events on
 *    both days (inpatient ATT "i-D1" expected between the day groups),
 *    discharged home (8536), then death 5 days after discharge.
 */
class SequenceSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  private lazy val visitOccurrence: DataFrame = Seq(
    // (visit_occurrence_id, person_id, visit_concept_id, start_date, start_dt, end_date, end_dt, discharged_to)
    (101L, 1L, 9202, d("2020-01-01"), ts("2020-01-01 09:00:00"), d("2020-01-01"), ts("2020-01-01 10:00:00"), null.asInstanceOf[Integer]),
    (102L, 1L, 9202, d("2020-01-11"), ts("2020-01-11 14:00:00"), d("2020-01-11"), ts("2020-01-11 15:00:00"), null.asInstanceOf[Integer]),
    (201L, 2L, 9201, d("2020-03-01"), ts("2020-03-01 08:00:00"), d("2020-03-02"), ts("2020-03-02 12:00:00"), Integer.valueOf(8536)))
    .toDF("visit_occurrence_id", "person_id", "visit_concept_id", "visit_start_date",
      "visit_start_datetime", "visit_end_date", "visit_end_datetime", "discharged_to_concept_id")

  private lazy val person: DataFrame = Seq(
    (1L, ts("1980-06-15 00:00:00"), 8507, 8527),
    (2L, ts("1970-01-01 00:00:00"), 8532, 8516))
    .toDF("person_id", "birth_datetime", "gender_concept_id", "race_concept_id")

  private lazy val death: DataFrame = Seq((2L, d("2020-03-07")))
    .toDF("person_id", "death_date")

  /** Raw events as extract_ehr_records would emit them (+ visit_concept_id,
    * age, cohort_member_id as generate_training_data adds). */
  private lazy val patientEvents: DataFrame = Seq(
    (1L, "C1", d("2020-01-01"), ts("2020-01-01 09:30:00"), 101L, "condition", 9202),
    (1L, "C2", d("2020-01-11"), ts("2020-01-11 14:30:00"), 102L, "condition", 9202),
    (2L, "C3", d("2020-03-01"), ts("2020-03-01 09:00:00"), 201L, "condition", 9201),
    (2L, "C4", d("2020-03-02"), ts("2020-03-02 10:00:00"), 201L, "condition", 9201))
    .toDF("person_id", "standard_concept_id", "date", "datetime",
      "visit_occurrence_id", "domain", "visit_concept_id")
    .withColumn("event_group_id", lit(null).cast("string"))
    .withColumn("number_as_value", lit(null).cast("float"))
    .withColumn("concept_as_value", lit(null).cast("string"))
    .withColumn("unit", lit(OmopSchema.NA))
    .withColumn("age", lit(40))
    .withColumn("cohort_member_id", col("person_id"))

  private lazy val visitWithAge: DataFrame =
    visitOccurrence.join(
        person.select("person_id", "birth_datetime", "race_concept_id", "gender_concept_id"),
        "person_id")
      .withColumn("age",
        ceil(months_between(col("visit_start_date"), col("birth_datetime")) / lit(12)))
      .drop("birth_datetime")

  test("ClinicalEventDecorator attaches ranks, orders, segments per contract") {
    val out = new ClinicalEventDecorator(visitWithAge).decorate(patientEvents)
    assert(out.columns.toSet == OmopSchema.RequiredEventColumns)

    val p1 = out.filter($"person_id" === 1).orderBy("visit_rank_order").collect()
    assert(p1.map(_.getAs[Int]("visit_rank_order")).toSeq == Seq(1, 2))
    assert(p1.map(_.getAs[Int]("visit_segment")).toSeq == Seq(2, 1))
    // outpatient: concept_order constant 1
    assert(p1.forall(_.getAs[Int]("concept_order") == 1))
    // inpatient patient 2: two events on different days → concept orders 1, 2
    val p2 = out.filter($"person_id" === 2).orderBy("concept_order").collect()
    assert(p2.map(_.getAs[Int]("concept_order")).toSeq == Seq(1, 2))
    assert(p2.map(_.getAs[Int]("visit_concept_order")).toSeq == Seq(1, 2))
  }

  test("full ATT sequence matches reference token layout (cehr_bert, mix inpatient)") {
    val seqData = Sequences.createSequenceDataWithAtt(
      patientEvents, visitWithAge,
      includeVisitType = true,
      death = Some(death),
      attType = AttType.CehrBert,
      inpatientAttType = AttType.Mix)

    val rows = seqData.collect().map(r =>
      r.getAs[Long]("person_id") -> r.getSeq[String](r.fieldIndex("concept_ids"))).toMap

    // patient 1: [VS] 9202 C1 [VE] | W1 [VS] 9202 C2 [VE]
    // (gap = 2020-01-11 − 2020-01-01 = 10 days → floor(10/7) = W1)
    assert(rows(1L) == Seq("[VS]", "9202", "C1", "[VE]", "W1", "[VS]", "9202", "C2", "[VE]"))

    // patient 2 (inpatient): [VS] 9201 C3 i-D1 C4 8536 [VE] then death visit
    // W0 (5-day gap → floor(5/7)=0) [VS] [DEATH] [VE]
    assert(rows(2L) == Seq("[VS]", "9201", "C3", "i-D1", "C4", "8536", "[VE]",
      "W0", "[VS]", "[DEATH]", "[VE]"))
  }

  test("demographic decorator prepends year/age/gender/race prompt tokens") {
    val seqData = Sequences.createSequenceDataWithAtt(
      patientEvents, visitWithAge,
      includeVisitType = false,
      patientDemographic = Some(person),
      excludeDemographic = false,
      attType = AttType.Day,
      inpatientAttType = AttType.Day)

    val p1 = seqData.filter($"person_id" === 1).collect()(0)
    val ids = p1.getSeq[String](p1.fieldIndex("concept_ids"))
    assert(ids.take(4) == Seq("year:2020", "age:40", "8507", "8527"))
    // day tokens: 10-day gap → D10
    assert(ids.contains("D10"))
  }

  test("createSequenceData (classic) orders by week bins") {
    val clinical = new ClinicalEventDecorator(visitWithAge).decorate(patientEvents)
    val seqData = Sequences.createSequenceData(clinical)
    val p1 = seqData.filter($"person_id" === 1).collect()(0)
    assert(p1.getSeq[String](p1.fieldIndex("concept_ids")) == Seq("C1", "C2"))
    assert(p1.getAs[Int]("num_of_visits") == 2)
    assert(p1.getAs[Long]("num_of_concepts") == 2L)
  }

  test("createConceptFrequencyData counts per-concept frequencies") {
    val freq = Sequences.createConceptFrequencyData(patientEvents)
    val p2 = freq.filter($"person_id" === 2).collect()(0)
    val concepts = p2.getSeq[String](p2.fieldIndex("concept_ids"))
    assert(concepts.toSet == Set("C3", "C4"))
    assert(p2.getAs[Long]("num_of_visits") == 1)
  }

  test("createVisitPersonJoin computes readmission and prolonged-stay flags") {
    val visits = Seq(
      (1L, 301L, 9201, d("2020-01-01"), d("2020-01-10")),
      (1L, 302L, 9201, d("2020-01-20"), d("2020-01-21")),
      (1L, 303L, 9202, d("2020-05-01"), d("2020-05-01")))
      .toDF("person_id", "visit_occurrence_id", "visit_concept_id",
        "visit_start_date", "visit_end_date")
    val persons = Seq((1L, ts("1980-01-01 00:00:00"), 1980))
      .toDF("person_id", "birth_datetime", "year_of_birth")

    val out = Sequences.createVisitPersonJoin(persons, visits)
      .orderBy("visit_rank_order").collect()
    assert(out.map(_.getAs[Int]("is_inpatient")).toSeq == Seq(1, 1, 0))
    // visit 302 starts 10 days after 301 ends → readmission
    assert(out.map(_.getAs[Int]("is_readmission")).toSeq == Seq(0, 1, 0))
    assert(out.map(_.getAs[Int]("prolonged_stay")).toSeq == Seq(1, 0, 0))
    assert(out(1).getAs[String]("time_interval_att") == "W1")
  }
}
