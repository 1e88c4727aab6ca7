package graft.omop

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.omop.tools.EhrShotToOmop

/** Operator-level specs for the EHRShot→OMOP converter, mirroring the
  * scenarios in the reference's tests/unit_tests/test_ehrshot_to_omop.py. */
class EhrShotToOmopSpec extends SparkSpecBase {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val concept: DataFrame = Seq(
    (8507, "Gender", "Gender", "M", "Male"),
    (8532, "Gender", "Gender", "F", "Female"),
    (8527, "Race", "Race", "5", "White"),
    (38003564, "Ethnicity", "Ethnicity", "Not Hispanic", "Not Hispanic"),
    (9529, "Unit", "UCUM", "kg", "kilogram"),
    (45878583, "Meas Value", "LOINC", "LA6576-8", "Positive"),
    (320128, "Condition", "SNOMED", "38341003", "Essential hypertension"))
    .toDF("concept_id", "domain_id", "vocabulary_id", "concept_code", "concept_name")

  test("convertCodeToOmopConcept maps VOCAB/CODE strings, unmatched → 0") {
    val data = Seq((1L, "SNOMED/38341003"), (2L, "SNOMED/99999"), (3L, "ICD10/X"))
      .toDF("id", "code")
    val out = EhrShotToOmop.convertCodeToOmopConcept(data, concept, "code")
      .orderBy("id").collect()
    assert(out.map(_.getAs[Int]("concept_id")).toSeq == Seq(320128, 0, 0))
  }

  test("mapUnit attaches Unit-domain concept ids, unmatched → 0") {
    val data = Seq((1L, "kg"), (2L, "banana")).toDF("id", "unit")
    val out = EhrShotToOmop.mapUnit(data, concept).orderBy("id").collect()
    assert(out.map(_.getAs[Int]("unit_concept_id")).toSeq == Seq(9529, 0))
  }

  test("extractValue routes numeric vs categorical vs null values") {
    val data = Seq(
      (1L, "72.5", "kg"),
      (2L, "Positive", null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "value", "unit")
    val out = EhrShotToOmop.extractValue(data, concept).orderBy("id").collect()

    assert(out(0).getAs[Float]("value_as_number") == 72.5f)
    assert(out(0).getAs[Int]("unit_concept_id") == 9529)
    assert(out(0).isNullAt(out(0).fieldIndex("value_as_concept_id")))

    assert(out(1).isNullAt(out(1).fieldIndex("value_as_number")))
    assert(out(1).getAs[Int]("value_as_concept_id") == 45878583)

    assert(out(2).isNullAt(out(2).fieldIndex("value_as_number")))
    assert(out(2).isNullAt(out(2).fieldIndex("value_as_concept_id")))
  }

  test("dropDuplicateVisits keeps the highest-priority visit per id") {
    val visits = Seq(
      (100L, "Visit/OP"), (100L, "Visit/IP"),
      (200L, "Visit/ER"), (200L, "Visit/OP"),
      (300L, "Visit/OP"))
      .toDF("visit_id", "code")
    val out = EhrShotToOmop.dropDuplicateVisits(visits)
      .orderBy("visit_id").collect()
    assert(out.map(r => r.getAs[Long]("visit_id") -> r.getAs[String]("code")).toSeq ==
      Seq(100L -> "Visit/IP", 200L -> "Visit/ER", 300L -> "Visit/OP"))
  }

  test("createOmopPerson assembles demographics from coded rows") {
    val ehr = Seq(
      (1, ts("1980-03-15 00:00:00"), "SNOMED/3950001", "person"),
      (1, ts("1980-03-15 00:00:00"), "Gender/M", "person"),
      (1, ts("1980-03-15 00:00:00"), "Race/5", "person"),
      (1, ts("1980-03-15 00:00:00"), "Ethnicity/Not Hispanic", "person"))
      .toDF("patient_id", "start", "code", "omop_table")
    val out = EhrShotToOmop.createOmopPerson(ehr, concept).collect()(0)
    assert(out.getAs[Int]("person_id") == 1)
    assert(out.getAs[Int]("year_of_birth") == 1980)
    assert(out.getAs[Int]("gender_concept_id") == 8507)
    assert(out.getAs[Int]("race_concept_id") == 8527)
    assert(out.getAs[Int]("ethnicity_concept_id") == 38003564)
  }

  test("generateVisitId links events to enclosing inpatient visits and mints artificial ids") {
    val data = Seq(
      // real inpatient visit 10: Jan 1-3
      (1, ts("2020-01-01 08:00:00"), ts("2020-01-03 12:00:00"), "Visit/IP",
        null.asInstanceOf[String], null.asInstanceOf[String], java.lang.Long.valueOf(10L), "visit_occurrence"),
      // event inside the span, no visit id → linked to 10
      (1, ts("2020-01-02 09:00:00"), null.asInstanceOf[Timestamp], "SNOMED/38341003",
        null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[java.lang.Long], "condition_occurrence"),
      // orphan event outside any span → artificial visit above max id
      (1, ts("2020-06-01 09:00:00"), null.asInstanceOf[Timestamp], "SNOMED/38341003",
        null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[java.lang.Long], "condition_occurrence"))
      .toDF("patient_id", "start", "end", "code", "value", "unit", "visit_id", "omop_table")

    val tmp = java.nio.file.Files.createTempDirectory("ehrshot").toString
    val out = EhrShotToOmop.generateVisitId(data, tmp)
    val conditions = out.filter($"omop_table" === "condition_occurrence")
      .orderBy("start").collect()
    assert(conditions(0).getAs[Long]("visit_id") == 10L)
    assert(conditions(1).getAs[Long]("visit_id") == 11L) // minted above max(10)
    // an artificial visit row exists for the orphan
    val artificial = out.filter($"omop_table" === "visit_occurrence" && $"visit_id" === 11L)
    assert(artificial.count() == 1)
  }

  test("disconnectVisitId splits visits whose records fall far outside the span") {
    // visit 20 spans Jan 1 only, but carries events in January AND March —
    // the March group must move to a freshly minted visit id
    val data = Seq(
      (1, ts("2020-01-01 08:00:00"), ts("2020-01-01 18:00:00"), "Visit/OP",
        null.asInstanceOf[String], null.asInstanceOf[String], java.lang.Long.valueOf(20L), "visit_occurrence"),
      (1, ts("2020-01-01 09:00:00"), null.asInstanceOf[Timestamp], "SNOMED/38341003",
        null.asInstanceOf[String], null.asInstanceOf[String], java.lang.Long.valueOf(20L), "condition_occurrence"),
      (1, ts("2020-03-15 09:00:00"), null.asInstanceOf[Timestamp], "SNOMED/38341003",
        null.asInstanceOf[String], null.asInstanceOf[String], java.lang.Long.valueOf(20L), "measurement"))
      .toDF("patient_id", "start", "end", "code", "value", "unit", "visit_id", "omop_table")

    val tmp = java.nio.file.Files.createTempDirectory("ehrshot_disc").toString
    val out = EhrShotToOmop.disconnectVisitId(data, tmp)

    val byTable = out.collect().groupBy(_.getAs[String]("omop_table"))
    val visits = byTable("visit_occurrence").map(_.getAs[Long]("visit_id")).toSet
    assert(visits.size == 2, s"expected visit split, got $visits")
    val jan = byTable("condition_occurrence")(0)
    val mar = byTable("measurement")(0)
    assert(jan.getAs[Long]("visit_id") != mar.getAs[Long]("visit_id"))
    assert(jan.getAs[Long]("original_visit_id") == 20L)
    assert(mar.getAs[Long]("original_visit_id") == 20L)
  }
}
