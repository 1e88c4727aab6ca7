package graft.omop

import graft.SparkSpecBase

class MeasurementStatsSpec extends SparkSpecBase {

  import spark.implicits._

  test("labPrevalence computes numeric/categorical ratios per concept") {
    val m = Seq(
      (1L, 3000L, Some(1.0f), None: Option[Long], Some(10L)),
      (1L, 3000L, None, Some(45878583L), Some(11L)),
      (2L, 3000L, Some(2.0f), None, Some(12L)),
      (2L, 3001L, None, Some(0L), Some(13L)))
      .toDF("person_id", "measurement_concept_id", "value_as_number",
        "value_as_concept_id", "visit_occurrence_id")
    val c = Seq((3000L, "BNP"), (3001L, "Smoking")).toDF("concept_id", "concept_name")

    val rows = MeasurementStats.labPrevalence(m, c).collect()
      .map(r => r.getAs[Long]("measurement_concept_id") ->
        (r.getAs[Long]("freq"), r.getAs[Double]("numeric_percentage"),
          r.getAs[Double]("categorical_percentage"))).toMap
    assert(rows(3000L) == ((3L, 2.0 / 3, 1.0 / 3)))
    // value_as_concept_id = 0 does not count as categorical
    assert(rows(3001L) == ((1L, 0.0, 0.0)))
  }

  test("unitStats trims 1%/99% outliers then re-aggregates") {
    val values = (1 to 100).map(_.toFloat) :+ 100000f
    val m = values.zipWithIndex.map { case (v, i) =>
      (1L, 3000L, 8840L, v, Some(i.toLong))
    }.toDF("person_id", "measurement_concept_id", "unit_concept_id",
      "value_as_number", "visit_occurrence_id")
    val req = Seq((3000L, true)).toDF("measurement_concept_id", "is_numeric")

    val row = MeasurementStats.unitStats(m, req).collect()(0)
    // the 100000 outlier lies above the 99th percentile and is trimmed
    assert(row.getAs[Long]("measurement_freq") < values.length)
    assert(row.getAs[Double]("value_mean") < 200)
  }
}
