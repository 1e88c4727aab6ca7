package graft.omop

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.{col, lit, when}

/**
 * Lab statistics: concept prevalence (numeric vs categorical value ratios)
 * and outlier-trimmed per-(concept, unit) value statistics — the 1%/99%
 * approximate-percentile trim followed by mean/stddev/count re-aggregation.
 *
 * Reference: /root/reference/src/cehrbert_data/queries/measurement_queries.py:1-57
 * (SURVEY §2.4 A9/A10), expressed as DataFrame ops.
 *
 * Scale: both are two-phase aggregations on (concept, unit) — vocabulary-
 * cardinality grouping keys, so partial aggregation collapses the events
 * before the shuffle; percentile_approx is a mergeable sketch.
 */
object MeasurementStats {

  /** Per-concept frequency + numeric/categorical prevalence ratios. */
  def labPrevalence(measurement: DataFrame, concept: DataFrame): DataFrame =
    measurement
      .where(col("measurement_concept_id") =!= 0)
      .join(F.broadcast(concept.select(col("concept_id"), col("concept_name"))),
        col("measurement_concept_id") === col("concept_id"))
      .groupBy("measurement_concept_id", "concept_name")
      .agg(
        F.count(lit(1)).as("freq"),
        F.countDistinct("person_id").as("person_count"),
        (F.sum(when(col("value_as_number").isNotNull, 1).otherwise(0)) / F.count(lit(1)))
          .as("numeric_percentage"),
        (F.sum(when(col("value_as_concept_id").isNotNull && col("value_as_concept_id") =!= 0, 1)
          .otherwise(0)) / F.count(lit(1))).as("categorical_percentage"))
      .orderBy(F.desc("freq"))

  /** Outlier-trimmed stats per (concept, unit): approx 1%/99% bounds, then
    * mean/stddev/count within the bounds. */
  def unitStats(measurement: DataFrame, requiredMeasurement: DataFrame): DataFrame = {
    val numericConcepts = requiredMeasurement
      .where(col("is_numeric") === true)
      .select("measurement_concept_id").distinct()

    val percentiles = measurement
      .join(F.broadcast(numericConcepts), Seq("measurement_concept_id"), "left_semi")
      .groupBy("measurement_concept_id", "unit_concept_id")
      .agg(
        F.percentile_approx(col("value_as_number"), lit(0.01), lit(10000)).as("lower_bound"),
        F.percentile_approx(col("value_as_number"), lit(0.99), lit(10000)).as("upper_bound"))

    measurement
      .where(col("visit_occurrence_id").isNotNull)
      .where(col("unit_concept_id") =!= 0)
      .where(col("measurement_concept_id") =!= 0)
      .join(percentiles, Seq("measurement_concept_id", "unit_concept_id"))
      .where(col("value_as_number").between(col("lower_bound"), col("upper_bound")))
      .groupBy("measurement_concept_id", "unit_concept_id")
      .agg(
        F.avg("value_as_number").as("value_mean"),
        F.stddev("value_as_number").as("value_stddev"),
        F.count(lit(1)).as("measurement_freq"),
        F.first("lower_bound").as("lower_bound"),
        F.first("upper_bound").as("upper_bound"))
  }
}
