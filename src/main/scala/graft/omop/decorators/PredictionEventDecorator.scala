package graft.omop.decorators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.IntegerType

import graft.omop.OmopSchema._

/**
 * Appends one terminal "[END]" token per cohort member, ranked after every
 * real event (LARGE_INTEGER orders, priority 1000).
 *
 * Reference: /root/reference/src/cehrbert_data/decorators/
 * prediction_token_decorator.py:27-73 (currently disabled in the reference's
 * default chain at spark_utils.py:508 — exposed here for parity).
 */
final class PredictionEventDecorator(
    cohortIndex: Option[DataFrame],
    val persistenceFolder: Option[String] = None)
  extends PatientEventDecorator {

  private val LargeInteger = 1000000

  override def name: String = "prediction_events"

  override protected def decorateImpl(patientEvents: DataFrame): DataFrame = {
    if (cohortIndex.isEmpty) return patientEvents

    val predictionEvents = tryPersist(
      patientEvents.select("person_id", "cohort_member_id").distinct().select(
        F.col("person_id"),
        F.col("cohort_member_id"),
        lit(0).as("visit_occurrence_id"),
        F.current_date().as("date"),
        F.current_date().as("visit_start_date"),
        F.current_timestamp().as("visit_start_datetime"),
        lit(0).cast(IntegerType).as("visit_concept_id"),
        lit("prediction_token").as("domain"),
        lit(0.0).as("number_as_value"),
        lit("0").as("concept_as_value"),
        lit(0).as("is_numeric_type"),
        lit(0).as("concept_value_mask"),
        lit(0).as("mlm_skip_value"),
        lit(0).as("age"),
        lit(0).as("visit_segment"),
        lit(LargeInteger).as("visit_rank_order"),
        lit(LargeInteger).as("date_in_week"),
        F.current_timestamp().as("datetime"),
        lit(EndToken).as("standard_concept_id"),
        lit(LargeInteger).as("visit_concept_order"),
        lit(LargeInteger).as("concept_order"),
        lit(PredictionTokenPriority).as("priority"),
        lit(NA).as("unit"),
        lit(NA).as("event_group_id")),
      "prediction_events")

    patientEvents.unionByName(predictionEvents)
  }
}
