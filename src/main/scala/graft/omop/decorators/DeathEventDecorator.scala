package graft.omop.decorators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, when}

import graft.functions.TimeTokens
import graft.functions.TimeTokens.AttType
import graft.omop.OmopSchema._

/**
 * Appends a terminal synthetic visit [VS][DEATH][VE] (plus an ATT gap token)
 * after each deceased patient's last [VE] event.
 *
 * Reference: /root/reference/src/cehrbert_data/decorators/
 * death_event_decorator.py:32-126. The synthetic visit id is minted above
 * max(visit_occurrence_id) via a global row_number — at extreme scale the
 * single-partition window is the reference's own hazard (SURVEY §4); rows
 * here are one per deceased patient, so the window input is small.
 */
final class DeathEventDecorator(
    death: Option[DataFrame],
    attType: AttType,
    val persistenceFolder: Option[String] = None)
  extends PatientEventDecorator {

  override def name: String = "death_tokens"

  override protected def decorateImpl(patientEvents: DataFrame): DataFrame = {
    if (death.isEmpty) return patientEvents

    val deathRecords = patientEvents.join(
      death.get.select("person_id", "death_date"), "person_id")

    val maxVisitOccurrenceId = deathRecords
      .select(F.max("visit_occurrence_id").as("max_visit_occurrence_id"))

    val lastVeEvents = deathRecords
      .where(col("standard_concept_id") === VeToken)
      .withColumn("record_rank",
        F.row_number().over(
          Window.partitionBy("person_id", "cohort_member_id")
            .orderBy(F.desc("datetime"), F.desc("visit_rank_order"))))
      .where(col("record_rank") === 1)
      .drop("record_rank")
      .cache()

    val artificialVisitId =
      F.row_number().over(Window.partitionBy(lit(0)).orderBy("person_id", "cohort_member_id")) +
        col("max_visit_occurrence_id")

    val deathBase = lastVeEvents.crossJoin(maxVisitOccurrenceId)
      .withColumn("visit_occurrence_id", artificialVisitId)
      .withColumn("standard_concept_id", lit(DeathToken))
      .withColumn("domain", lit("death"))
      .withColumn("visit_rank_order", lit(100) + col("visit_rank_order"))
      .withColumn("priority", lit(DeathTokenPriority))
      .withColumn("event_group_id", lit(NA))
      .drop("max_visit_occurrence_id")

    val vsRecords = deathBase
      .withColumn("standard_concept_id", lit(VsToken))
      .withColumn("priority", lit(VsTokenPriority))
      .withColumn("unit", lit(NA))
      .withColumn("event_group_id", lit(NA))

    val veRecords = deathBase
      .withColumn("standard_concept_id", lit(VeToken))
      .withColumn("priority", lit(VeTokenPriority))
      .withColumn("unit", lit(NA))
      .withColumn("event_group_id", lit(NA))

    // ATT gap between the last event and death (clamped non-negative)
    val deathEvents = deathBase
      .withColumn("death_date",
        when(col("death_date") < col("date"), col("date")).otherwise(col("death_date")))
      .withColumn("time_delta", F.datediff(col("death_date"), col("date")))
      .withColumn("standard_concept_id", TimeTokens.token(attType, col("time_delta")))
      .withColumn("priority", lit(AttTokenPriority))
      .withColumn("unit", lit(NA))
      .withColumn("event_group_id", lit(NA))
      .drop("time_delta")

    val newTokens = tryPersist(
      deathEvents.unionByName(vsRecords).unionByName(deathBase).unionByName(veRecords)
        .drop("death_date"),
      "death_events")
    validateEvents(newTokens, name)

    patientEvents.unionByName(newTokens)
  }
}
