package graft.tools

import graft.core.GraftSession
import graft.functions.TimeTokens.AttType
import graft.omop.{GenerateTrainingData, OmopSchema}

/** Scratch probe main: second golden configuration — cehr_bert inter-visit
  * ATT, mix inpatient ATT, age-group demographic tokens. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe")
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = GenerateTrainingData.Config(
      inputFolder = "/root/reference/sample_data/omop_sample",
      outputFolder = Some("/tmp/graft_omop_run2"),
      domainTableList = Seq(OmopSchema.ConditionOccurrence, OmopSchema.DrugExposure,
        OmopSchema.ProcedureOccurrence),
      dateFilter = Some("1985-01-01"),
      includeVisitType = true,
      attType = AttType.CehrBert,
      inpatientAttType = AttType.Mix,
      excludeDemographic = false,
      useAgeGroup = true,
      includeInpatientHourToken = false,
      applyAgeFilter = true,
      withDrugRollup = true)
    val seq = GenerateTrainingData.run(spark, cfg, gptPatientSequence = true)
    GenerateTrainingData.write(spark, cfg, seq, "/tmp/graft_omop_run2")
    println("[probe] wrote /tmp/graft_omop_run2/patient_sequence")
    spark.stop()
  }
}
