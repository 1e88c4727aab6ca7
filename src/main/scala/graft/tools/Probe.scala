package graft.tools

import graft.core.GraftSession
import graft.functions.TimeTokens.AttType
import graft.omop.{GenerateTrainingData, OmopSchema}

/** Scratch probe main for quick local experiments: runs the pre-training
  * pipeline with the reference integration test's exact configuration for
  * golden output comparison. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe")
    spark.sparkContext.setLogLevel("WARN")

    val cfg = GenerateTrainingData.Config(
      inputFolder = "/root/reference/sample_data/omop_sample",
      outputFolder = Some("/tmp/graft_omop_out2"),
      domainTableList = Seq(OmopSchema.ConditionOccurrence, OmopSchema.DrugExposure,
        OmopSchema.ProcedureOccurrence),
      dateFilter = Some("1985-01-01"),
      includeVisitType = true,
      attType = AttType.Day,
      inpatientAttType = AttType.Day,
      excludeDemographic = false,
      includeInpatientHourToken = true,
      applyAgeFilter = true,
      withDrugRollup = true)
    val seq = GenerateTrainingData.run(spark, cfg, gptPatientSequence = true)
    GenerateTrainingData.write(spark, cfg, seq, "/tmp/graft_omop_out2")
    println("[probe] wrote /tmp/graft_omop_out2/patient_sequence")
    spark.stop()
  }
}
