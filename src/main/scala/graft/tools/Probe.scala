package graft.tools

import graft.core.GraftSession
import graft.functions.TimeTokens.AttType
import graft.omop.cohort.PredictionCohort
import graft.omop.cohort.definitions.HfReadmission

/** Scratch probe main: runs the hf_readmission prediction cohort with the
  * reference integration test's exact arguments for golden comparison. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe")
    spark.sparkContext.setLogLevel("WARN")

    new java.io.File("/tmp/graft_hf/out").mkdirs()
    PredictionCohort.create(spark,
      PredictionCohort.Args(
        cohortName = "hf_readmission",
        inputFolder = "/root/reference/sample_data/omop_sample",
        outputFolder = "/tmp/graft_hf/out",
        dateLowerBound = "1985-01-01",
        dateUpperBound = "2023-12-31",
        ageLowerBound = 18,
        ageUpperBound = 100,
        observationWindow = 360,
        predictionStartDays = 0,
        predictionWindow = 30,
        includeVisitType = true,
        isNewPatientRepresentation = true,
        attType = AttType.CehrBert,
        inpatientAttType = AttType.Mix,
        cacheEvents = true),
      HfReadmission.target("1985-01-01"),
      HfReadmission.outcome,
      HfReadmission.DomainTableList)
    println("[probe] hf_readmission done")
    spark.stop()
  }
}
