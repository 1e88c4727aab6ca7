package graft.tools

import graft.core.GraftSession
import graft.functions.TimeTokens.AttType
import graft.omop.{GenerateTrainingData, OmopSchema}

/**
 * Golden-config runner: produces the graft side of both end-to-end golden
 * comparisons against the upstream run (see scripts/golden_compare.py).
 *
 *  - config 1 → /tmp/graft_omop_out2: day ATT + day inpatient ATT +
 *    inpatient hour tokens + demographics;
 *  - config 2 → /tmp/graft_omop_run2: cehr_bert ATT + mix inpatient ATT +
 *    age-group demographic tokens.
 */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe")
    spark.sparkContext.setLogLevel("ERROR")

    val base = GenerateTrainingData.Config(
      inputFolder = "/root/reference/sample_data/omop_sample",
      outputFolder = None,
      domainTableList = Seq(OmopSchema.ConditionOccurrence, OmopSchema.DrugExposure,
        OmopSchema.ProcedureOccurrence),
      dateFilter = Some("1985-01-01"),
      includeVisitType = true,
      applyAgeFilter = true,
      withDrugRollup = true)

    val config1 = base.copy(
      outputFolder = Some("/tmp/graft_omop_out2"),
      attType = AttType.Day,
      inpatientAttType = AttType.Day,
      excludeDemographic = false,
      includeInpatientHourToken = true)
    val config2 = base.copy(
      outputFolder = Some("/tmp/graft_omop_run2"),
      attType = AttType.CehrBert,
      inpatientAttType = AttType.Mix,
      excludeDemographic = false,
      useAgeGroup = true,
      includeInpatientHourToken = false)
    // config 3: death tokens, on the death-augmented copy of the sample CDM
    // (scripts/golden_compare.py synthesizes /tmp/omop_sample_death)
    val config3 = base.copy(
      inputFolder = "/tmp/omop_sample_death",
      outputFolder = Some("/tmp/graft_omop_run3"),
      attType = AttType.Day,
      inpatientAttType = AttType.Day,
      excludeDemographic = false,
      includeDeath = true)
    // config 4: problem-list disconnect + re-link + artificial visits, on a
    // copy of the sample CDM with injected orphan condition events
    val config4 = base.copy(
      inputFolder = "/tmp/omop_sample_av",
      outputFolder = Some("/tmp/graft_omop_run4"),
      attType = AttType.Day,
      inpatientAttType = AttType.Day,
      excludeDemographic = false,
      shouldConstructArtificialVisits = true,
      disconnectProblemListRecords = true)

    // config 5: visit VS/VE tokens excluded
    val config5 = base.copy(
      outputFolder = Some("/tmp/graft_omop_run5"),
      attType = AttType.Day,
      inpatientAttType = AttType.Day,
      excludeDemographic = false,
      excludeVisitTokens = true)
    // config 6: classic BERT week-binned representation
    val config6 = base.copy(
      outputFolder = Some("/tmp/graft_omop_run6"),
      attType = AttType.Day,
      inpatientAttType = AttType.Day,
      excludeDemographic = false,
      isNewPatientRepresentation = false,
      isClassicBert = true)

    Seq(config1, config2, config3, config4, config5, config6).foreach { cfg =>
      val seq = GenerateTrainingData.run(spark, cfg, gptPatientSequence = true)
      GenerateTrainingData.write(spark, cfg, seq, cfg.outputFolder.get)
      println(s"[probe] wrote ${cfg.outputFolder.get}/patient_sequence")
    }
    spark.stop()
  }
}
