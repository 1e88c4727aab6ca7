package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.functions.TimeTokens.AttType
import graft.omop.tools.ExtractFeatures

/** Scratch probe main: drives ExtractFeatures end-to-end — external CSV
  * labels over the bundled sample OMOP data → labeled token sequences. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe")
    spark.sparkContext.setLogLevel("ERROR")

    val labeled = ExtractFeatures.run(spark, ExtractFeatures.Config(
      cohortDir = "/tmp/graft_ef/labels.csv",
      cohortName = "ef_smoke",
      inputFolder = "/root/reference/sample_data/omop_sample",
      outputFolder = "/tmp/graft_ef/out",
      ehrTableList = Seq("condition_occurrence", "drug_exposure", "procedure_occurrence"),
      personIdColumn = "subject_id",
      indexDateColumn = "pred_time",
      labelColumn = "outcome",
      observationWindow = 360,
      attType = AttType.CehrBert,
      inpatientAttType = AttType.Mix,
      keepSamplesWithNoFeatures = true))

    println("[probe] labeled rows = " + labeled.count())
    labeled.select(col("person_id"), col("label"), col("age"),
        size(col("concept_ids")).as("n_tokens"))
      .orderBy("person_id").show(10)
    spark.stop()
  }
}
