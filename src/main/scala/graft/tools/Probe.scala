package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.omop.GenerateTrainingData

/** Scratch probe main for quick local experiments. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe")
    spark.sparkContext.setLogLevel("WARN")

    // End-to-end pre-training pipeline over the reference's bundled sample
    // OMOP parquet (read-only input; outputs to /tmp).
    val cfg = GenerateTrainingData.Config(
      inputFolder = "/root/reference/sample_data/omop_sample",
      outputFolder = Some("/tmp/graft_omop_out"))
    val seq = GenerateTrainingData.run(spark, cfg, gptPatientSequence = true)
    seq.cache()
    println("[probe] patients=" + seq.count())
    seq.select(col("person_id"), col("num_of_visits"), col("num_of_concepts"),
        slice(col("concept_ids"), 1, 12).as("first_tokens"))
      .orderBy("person_id").show(25, false)
    GenerateTrainingData.write(spark, cfg, seq, "/tmp/graft_omop_out")
    println("[probe] wrote /tmp/graft_omop_out/patient_sequence")
    spark.stop()
  }
}
