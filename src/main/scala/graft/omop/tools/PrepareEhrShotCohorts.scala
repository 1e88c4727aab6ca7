package graft.omop.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * Batch feature extraction over a directory of EHRShot benchmark cohorts:
 * every subdirectory holding a `labeled_patients.csv` becomes one
 * [[ExtractFeatures]] run named after the subdirectory, skipping cohorts
 * whose output already exists.
 *
 * Reference: tools/prepare_ehrshot_cohorts.py:1-22 (a driver loop around
 * extract_features.main with cohort_dir/cohort_name swapped per subfolder).
 */
object PrepareEhrShotCohorts {

  /** (cohortName, labeledPatientsCsvPath) for each prepared subdirectory. */
  def discoverCohorts(spark: SparkSession, cohortDir: String): Seq[(String, String)] = {
    val root = new Path(cohortDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toIndexedSeq
      .filter(_.isDirectory)
      .map(st => (st.getPath.getName, new Path(st.getPath, "labeled_patients.csv")))
      .filter { case (_, csv) => fs.exists(csv) }
      .map { case (name, csv) => (name, csv.toString) }
      .sortBy(_._1)
  }

  /** Runs every discovered cohort through ExtractFeatures with `base`'s
    * settings; returns the cohort names actually run (pre-existing outputs
    * are skipped, as in the reference). */
  def run(spark: SparkSession, cohortDir: String,
          base: ExtractFeatures.Config): Seq[String] = {
    val fs = new Path(base.outputFolder)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    discoverCohorts(spark, cohortDir).flatMap { case (name, csvPath) =>
      if (fs.exists(new Path(s"${base.outputFolder}/$name"))) None
      else {
        ExtractFeatures.run(spark,
          base.copy(cohortDir = csvPath, cohortName = name))
        Some(name)
      }
    }
  }
}
