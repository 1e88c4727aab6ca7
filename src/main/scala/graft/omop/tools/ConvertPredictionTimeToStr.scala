package graft.omop.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/**
 * Parquet re-encode: rewrite datasets under an input tree with snappy
 * compression, converting the `prediction_time` timestamp column to an
 * ISO-8601 microsecond string to sidestep downstream timezone ambiguity.
 *
 * Reference: tools/convert_prediction_time_to_str.py:19-60. The reference
 * converts file-by-file in a local process pool (polars→pandas); this port
 * keeps the dataset layout — every directory under the input containing
 * parquet files is rewritten as one distributed read→cast→write, preserving
 * its relative path — which is the same transformation executed by the
 * cluster instead of the submitting host.
 */
object ConvertPredictionTimeToStr {

  /** `prediction_time` → "yyyy-MM-dd HH:mm:ss.SSSSSS" string (no-op when the
    * column is absent, e.g. auxiliary tables mixed into the tree). */
  def convert(df: DataFrame): DataFrame =
    if (!df.columns.contains("prediction_time")) df
    else df.withColumn("prediction_time",
      date_format(col("prediction_time").cast(TimestampType),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))

  /** Directories (relative to `input`) that directly contain parquet files. */
  def discoverDatasets(spark: SparkSession, input: String): Seq[String] = {
    val fs = new Path(input).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = fs.makeQualified(new Path(input))
    if (!fs.exists(root)) return Seq.empty
    val it = fs.listFiles(root, /* recursive = */ true)
    val dirs = scala.collection.mutable.SortedSet.empty[String]
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (name.endsWith(".parquet") || name.endsWith(".pq")) {
        val rel = root.toUri.relativize(fs.makeQualified(f.getPath.getParent).toUri).getPath
        dirs += rel.stripSuffix("/")
      }
    }
    dirs.toSeq
  }

  def run(spark: SparkSession, input: String, output: String): Seq[String] = {
    val datasets = discoverDatasets(spark, input)
    datasets.foreach { rel =>
      val src = if (rel.isEmpty) input else s"$input/$rel"
      val dst = if (rel.isEmpty) output else s"$output/$rel"
      convert(spark.read.parquet(src))
        .write.mode("overwrite").option("compression", "snappy").parquet(dst)
    }
    datasets
  }
}
