package graft.streaming

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The sinks' persistent "seen" state: bucketed so the per-batch join is
  * one-sided (only the micro-batch shuffles), self-compacting so a
  * long-lived stream cannot explode into per-batch small files. */
class BucketedLedgerSpec extends SparkSpecBase {

  import spark.implicits._

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  /** Drop the catalog entry AND its warehouse directory: a previous test
    * JVM's managed-table data outlives the in-memory catalog, and a fresh
    * CREATE then fails LOCATION_ALREADY_EXISTS. */
  private def dropLedger(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"DROP TABLE IF EXISTS ${name}__compacting")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    Seq(name, name + "__compacting").foreach { t =>
      val p = new org.apache.hadoop.fs.Path(wh, t)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("append/read roundtrip; appends are pre-partitioned to <= buckets files") {
    val l = BucketedLedger("bl_roundtrip", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_roundtrip")
    assert(l.readOrEmpty(spark).count() === 0L)
    l.append(Seq(1L, 2L, 3L).toDF("fingerprint"))
    l.append(Seq(4L, 5L).toDF("fingerprint"))
    assert(l.readOrEmpty(spark).as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(l.fileCount(spark) <= 8, "two appends must add at most 2 x buckets files")
  }

  test("anti-join against the ledger shuffles ONLY the batch side") {
    val l = BucketedLedger("bl_onesided", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_onesided")
    l.append((1L to 100L).toDF("fingerprint"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val batch = (90L to 110L).toDF("fingerprint")
      val fresh = batch.join(l.readOrEmpty(spark), Seq("fingerprint"), "left_anti")
      val plan = formatted(fresh)
      assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length === 1,
        s"expected exactly one shuffle (the batch side), plan:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"ledger scan lost its bucketing, plan:\n$plan")
      assert(fresh.as[Long].collect().toSet === (101L to 110L).toSet)
    }
  }

  test("alias over the bucketed scan keeps the join one-sided (sink shape)") {
    val l = BucketedLedger("bl_alias", buckets = 4,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT")
    dropLedger("bl_alias")
    l.append((1L to 50L).toDF("fingerprint"))
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val seen = l.readOrEmpty(spark).select(col("fingerprint").as("dup_group"))
      val batch = (40L to 60L).toDF("dup_group")
      val plan = formatted(batch.join(seen, Seq("dup_group"), "left_anti"))
      assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length === 1,
        s"aliased ledger side must not re-shuffle, plan:\n$plan")
    }
  }

  test("compaction rewrites to exactly `buckets` files and keeps the table bucketed") {
    val l = BucketedLedger("bl_compact", buckets = 2,
      keys = Seq("fingerprint"), schemaDdl = "fingerprint BIGINT",
      compactAfterFiles = 5)
    dropLedger("bl_compact")
    (0 until 4).foreach { i =>
      l.append((i * 10L until i * 10L + 10L).toDF("fingerprint"))
      val did = l.maybeCompact(spark)
      info(s"iter $i: files=${l.fileCount(spark)} compacted=$did")
    }
    assert(l.fileCount(spark) <= 5,
      s"compaction never brought file count down: ${l.fileCount(spark)}")
    assert(l.readOrEmpty(spark).as[Long].collect().toSet === (0L until 40L).toSet)
    // post-compaction the join must still be one-sided
    withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
      val plan = formatted(
        Seq(1L).toDF("fingerprint").join(l.readOrEmpty(spark), Seq("fingerprint"), "left_anti"))
      assert(plan.contains("Bucketed: true"), s"compaction lost bucket metadata:\n$plan")
      assert("\\(\\d+\\) Exchange\\b".r.findAllIn(plan).length === 1)
    }
  }
}
