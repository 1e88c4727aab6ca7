package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** Bucketed tables must join WITHOUT a shuffle: both sides pre-partitioned
  * on disk, so the physical plan carries no Exchange. */
class BucketingSpec extends SparkSpecBase {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a previously crashed run can leave the managed location behind with no
    // catalog entry; saveAsTable then refuses the location
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
  }

  test("equi-join of two co-bucketed tables has no shuffle exchange") {
    import spark.implicits._
    dropTable("bspec_orders")
    dropTable("bspec_customer")
    val orders = (1L to 1000L).map(i => (i, i % 100, i * 10.0)).toDF("o_orderkey", "o_custkey", "o_total")
    val customer = (0L until 100L).map(i => (i, s"c$i")).toDF("c_custkey", "c_name")
    Bucketing.writeBucketed(orders, "bspec_orders", 8, Seq("o_custkey"), Seq("o_custkey"))
    Bucketing.writeBucketed(customer, "bspec_customer", 8, Seq("c_custkey"), Seq("c_custkey"))

    // disable auto-broadcast so the co-located sort-merge path is what gets
    // planned (a broadcast join wouldn't exercise bucketing at all — and at
    // real scale neither side of a fact-fact join is broadcastable)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.table(spark, "bspec_orders")
        .join(Bucketing.table(spark, "bspec_customer"),
          col("o_custkey") === col("c_custkey"))
      // force the final plan (AQE finalizes on execution)
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // aggregation on the bucket key is exchange-free too
    val agg = Bucketing.table(spark, "bspec_orders")
      .groupBy("o_custkey").agg(sum("o_total"))
    assert(agg.count() == 100)
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))

    dropTable("bspec_orders")
    dropTable("bspec_customer")
  }
}
