package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/**
 * Invariants of the synthetic scale-up generator. Every scale-evidence
 * number in BENCH_NOTES.md rests on ScaleUp producing a workload whose
 * CHARACTER matches a genuinely larger scale factor, so the properties the
 * scaladoc promises are pinned here on a small (sf0.001 × 3) run:
 *
 *  - fact tables replicate N×, dimensions stay dimension-sized;
 *  - FK edges survive: o_custkey ⊆ customer, l_orderkey ⊆ orders,
 *    l_partkey/l_suppkey stay inside the UNSCALED dimension domains;
 *  - document vocabularies are pairwise disjoint across replicas (near-dup
 *    density constant — pair counts scale linearly, not quadratically);
 *  - embedding replicas are near (cosine ≈ 1) but never identical (no
 *    degenerate zero-distance ties in LSH/IVF bucketing);
 *  - the distinct l_extendedprice domain grows ~N× (the size driver of
 *    ExactQuantiles' compacted table).
 */
class ScaleUpSpec extends SparkSpecBase {

  private val src = "/root/testdata/sf0.001"
  private val n = 3
  private lazy val dst: String = {
    val d = Files.createTempDirectory("graft-scaleup-spec").toFile
    d.deleteOnExit()
    ScaleUp.scale(spark, src, d.getAbsolutePath, n)
    d.getAbsolutePath
  }

  private def srcT(t: String) = spark.read.parquet(s"$src/$t.parquet")
  private def dstT(t: String) = spark.read.parquet(s"$dst/$t.parquet")

  test("fact tables replicate Nx; dimensions stay dimension-sized") {
    for (t <- Seq("lineitem", "orders", "customer", "documents", "embeddings", "events"))
      assert(dstT(t).count() === srcT(t).count() * n, s"table $t")
    for (t <- Seq("region", "nation", "part", "supplier"))
      assert(dstT(t).count() === srcT(t).count(), s"table $t")
  }

  test("event replicas add users, not per-user history") {
    val perUser = srcT("events").groupBy("user_id").count()
      .agg(max("count")).head.getLong(0)
    val perUserScaled = dstT("events").groupBy("user_id").count()
      .agg(max("count")).head.getLong(0)
    assert(perUserScaled === perUser,
      "max per-user event count must not grow under replication")
    assert(dstT("events").select("user_id").distinct().count() ===
      srcT("events").select("user_id").distinct().count() * n)
    assert(dstT("events").select("event_id").distinct().count() ===
      dstT("events").count(), "event ids must stay unique")
  }

  test("FK edges survive replication") {
    val orders = dstT("orders")
    val lineitem = dstT("lineitem")
    assert(orders.join(dstT("customer"),
      orders("o_custkey") === col("c_custkey"), "left_anti").count() === 0L)
    assert(lineitem.join(orders,
      lineitem("l_orderkey") === col("o_orderkey"), "left_anti").count() === 0L)
    // part/supp keys cycle within the UNSCALED dimension domains
    assert(lineitem.join(dstT("part"),
      lineitem("l_partkey") === col("p_partkey"), "left_anti").count() === 0L)
    assert(lineitem.join(dstT("supplier"),
      lineitem("l_suppkey") === col("s_suppkey"), "left_anti").count() === 0L)
    // keys do not collide across replicas
    assert(orders.select("o_orderkey").distinct().count() === orders.count())
  }

  test("document vocabularies are pairwise disjoint across replicas") {
    val srcIds = srcT("documents").agg(max("doc_id")).head.getLong(0) + 1
    val tokens = dstT("documents")
      .withColumn("replica", (col("doc_id") / srcIds).cast("int"))
      .select(col("replica"), explode(split(col("text"), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val shared = tokens.groupBy("tok")
      .agg(countDistinct("replica").as("nrep"))
      .filter(col("nrep") > 1)
    assert(shared.count() === 0L)
    // and within a replica the corpus is isomorphic: distinct-token count identical
    val perReplica = tokens.select("replica", "tok").distinct()
      .groupBy("replica").count().select("count").distinct()
    assert(perReplica.count() === 1L)
  }

  test("embedding replicas are near but never identical") {
    val srcIds = srcT("embeddings").agg(max("vec_id")).head.getLong(0) + 1
    val base = srcT("embeddings").select(col("vec_id"), col("embedding").as("e0"))
    val reps = dstT("embeddings")
      .withColumn("replica", (col("vec_id") / srcIds).cast("int"))
      .filter(col("replica") > 0)
      .withColumn("vec_id", pmod(col("vec_id"), lit(srcIds)))
    val joined = reps.join(base, "vec_id")
      .withColumn("dot", aggregate(zip_with(col("embedding"), col("e0"), _ * _),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("n1", sqrt(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x)))
      .withColumn("n2", sqrt(aggregate(col("e0"), lit(0.0), (a, x) => a + x * x)))
      .withColumn("cos", col("dot") / (col("n1") * col("n2")))
      .withColumn("identical", col("embedding") === col("e0"))
    val stats = joined.agg(
      min("cos").as("minCos"),
      sum(col("identical").cast("long")).as("nIdentical")).head()
    assert(stats.getDouble(0) > 0.999, s"min cosine ${stats.getDouble(0)}")
    assert(stats.getLong(1) === 0L, "found bit-identical replica vectors")
  }

  test("distinct l_extendedprice domain grows ~Nx") {
    val d0 = srcT("lineitem").select("l_extendedprice").distinct().count()
    val d1 = dstT("lineitem").select("l_extendedprice").distinct().count()
    assert(d1 > d0 * (n - 1), s"distinct prices $d0 -> $d1 (wanted > ${d0 * (n - 1)})")
  }
}
