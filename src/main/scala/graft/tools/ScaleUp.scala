package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthetic scale-up of a testdata directory: replicates each table N×
 * into a new directory so the bench can be run at a scale factor the
 * harness did not generate (e.g. sf0.1 × 10 ≈ sf1). Used for the
 * scale-evidence runs recorded in BENCH_NOTES.md — NOT part of the query
 * surface, and never pointed at by correctness oracles.
 *
 * Replication is designed to preserve each workload's CHARACTER, not just
 * its row count — naive row duplication would change what the heavy
 * operators measure:
 *
 *   - `documents`: replica k>0 suffixes every whitespace-token with `_r<k>`,
 *     making replica vocabularies pairwise disjoint. Near-dup structure
 *     WITHIN a replica is then isomorphic to the original corpus and there
 *     are no cross-replica near-dups, so duplicate/near-dup DENSITY is
 *     constant and pair counts scale exactly linearly — the honest "10×
 *     corpus" for MinHash / SimHash / n-gram / connected components. Naive
 *     copies would instead make every doc a 10-way exact duplicate and
 *     quadratically inflate per-bucket pair generation.
 *   - `embeddings`: each replica perturbs every coordinate by a
 *     deterministic per-(vec_id, replica, dim) factor of up to ±0.5%, so
 *     replicas are near but not identical in cosine space (no degenerate
 *     zero-distance ties in IVF/LSH bucketing); centroid geometry is
 *     preserved.
 *   - `lineitem`/`orders`/`customer`: a SHARED per-replica offset for each
 *     key domain (computed once from the fact side, so l_orderkey and
 *     o_orderkey shift identically and o_custkey stays inside the shifted
 *     customer domain); l_partkey/l_suppkey are cycled within their
 *     (unscaled) dimension domains; l_extendedprice gets a +0.01·k
 *     cent-level shift so the DISTINCT value domain — the size driver of
 *     ExactQuantiles' compacted table — grows ~N× the way a genuinely
 *     larger scale factor's would.
 *   - dimension tables (`region nation supplier part events` and anything
 *     else present) are copied unchanged — at real TPC-H scale factors the
 *     dimensions grow sub-linearly and the joins against them stay
 *     broadcast-able, which is exactly the property under test.
 *
 * Do NOT chain runs (sf0.1 →×10→ sf1 →×10→ "sf10"): the second pass's
 * replica (0,k) and the first pass's replica (k,0) both suffix tokens with
 * `_r<k>`, producing byte-identical document text across stages — ~1 exact
 * cross-replica duplicate per doc in 10% of the corpus, which corrupts the
 * near-dup pair-count linearity the generator exists to preserve. Reach a
 * larger scale with a single bigger factor (e.g. FACTOR=100) instead.
 *
 * Usage: SPARK_GRAFT_SCALE_SRC=/root/testdata/sf0.1 \
 *        SPARK_GRAFT_SCALE_DST=/tmp/graft-sf1 \
 *        SPARK_GRAFT_SCALE_FACTOR=10 sbt "runMain graft.tools.ScaleUp"
 */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SCALE_DST", "/tmp/graft-sf1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.core.GraftSession.withDefaults(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, src, dst, n)
    spark.stop()
  }

  def scale(spark: SparkSession, src: String, dst: String, n: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    val tables = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName.stripSuffix(".parquet"))

    // shared key-domain offsets so FK edges survive replication intact
    def maxOf(t: String, c: String): Long =
      if (tables.contains(t)) read(t).agg(max(col(c))).head.getLong(0) + 1 else 0L
    val orderDomain = math.max(maxOf("orders", "o_orderkey"), maxOf("lineitem", "l_orderkey"))
    val custDomain = math.max(maxOf("customer", "c_custkey"), maxOf("orders", "o_custkey"))
    // dimension key domains are [min, min + count) — the testdata keys are
    // contiguous but NOT guaranteed 1-based (sf0.001 uses 0-based keys), so
    // cycling must anchor on the observed min, not assume TPC-H's 1..n
    def domainOf(t: String, c: String): (Long, Long) =
      if (tables.contains(t)) {
        val r = read(t).agg(min(col(c)), count(lit(1))).head
        (r.getLong(0), r.getLong(1))
      } else (0L, 1L)
    val (minPart, nPart) = domainOf("part", "p_partkey")
    val (minSupp, nSupp) = domainOf("supplier", "s_suppkey")

    for (t <- tables.sorted) {
      val df = read(t)
      val out = t match {
        case "documents"  => replicate(df, n)(documentsReplica(df))
        case "embeddings" => replicate(df, n)(embeddingsReplica(df))
        case "lineitem"   => replicate(df, n)(lineitemReplica(df, orderDomain, minPart, nPart, minSupp, nSupp))
        case "orders"     => replicate(df, n)(ordersReplica(df, orderDomain, custDomain))
        case "customer"   => replicate(df, n)(customerReplica(df, custDomain))
        case "events"     => replicate(df, n)(eventsReplica(df))
        case _            => df // dimensions stay dimension-sized
      }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t -> ${spark.read.parquet(s"$dst/$t.parquet").count()} rows")
    }
  }

  /** Replica 0 is the original table; replicas 1..n-1 come from `mk`. */
  private def replicate(df: DataFrame, n: Int)(mk: Int => DataFrame): DataFrame =
    (1 until n).map(mk).foldLeft(df)(_ unionByName _)

  private def documentsReplica(df: DataFrame)(k: Int): DataFrame = {
    val ids = df.agg(max("doc_id")).head.getLong(0) + 1
    df.withColumn("doc_id", col("doc_id") + lit(ids * k))
      // disjoint vocabulary per replica: suffix every token (see scaladoc)
      .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_r$k"))
      .withColumn("n_chars", length(col("text")))
  }

  private def embeddingsReplica(df: DataFrame)(k: Int): DataFrame = {
    val ids = df.agg(max("vec_id")).head.getLong(0) + 1
    // deterministic ±0.5% per-(id, replica, dim) perturbation — keeps
    // replicas near the original in cosine space but never identical
    val bump = transform(col("embedding"), (v, i) =>
      v * (lit(1.0f) + ((pmod(col("vec_id") * 31 + i * 7 + lit(k * 13), lit(1000))
        - 500).cast("float") / 100000f)))
    df.withColumn("vec_id", col("vec_id") + lit(ids * k))
      .withColumn("embedding", bump)
  }

  private def lineitemReplica(df: DataFrame, orderDomain: Long, minPart: Long,
                              nPart: Long, minSupp: Long, nSupp: Long)(k: Int): DataFrame =
    df.withColumn("l_orderkey", col("l_orderkey") + lit(orderDomain * k))
      // cycle FKs within the (unscaled) dimension domains so joins stay valid
      .withColumn("l_partkey", pmod(col("l_partkey") - lit(minPart) + lit(k * 37), lit(nPart)) + lit(minPart))
      .withColumn("l_suppkey", pmod(col("l_suppkey") - lit(minSupp) + lit(k * 11), lit(nSupp)) + lit(minSupp))
      // grow the distinct-price domain ~N×, like a genuinely larger sf would
      .withColumn("l_extendedprice", round(col("l_extendedprice") + lit(k * 0.01), 2))

  private def ordersReplica(df: DataFrame, orderDomain: Long, custDomain: Long)
                           (k: Int): DataFrame =
    df.withColumn("o_orderkey", col("o_orderkey") + lit(orderDomain * k))
      .withColumn("o_custkey", col("o_custkey") + lit(custDomain * k))

  private def customerReplica(df: DataFrame, custDomain: Long)(k: Int): DataFrame =
    df.withColumn("c_custkey", col("c_custkey") + lit(custDomain * k))

  /** Events scale like a fact table in the harness data (1k/10k/100k across
    * sf0.001/0.01/0.1), so replicas offset BOTH ids: a larger scale factor
    * means MORE USERS with the same per-user history shape — offsetting only
    * event_id would instead concatenate N copies onto each existing user,
    * inflating per-user session/window sizes the sessionization and
    * sequence operators are measured on. Timestamps stay as-is. */
  private def eventsReplica(df: DataFrame)(k: Int): DataFrame = {
    val r = df.agg(max("event_id"), max("user_id")).head
    val (eventDomain, userDomain) = (r.getLong(0) + 1, r.getLong(1) + 1)
    df.withColumn("event_id", col("event_id") + lit(eventDomain * k))
      .withColumn("user_id", col("user_id") + lit(userDomain * k))
  }
}
