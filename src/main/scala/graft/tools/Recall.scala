package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, MinHash}
import graft.similarity.Knn

/**
 * Recall measurement for the approximate (ANN / near-dup) family against
 * exact ground truth — the harness behind the recall table in BENCH_NOTES.md
 * and the floors asserted by `RecallSpec`.
 *
 * The auto-sizing changes of round 6 (LSH planes ≈ log2(n/32), IVF
 * nCells ≈ √(2n)) ARGUE recall is preserved across scale (fewer planes
 * strictly widen buckets; nProbe cells cover a constant corpus fraction);
 * this tool turns the argument into a number at each scale point:
 *
 *  - **recall@k** for the ANN paths (`knn2_lsh_top3`, `knn3_ivf_top3`):
 *    ground truth is [[Knn.bruteForceTopK]] of a deterministic hash-sample
 *    of query vectors against the FULL corpus; the approximate result is
 *    the production operator run over the full corpus (exactly what the
 *    query surface ships), filtered to the sampled queries. A retrieved
 *    neighbor counts as a hit when its cosine is ≥ the query's k-th true
 *    cosine — the standard distance-tie-tolerant definition (a neighbor
 *    tied with the k-th is as good as the k-th; both sides compute cosine
 *    with the same compiled kernel, so the comparison is bit-deterministic).
 *  - **pair recall** for the near-dup paths (`dedup2` guards ON, `ngram1`
 *    doc-freq cap ON): ground truth is the UNCAPPED inverted-index join —
 *    exact for any threshold > 0 (a qualifying pair shares ≥ 1 shingle; see
 *    [[Dedup.ngramJaccardBlocked]]) — so recall = |approx ∩ exact| / |exact|.
 *    Precision is 1 by construction on both paths (each verifies exact
 *    Jaccard on candidates), which is why recall is the only number needed.
 *
 * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *        [SPARK_GRAFT_RECALL_QUERIES=2000] sbt "runMain graft.tools.Recall"
 * Prints one JSON line per run, mirroring Bench's contract.
 */
object Recall {

  /** Distance-tie-tolerant recall@k: fraction of true top-k slots the
    * approximate result fills with a neighbor at least as close as the
    * query's k-th true neighbor. `truth`/`approx` carry
    * (query_id, neighbor_id, cosine); truth has ≤ k rows per query (fewer
    * only when the corpus itself has fewer than k candidates). */
  def annRecallAtK(approx: DataFrame, truth: DataFrame): Double = {
    val kth = truth.groupBy("query_id")
      .agg(min(col("cosine")).as("__kth"), count(lit(1)).as("__nt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perQuery = approx.select(col("query_id"), col("cosine"))
      .join(kth, Seq("query_id"))
      .groupBy("query_id")
      .agg(sum(when(col("cosine") >= col("__kth"), 1L).otherwise(0L)).as("__h"),
        first(col("__nt")).as("__ntA"))
      // ties can push more than __nt as-close-as-kth retrievals; a query
      // can never contribute more than its truth-slot count
      .select(col("query_id"), least(col("__h"), col("__ntA")).as("__hits"))
    val row = kth.join(perQuery, Seq("query_id"), "left_outer")
      .agg(sum(coalesce(col("__hits"), lit(0L))).cast("double").as("h"),
        sum(col("__nt")).cast("double").as("n"))
      .head()
    kth.unpersist()
    if (row.getDouble(1) == 0.0) 1.0 else row.getDouble(0) / row.getDouble(1)
  }

  /** Mean per-query cosine gap between the TRUE top-k and the retrieved
    * top-k: avg over queries of (mean true cosine − mean retrieved cosine).
    * The interpretability complement to exact-slot recall on near-dup-
    * saturated corpora: when a bucket holds d near-identical members, the
    * guard's bounded sampling can only find ~sample/d of the exact top-3
    * SLOTS (low recall@k), yet every retrieved neighbor may sit within 1e-4
    * cosine of the true ones — this measures that distance. Queries with no
    * retrieved rows contribute their full mean true cosine (gap vs
    * nothing). */
  def annQualityGap(approx: DataFrame, truth: DataFrame): Double = {
    val t = truth.groupBy("query_id").agg(avg(col("cosine")).as("__tq"))
    val a = approx.groupBy("query_id").agg(avg(col("cosine")).as("__aq"))
    t.join(a, Seq("query_id"), "left_outer")
      .agg(avg(col("__tq") - coalesce(col("__aq"), lit(0.0))))
      .head().getDouble(0)
  }

  /** (hits, exactCount, recall) of an approximate pair set vs the exact one.
    * Pair order is normalized on both sides; precision is not measured here
    * because both production paths verify exact Jaccard on candidates. */
  def pairRecall(approx: DataFrame, exact: DataFrame): (Long, Long, Double) = {
    def norm(df: DataFrame): DataFrame =
      df.select(least(col("left_id"), col("right_id")).as("left_id"),
        greatest(col("left_id"), col("right_id")).as("right_id")).distinct()
    val e = norm(exact).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nExact = e.count()
    val hits = norm(approx).join(e, Seq("left_id", "right_id"), "left_semi").count()
    e.unpersist()
    (hits, nExact, if (nExact == 0) 1.0 else hits.toDouble / nExact)
  }

  /** Deterministic ~`target`-row hash-sample of query vectors: every id with
    * xxhash64 ≡ 0 (mod n/target). Rate from one count() probe — same eager
    * contract as the operators' own auto-sizing. */
  def sampleQueries(vecs: DataFrame, idCol: String, target: Int): DataFrame = {
    val n = vecs.count()
    val rate = math.max(1L, n / math.max(1, target))
    vecs.where(pmod(xxhash64(col(idCol)), lit(rate)) === 0)
  }

  /** All four recall numbers for one sf directory, as (metric -> value),
    * plus the corpus/sample sizes that contextualize them. */
  def measure(spark: SparkSession, sfDir: String,
              queryTarget: Int = 2000,
              fixedCounterfactual: Boolean = false,
              probes: Int = -1, tables: Int = 4,
              nProbe: Int = 2): Seq[(String, Double)] = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = sampleQueries(emb, "vec_id", queryTarget)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQ = queries.count()

    // ground truth once — both ANN paths are scored against the same table
    val truth = Knn.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qIds = queries.select(col("vec_id").as("query_id"))
    def toSample(approx: DataFrame): DataFrame =
      approx.join(broadcast(qIds), Seq("query_id"), "left_semi")

    // production-config operators (mirror the SparkEntry queries exactly);
    // `probes`/`tables` are counterfactual knobs whose DEFAULTS equal the
    // production lshTopK signature (probes -1 = auto = planes). Measured
    // grid at sf0.1 (r7): probes=0 → 0.21, probes=3 → 0.57, probes=planes
    // → 0.71 recall@3 (tables=4); halving tables to 2 at full probing gives
    // the gain back (0.46) — probing complements tables, it does not
    // replace them on a structureless corpus.
    val knn2Out = toSample(Knn.lshTopK(emb, "vec_id", "embedding", k = 3,
        dims = 64, tables = tables, maxBucketSize = Some(64), probes = probes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val knn2 = annRecallAtK(knn2Out, truth)
    val knn2Gap = annQualityGap(knn2Out, truth)
    knn2Out.unpersist()
    val knn3 = annRecallAtK(
      toSample(Knn.ivfTopK(emb, "vec_id", "embedding", k = 3,
        nProbe = nProbe, kmeansIters = 2)), truth)
    // counterfactual: the round-6 fixed-plane trap (planes pinned at the old
    // default 10 while n grows — average bucket outgrows the cap and the
    // guard drops most of the corpus). Measured beside auto so "auto-sizing
    // prevents recall collapse" is a number, not an argument.
    val knn2Fixed = if (!fixedCounterfactual) None else Some(annRecallAtK(
      toSample(Knn.lshTopK(emb, "vec_id", "embedding", k = 3, dims = 64,
        planes = 10, maxBucketSize = Some(64))), truth))
    truth.unpersist(); queries.unpersist()

    // near-dup pair recall, production guards ON vs uncapped-exact
    val (d2h, d2n, dedup2) = pairRecall(
      MinHash.nearDuplicates(docs, "doc_id", col("text"),
        threshold = 0.5, maxBucketSize = Some(64)),
      Dedup.ngramJaccardBlocked(docs, "doc_id", lit(0), col("text"),
        n = 3, threshold = 0.5))
    val (n1h, n1n, ngram1) = pairRecall(
      Dedup.ngramJaccardBlocked(docs, "doc_id", col("source"), col("text"),
        n = 3, threshold = 0.2, maxShingleDocFreq = Some(100)),
      Dedup.ngramJaccardBlocked(docs, "doc_id", col("source"), col("text"),
        n = 3, threshold = 0.2))
    val nVec = emb.count(); val nDoc = docs.count()
    emb.unpersist(); docs.unpersist()
    Seq("n_vectors" -> nVec.toDouble, "n_docs" -> nDoc.toDouble,
      "n_queries" -> nQ.toDouble,
      "knn2_lsh_recall_at3" -> knn2, "knn2_quality_gap" -> knn2Gap,
      "knn3_ivf_recall_at3" -> knn3) ++
    knn2Fixed.map("knn2_fixedplanes10_recall_at3" -> _).toSeq ++
    Seq(
      "dedup2_pair_recall" -> dedup2, "dedup2_pairs_exact" -> d2n.toDouble,
      "dedup2_pairs_hit" -> d2h.toDouble,
      "ngram1_pair_recall" -> ngram1, "ngram1_pairs_exact" -> n1n.toDouble,
      "ngram1_pairs_hit" -> n1h.toDouble)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val target = sys.env.getOrElse("SPARK_GRAFT_RECALL_QUERIES", "2000").toInt
    val fixed = sys.env.get("SPARK_GRAFT_RECALL_FIXED").exists(v => v == "1" || v == "true")
    val probes = sys.env.get("SPARK_GRAFT_RECALL_PROBES").map(_.toInt).getOrElse(-1)
    val tables = sys.env.get("SPARK_GRAFT_RECALL_TABLES").map(_.toInt).getOrElse(4)
    val nProbe = sys.env.get("SPARK_GRAFT_RECALL_NPROBE").map(_.toInt).getOrElse(2)
    val spark = graft.core.GraftSession.withDefaults(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val m = measure(spark, sfDir, target, fixedCounterfactual = fixed,
      probes = probes, tables = tables, nProbe = nProbe)
    val secs = (System.nanoTime() - t0) / 1e9
    val fields = m.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"metric":"recall","sf":"$sfDir",$fields,"harness_sec":$secs}""")
    spark.stop()
  }
}
