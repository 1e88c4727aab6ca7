package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Benchmark decontamination — flag training documents that share word
 * n-grams with an evaluation/benchmark set (the standard pre-training
 * hygiene step: a train doc containing an eval n-gram leaks the benchmark
 * into the model; published pipelines use 8–13-gram overlap).
 *
 * Beyond the reference (clinical ETL has no notion of eval contamination);
 * extends the dedup family in this package with the one overlap test that
 * is ASYMMETRIC: a tiny fixed benchmark side against the full corpus.
 *
 * 100 TB shape: the eval side is a benchmark suite — thousands of
 * documents, fixed size regardless of corpus scale — so its distinct
 * shingle set is BROADCAST and the corpus side never shuffles: each task
 * streams its scan partition through explode → broadcast hash join, and
 * only the MATCHES (a vanishing fraction) reach the one aggregation
 * exchange. Contrast MinHash/SimHash in this package, which shuffle
 * signatures of every document because both sides are big.
 */
object Decontaminate {

  /**
   * Training documents sharing at least one word `n`-gram with any eval
   * document: `(idCol, n_shared)` where `n_shared` counts the DISTINCT
   * contaminated shingles of that doc. Tokenization is
   * [[TextFunctions.tokens]] (lowercase, `\s+` split) so the shingle
   * space matches the rest of the dedup family.
   *
   * `evalSet` must be benchmark-sized (its distinct shingles are
   * broadcast). For an eval side too big to broadcast, drop the
   * `broadcast` marker at the call site via `broadcastEval = false` —
   * the join degrades to a shuffle of both shingle streams.
   */
  def overlap(train: DataFrame, evalSet: DataFrame, idCol: String,
              textCol: String, n: Int, broadcastEval: Boolean = true): DataFrame = {
    require(n >= 1, s"shingle width must be positive: $n")
    val evalShingles = {
      val s = evalSet
        .select(explode(TextFunctions.shingles(col(textCol), n)).as("__shingle"))
        .distinct()
      if (broadcastEval) broadcast(s) else s
    }
    train
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), n)).as("__shingle"))
      .join(evalShingles, "__shingle")
      .groupBy(col(idCol))
      .agg(count_distinct(col("__shingle")).as("n_shared"))
  }
}
