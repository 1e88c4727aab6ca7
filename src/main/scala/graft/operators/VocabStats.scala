package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Corpus-relative vocabulary signals — the quality dimension the per-row
 * text stats ([[graft.functions.TextFunctions]]) cannot see: whether a
 * document is made of words the REST of the corpus uses. High rare-token
 * fractions flag gibberish, OCR noise, boilerplate code and wrong-language
 * slices; pipelines filter or down-weight on it (beyond the reference,
 * which has no corpus-relative text signal).
 *
 * 100 TB shape, two corpus passes and nothing quadratic:
 *  1. document frequency — distinct-per-doc tokens are exploded and
 *     partial-aggregated map-side, so the vocab-keyed exchange carries
 *     O(vocab · tasks), not the token stream;
 *  2. membership — the COMMON token set (df above the corpus quantile) is
 *     the HEAD of the Zipf curve, bounded by `maxCommon`, and joins the
 *     exploded occurrence stream by BROADCAST; the only corpus-keyed
 *     exchange is the per-doc count aggregation, partial-combined to one
 *     row per doc per task. Broadcasting the common (small) side instead
 *     of the rare (unbounded tail) side is what makes the join scale.
 *
 * The df table is persisted for the round (it feeds both the quantile and
 * the common set) and released by [[graft.core.OperatorCaches]] after the
 * caller's first action.
 */
object VocabStats {

  /** Per-token document frequency: one corpus pass, distinct-per-doc
    * tokens partial-aggregated before the vocab-keyed exchange. */
  def docFrequency(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(array_distinct(TextFunctions.tokens(text))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))

  /**
   * Rare-token stats per non-empty document: `doc_id, n_tok, n_rare,
   * rare_frac` where a token occurrence is rare when its corpus df falls
   * BELOW the `quantile` of the df distribution (self-calibrating on any
   * corpus — no magic absolute threshold), and the common set is capped
   * at `maxCommon` tokens (highest df first, ties by token) to bound the
   * broadcast. Docs with zero tokens have no occurrences and drop out.
   *
   * Cross-engine exact: the quantile interpolates `(lo + (hi−lo)·f)` in
   * double identically in Spark and DuckDB, the cap order is total, and
   * `rare_frac` is one IEEE division.
   */
  def rareTokenStats(docs: DataFrame, id: Column, text: Column,
                     quantile: Double = 0.5, maxCommon: Int = 4096): DataFrame = {
    require(quantile > 0 && quantile < 1, s"quantile must be in (0,1): $quantile")
    require(maxCommon >= 1, s"maxCommon must be positive: $maxCommon")
    val dfTab = docFrequency(docs, text).persist()
    val med = dfTab.agg(percentile(col("df"), lit(quantile)).as("__q"))
    val common = dfTab.crossJoin(broadcast(med))
      .filter(col("df") >= col("__q"))
      .orderBy(col("df").desc, col("token"))
      .limit(maxCommon)
      .select(col("token"), lit(1).as("__common"))
    val out = docs
      .select(id.as("doc_id"), explode(TextFunctions.tokens(text)).as("token"))
      .join(broadcast(common), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), count(col("__common")).as("__n_common"))
      .select(col("doc_id"), col("n_tok"),
        (col("n_tok") - col("__n_common")).as("n_rare"),
        ((col("n_tok") - col("__n_common")).cast("double") / col("n_tok"))
          .as("rare_frac"))
    graft.core.OperatorCaches.owned(out, Seq(dfTab))
  }
}
