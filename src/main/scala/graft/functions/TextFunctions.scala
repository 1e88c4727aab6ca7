package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines: token
 * counting, quality scoring, language identification, shingling and document
 * fingerprinting. All are pure `Column` expressions over
 * `org.apache.spark.sql.functions` (split/filter/transform/aggregate), so they
 * stay inside whole-stage codegen — no UDFs, no Python workers — and scale
 * linearly over a 100 TB `documents` table.
 *
 * (The reference engine is clinical-ETL only; these extend its surface to the
 * LLM-data operators named in BASELINE.json. Tokenization here is
 * whitespace + a BPE-ish word/punct regex, not a model tokenizer.)
 */
object TextFunctions {

  /** Whitespace tokens of lowercased text; empty array for blank input. */
  def tokens(text: Column): Column = {
    val t = split(trim(lower(text)), "\\s+")
    when(length(trim(text)) === 0, array().cast("array<string>")).otherwise(t)
  }

  /** BPE-ish sub-word pieces: word bodies, numbers, and single punctuation
    * marks — a regex approximation of byte-pair pre-tokenization. */
  def bpeishTokens(text: Column): Column = {
    val pieces = regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    when(text.isNull, array().cast("array<string>")).otherwise(pieces)
  }

  def tokenCount(text: Column): Column = size(tokens(text))
  def bpeishTokenCount(text: Column): Column = size(bpeishTokens(text))

  /** Ratio of alphabetic chars to all chars (0 for empty). */
  def alphaRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0 || text.isNull, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / total)
  }

  /** Ratio of punctuation chars to all chars. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0 || text.isNull, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / total)
  }

  /** Mean token length in characters (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  private val EnglishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "this", "be", "are", "was", "from")

  /** Fraction of tokens that are (English) stopwords — a standard fluency signal. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val ts = tokens(text)
    val stop = typedlit(stopwords)
    when(size(ts) === 0, lit(0.0))
      .otherwise(size(filter(ts, t => array_contains(stop, t))).cast("double") / size(ts))
  }

  /**
   * Composite document-quality score in [0,1]: blends length, alphabetic
   * ratio, stopword presence and mean token length into a single heuristic
   * (C4/Gopher-style rule-of-thumb filters, expressed as one codegen'd column).
   */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    val mtl = meanTokenLen(text)
    val mtlScore = when(mtl.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lenScore * 0.3 + alpha * 0.3 + stop * 0.2 + mtlScore * 0.2, 4)
  }

  /** Per-language stopword marker sets for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: broadcast as literals into codegen. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "des", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不", "人", "这"))

  /** Per-language marker hit count over the token set. */
  def langScore(text: Column, lang: String): Column = {
    val markers = typedlit(LangMarkers.toMap.apply(lang))
    size(filter(tokens(text), t => array_contains(markers, t)))
  }

  /**
   * Heuristic language ID: the language with the most stopword-marker hits;
   * "und" (undetermined) when nothing matches. Ties broken by the fixed
   * language order above, so the result is deterministic.
   */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = greatest(scores.map(_._2): _*)
    val picked = scores.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0 && acc === "und", lit(l)).otherwise(acc)
    }
    // foldLeft keeps the FIRST max because later whens only fire on acc==="und"
    picked
  }

  /** Word n-gram shingles (space-joined); empty array when fewer than n tokens. */
  def shingles(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))
  }

  /** Character n-gram shingles of the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), length(t) - n + 1), i => t.substr(i, lit(n))))
  }

  /** 64-bit content fingerprint of whitespace-normalized text (exact dedup key). */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(text)))

  /** Rolling-hash ("winnowing"-style) fingerprint: min xxhash64 over character
    * k-shingles — robust to small edits, unlike [[fingerprint]]. */
  def rollingFingerprint(text: Column, k: Int = 8): Column = {
    val hs = transform(charShingles(text, k), s => xxhash64(s))
    when(size(hs) === 0, xxhash64(lit(""))).otherwise(array_min(hs))
  }
}
