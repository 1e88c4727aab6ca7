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
  def meanTokenLen(text: Column): Column =
    Exprs.let(tokens(text)) { ts =>
      when(size(ts) === 0, lit(0.0))
        .otherwise(aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
    }

  private val EnglishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "this", "be", "are", "was", "from")

  /** Fraction of tokens that are (English) stopwords — a standard fluency signal. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val stop = typedlit(stopwords)
    Exprs.let(tokens(text)) { ts =>
      when(size(ts) === 0, lit(0.0))
        .otherwise(size(filter(ts, t => array_contains(stop, t))).cast("double") / size(ts))
    }
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
   *
   * Tokens and the per-language score vector are each let-bound so the text
   * is tokenized once per row and each marker set scanned once — naively
   * inlining the score trees into the greatest/when chain re-tokenizes the
   * document dozens of times per row.
   */
  def langId(text: Column): Column =
    Exprs.let(tokens(text)) { ts =>
      val scoreArr = array(LangMarkers.map { case (_, m) =>
        size(filter(ts, t => array_contains(typedlit(m), t)))
      }: _*)
      Exprs.let(scoreArr) { sc =>
        val s = (1 to LangMarkers.size).map(i => element_at(sc, i))
        val best = greatest(s: _*)
        // first max wins: a when-chain in language order, so the earliest
        // language whose score equals the max takes the branch (foldRight —
        // no accumulator self-comparison, which Spark warns is trivially true)
        val firstMax = LangMarkers.map(_._1).zip(s)
          .foldRight(lit("und")) { case ((l, si), rest) =>
            when(si === best, lit(l)).otherwise(rest)
          }
        when(best > 0, firstMax).otherwise(lit("und"))
      }
    }

  /** Word n-gram shingles from a precomputed token array — for pipelines
    * that tokenize once (persist the token column) and derive shingles,
    * fingerprints and signatures from it without re-running the tokenizer.
    * `ts` must be a cheap reference (a bound column or [[Exprs.let]] binding):
    * it is referenced several times here. */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    when(size(ts) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + 1, lit(n)))))

  /** Word n-gram shingles (space-joined); empty array when fewer than n tokens.
    * The token array is let-bound OUTSIDE the per-shingle lambda — inlining it
    * there re-tokenizes the whole document once per shingle (O(len²)). */
  def shingles(text: Column, n: Int): Column =
    Exprs.let(tokens(text))(ts => shinglesFromTokens(ts, n))

  /** Character n-gram shingles of the normalized text (same let-binding rationale). */
  def charShingles(text: Column, n: Int): Column =
    Exprs.let(lower(text)) { t =>
      when(length(t) < n, array().cast("array<string>")).otherwise(
        transform(sequence(lit(1), length(t) - n + 1), i => t.substr(i, lit(n))))
    }

  /** Occurrence count of the most frequent token — the numerator of the
    * Gopher-style "top word fraction" repetition signal. Per-row compute
    * over the token array (O(distinct·len) inside one codegen'd
    * projection), deliberately NOT an explode→groupBy: at 100 TB the
    * explode shuffles the whole tokenized corpus to count within single
    * rows, while this form never leaves the scan task. `ts` must be a
    * cheap reference (bound column or [[Exprs.let]] binding). */
  def topTokenCount(ts: Column): Column =
    when(size(ts) === 0, lit(0)).otherwise(
      array_max(transform(array_distinct(ts), x => size(filter(ts, y => y === x)))))

  /** Fraction of word `n`-gram occurrences that are repeats of an n-gram
    * already seen in the same document (Gopher's duplicate-n-gram filter
    * family): `(total − distinct) / total`, 0 for docs shorter than `n`
    * tokens. Same per-row, no-shuffle shape as [[topTokenCount]]. */
  def dupNgramFraction(ts: Column, n: Int): Column =
    Exprs.let(shinglesFromTokens(ts, n)) { g =>
      when(size(g) === 0, lit(0.0))
        .otherwise((size(g) - size(array_distinct(g))).cast("double") / size(g))
    }

  /** PII patterns — a pragmatic regex subset chosen to mean the same
    * thing in Java regex (Spark) and RE2 (DuckDB, re2j): character
    * classes, bounded repetition and literal dots only — no backrefs, no
    * lookaround (RE2 has neither). Greedy in both engines. */
  val EmailPattern = "[a-z0-9]+@[a-z0-9.]+[a-z]"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Occurrences of each PII class in raw text (pre-scrub counts — the
    * audit numbers a redaction report carries). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** Redact PII in place: IPv4 first (an email's host part can never
    * produce a dotted quad AFTER the address is tokenized, but a dotted
    * quad could sit inside a larger address-like string — replacing IPs
    * first makes the composition order-insensitive for disjoint matches
    * and DOCUMENTED for overlapping ones), then emails. Pure codegen'd
    * `regexp_replace` chain — per-row, no shuffle, linear over 100 TB. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, Ipv4Pattern, "<IP>"),
      EmailPattern, "<EMAIL>")

  /** 64-bit content fingerprint of whitespace-normalized text (exact dedup key). */
  def fingerprint(text: Column): Column =
    xxhash64(concat_ws(" ", tokens(text)))

  /** Rolling-hash ("winnowing"-style) fingerprint: min xxhash64 over character
    * k-shingles — robust to small edits, unlike [[fingerprint]]. */
  def rollingFingerprint(text: Column, k: Int = 8): Column = {
    val hs = transform(charShingles(text, k), s => xxhash64(s))
    when(size(hs) === 0, xxhash64(lit(""))).otherwise(array_min(hs))
  }

  /** md5 variant of [[rollingFingerprint]] via the fused single-pass
    * [[RollingMinMd5]] kernel: identical to
    * `array_min(transform(sequence(1, len-k+1), i -> md5(substr(t, i, k))))`
    * (null below k chars — filter first, as the HOF form requires too). */
  def rollingMd5Fingerprint(text: Column, k: Int = 8): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      RollingMinMd5(org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), k))
}
