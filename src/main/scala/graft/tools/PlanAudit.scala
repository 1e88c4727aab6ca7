package graft.tools

import graft.core.GraftSession

/**
 * Physical-plan audit: prints the formatted plan for key driver-contract
 * queries and greps for the properties that matter at 100 TB — parquet
 * filter pushdown, pruned read schemas, broadcast joins for dimension
 * tables, window-group-limit pushdown for top-k, and whole-stage codegen.
 */
object PlanAudit {

  final case class Check(query: String, expect: Seq[(String, String)])

  /** Regex expectations over `explain("formatted")` output; a leading `!`
    * asserts ABSENCE; a leading `=N:` asserts the pattern matches EXACTLY N
    * times. Run by the CLI below and enforced by `PlanAuditSpec`. */
  val checks: Seq[Check] = Seq(
      Check("p5_filtered_revenue", Seq(
        "parquet filter pushdown" -> "PushedFilters: \\[.*GreaterThan",
        "column pruning (3 cols)" -> "ReadSchema: [^\n]*l_shipdate")),
      // AQE plans omit codegen ids until runtime; the load-bearing property
      // is that no dimension join degrades to a shuffle join
      Check("j1_revenue_by_nation", Seq(
        "dims broadcast" -> "BroadcastHashJoin",
        "no sort-merge join" -> "!SortMergeJoin")),
      Check("w12_latest_order_per_customer", Seq(
        "window group limit pushdown" -> "WindowGroupLimit")),
      Check("a1_pricing_summary", Seq(
        "partial (map-side) aggregation" -> "partial_sum",
        "column pruning" -> "ReadSchema: [^\n]*l_returnflag")),
      Check("j13_exists_big_spenders", Seq(
        "semi join" -> "LeftSemi")),
      // pre-aggregated distinct: the count-distinct must not plan an Expand
      // over the joined fact table
      Check("j1_revenue_by_nation", Seq(
        "no Expand from mixed distinct aggregate" -> "!Expand")),
      // trimmed stats must come from sort-based rank selection over the
      // COMPACTED (flag, value, count) table: a running-sum window there is
      // bounded by value-domain cardinality (same rows a percentile map
      // would hold) with O(1) state — while the `percentile` UDAF would
      // funnel an O(distinct) boxed OpenHashMap through one merge task per
      // group (the measured dominant cost before round 5). The fact table
      // itself must still only be touched by the map-side compaction.
      Check("a10_percentile_stats", Seq(
        "no percentile hash-map aggregate" -> "!percentile",
        "no object-buffer aggregate" -> "!ObjectHashAggregate",
        "running-sum window over the compacted table" -> "Window",
        "moments broadcast back onto compacted table" -> "BroadcastHashJoin",
        "map-side compaction of the fact scan" -> "partial_count",
        // cache consumer count, pinned at the small-sf (tier-1) shape: the
        // free metadata probe keeps the compact→window pipeline streaming
        // (no compacted cache), and the cumulated table feeds exactly
        // TWO aggregate passes (fused trimmed-moments — bounds decided by
        // index arithmetic inside the same aggregation, ExactQuantiles
        // .trimmedMoments r9; fused median-probe/final). The round-8 shape
        // had a third (separate quantile-bounds pass + broadcast join),
        // round 7 a fourth (separate totals aggregation), round 6 a fifth
        // (separate median indices + a final join); a regression to any
        // shows up as extra details-header scans. Above
        // FactRowsProbeThreshold the adaptive tier legitimately adds one
        // more (compacted-cache) scan.
        "exactly 2 consumers of the cached cumulated table" ->
          "=2:\\(\\d+\\) InMemoryTableScan")),
      // the adaptive bucket cap probed this corpus, found no over-cap bucket
      // and must short-circuit to the PLAIN banded plan: no residual
      // anti-join, no recovery union, and no sort-merge join anywhere. The
      // skewed-input complement (the split IS a broadcast anti-join when a
      // bucket exceeds the cap) is asserted in DedupSkewSpec.
      Check("dedup2_minhash_pairs", Seq(
        "adaptive cap short-circuits to the plain plan on un-skewed data" ->
          "!BroadcastHashJoin LeftAnti",
        "no sort-merge join anywhere in the guard path" -> "!SortMergeJoin")),
      // custom codegen'd kernels must appear as plain expressions (vec_dot),
      // not CodegenFallback-wrapped higher-order functions
      Check("knn1_cosine_top3", Seq(
        "compiled dot-product kernel" -> "vec_dot",
        "no interpreted lambda kernel" -> "!aggregate\\(zip_with")),
      Check("mm1_media_meta_stats", Seq(
        "payload-free scan (no text col read is impossible here since meta\n" +
          "derives from text; real media tables scan meta only)" -> "ReadSchema")),
      // the corpus side must reach the eval-shingle join by broadcast —
      // a sort-merge join here would shuffle the exploded 100 TB stream
      Check("decon1_benchmark_overlap", Seq(
        "eval shingles broadcast onto the corpus stream" -> "BroadcastHashJoin",
        "corpus stream never sort-merges" -> "!SortMergeJoin")),
      // deterministic packing needs exactly one data exchange (the shard
      // hash); anything more means the cumsum re-shuffled
      Check("pack1_token_chunks", Seq(
        "per-shard window cumsum" -> "Window",
        "exactly one shard-hash exchange" -> "=1:\\(\\d+\\) Exchange")),
      // per-row repetition signals must stay inside the scan
      Check("text6_repetition", Seq(
        "no exchange: per-row compute only" -> "!Exchange")),
      // the rate table joins back by broadcast; the corpus never shuffles
      Check("s13_temperature_mix", Seq(
        "rate table broadcast" -> "BroadcastHashJoin",
        "no sort-merge join" -> "!SortMergeJoin",
        "map-side partial counts" -> "partial_count")),
      // common-set membership is a broadcast join over the occurrence
      // stream; the only corpus-keyed exchange is the per-doc count agg
      Check("text7_rare_word_frac", Seq(
        "common set broadcast onto occurrences" -> "BroadcastHashJoin",
        "occurrence stream never sort-merges" -> "!SortMergeJoin",
        "map-side partial per-doc counts" -> "partial_count")))

  def plan(spark: org.apache.spark.sql.SparkSession, dir: String, query: String): String =
    graft.SparkEntry.queries(query)(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)

  private val CountSyntax = "^=(\\d+):(.*)$".r

  def holds(plan: String, regex: String): Boolean = regex match {
    case CountSyntax(n, r) => r.r.findAllIn(plan).length == n.toInt
    case r if r.startsWith("!") => r.drop(1).r.findFirstIn(plan).isEmpty
    case r => r.r.findFirstIn(plan).isDefined
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    checks.foreach { c =>
      val p = plan(spark, dir, c.query)
      println(s"\n=== ${c.query} ===")
      c.expect.foreach { case (what, regex) =>
        println(f"  [${if (holds(p, regex)) "OK " else "MISS"}] $what")
      }
      if (args.contains("--full")) println(p)
    }
    spark.stop()
  }
}
