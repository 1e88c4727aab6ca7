package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact distributed per-group quantiles by sort-based rank selection.
 *
 * Spark's exact `percentile` aggregate is a TypedImperativeAggregate whose
 * per-group state is an OpenHashMap[value, count]: every partial map is
 * serialized, shuffled, and re-merged entry-by-entry (boxed, rehash-heavy)
 * into ONE final map per group — O(distinct values) single-task memory, and
 * measurably the dominant cost of a trimmed-stats query (jstack on the
 * round-5 bench host put all wall time in
 * TypedAggregateWithHashMapAsBuffer.deserialize / OpenHashSet.rehash).
 *
 * This operator gets the same numbers from relational pieces that Catalyst
 * compiles end-to-end:
 *
 *  1. [[compact]] — map-side-combinable reduction of raw rows to
 *     (group, value, count). At 100 TB this is the only pass over the fact
 *     table, and the result is bounded by GROUP × VALUE-DOMAIN cardinality,
 *     not by row count.
 *  2. [[cumulate]] — a running-count window over the compacted table:
 *     per-group Tungsten external sort (spillable) + an O(1) running sum,
 *     against the `percentile` map's O(distinct) boxed heap state.
 *     Parallelism boundary (measured, r6 sf10 scale run): the window
 *     partitions by GROUP, so the sort parallelism is the group count —
 *     a query with few groups and a huge per-group value domain (a10's
 *     3 flags × ~9M synthetic distinct prices) runs the sort in that
 *     many tasks. Still spillable and sub-linear end-to-end (the one
 *     fact-table pass dominates). For single-digit groups with huge value
 *     domains use [[cumulateRangeParallel]] (r8): the same output with the
 *     sort range-partitioned across the cluster — parallelism decoupled
 *     from the group count.
 *  3. [[quantilesOfCumulated]] — each requested quantile is "fetch the
 *     values covering multiset indices floor/ceil of p·(n−1)" — one
 *     conditional aggregation for all requested p at once.
 *
 * Bit-exactness: [[interpolate]] replicates Spark's own
 * `Percentile.getPercentile` arithmetic — position = (n−1).toDouble · p,
 * lower/higher = floor/ceil, result = vLo when higher == lower or
 * vLo == vHi, else (higher−position)·vLo + (position−lower)·vHi — in the
 * same IEEE double operation order, so results are identical to
 * `percentile(value, p, freq)` (asserted by `ExactQuantilesSpec`).
 *
 * The cumulative table a caller gets from [[cumulate]] composes further:
 * trimmed-subset quantiles need no second sort, because the trimmed index j
 * is the full index j + (count of values below the trim bound) — see the
 * a10 driver query for the worked median-of-trimmed example.
 */
object ExactQuantiles {

  /** Map-side-combinable compaction of raw rows to (groupCols…, valueCol,
    * cntCol). The only pass over the raw table. NULL values are dropped
    * here — `percentile` (and quantile_cont) ignore them, and a NULL that
    * reached [[cumulate]] would sort first and occupy multiset indices.
    * A group whose values are all NULL disappears entirely, exactly as it
    * does under `percentile`. */
  def compact(df: DataFrame, groupCols: Seq[String], valueCol: String,
              cntCol: String = "__cnt"): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as(cntCol))

  /** Add cumulative multiset positions to a compacted table: each row covers
    * the 0-based indices [startCol, endCol) of its group's
    * sorted-with-frequency multiset. One per-group external sort, O(1)
    * running state.
    *
    * INVARIANT (required of `compacted`, guaranteed by [[compact]]): exactly
    * one row per (group, value), no NULL values. Duplicate (group, value)
    * rows would produce overlapping index ranges, and [[valueAt]]'s
    * `max(when(...))` would then silently pick one of the overlapping rows —
    * wrong quantiles with no error. Callers building the table by hand
    * (e.g. from a pre-aggregated frequency column) must groupBy+sum to one
    * row per value first. */
  def cumulate(compacted: DataFrame, groupCols: Seq[String], valueCol: String,
               cntCol: String = "__cnt", startCol: String = "__start",
               endCol: String = "__end", totalCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = compacted
      .withColumn(endCol, sum(col(cntCol)).over(w))
      .withColumn(startCol, col(endCol) - col(cntCol))
    // optional per-group multiset size, riding the SAME (partition, order)
    // spec — WindowExec evaluates both frames off one sort, so consumers
    // that need n (quantile index arithmetic) get it without a separate
    // totals aggregation + broadcast join pass over the cumulated table
    totalCol.fold(cum) { n =>
      cum.withColumn(n, sum(col(cntCol)).over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    }
  }

  /**
   * [[cumulate]] with the per-group sort RANGE-PARTITIONED across the
   * cluster — same output rows, parallelism decoupled from the group count.
   *
   * [[cumulate]]'s window partitions by GROUP, so its sort parallelism IS
   * the group count: a query with few groups and a huge per-group value
   * domain (a10's 3 flags × ~10⁵ distinct prices per 0.1 sf, ~10⁸ at
   * sf100) runs the dominant sort in single-digit tasks no matter how many
   * executors the cluster has. Here the sort is split three ways:
   *
   *  1. `repartitionByRange(group, value)` — each range partition holds a
   *     contiguous slice of one-or-more groups' value domains, so within a
   *     group, partition order = value order.
   *  2. a running-count window per (group, RANGE PARTITION) — many small
   *     sorted slices in parallel instead of one sort per group.
   *  3. per-(group, partition) totals, offset by a prefix-sum window over
   *     the tiny (#partitions × #groups)-row totals table, broadcast back:
   *     global index = local running count + offset of earlier slices.
   *
   * Exactness does not depend on where the sampled range boundaries fall —
   * any split of a group's ordered domain yields the same global indices
   * (the offsets absorb the boundary choice) — so AQE coalescing of the
   * range shuffle (which only merges ADJACENT ranges) is also safe.
   * Requires [[compact]]'s invariant (one row per (group, value)): a
   * duplicated sort key could straddle a boundary and double-count.
   *
   * Both exchanges read the same range-partitioned child, which Spark's
   * ReuseExchange collapses to one shuffle write. Prefer this variant
   * whenever the group count is small relative to the cluster; [[cumulate]]
   * remains for group-heavy shapes where the extra exchange buys nothing.
   */
  def cumulateRangeParallel(compacted: DataFrame, groupCols: Seq[String],
                            valueCol: String, cntCol: String = "__cnt",
                            startCol: String = "__start",
                            endCol: String = "__end",
                            totalCol: Option[String] = None): DataFrame = {
    val gp = groupCols :+ "__pid"
    val ranged = compacted
      .repartitionByRange((groupCols.map(col) :+ col(valueCol)): _*)
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy(gp.map(col): _*).orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__lend", sum(col(cntCol)).over(wLocal))
    val wOff = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-group totals ride the SAME tiny offsets table (and its one
    // broadcast join) — the range-parallel twin of [[cumulate]]'s fused
    // totals window, same cost argument: the table is #partitions × #groups
    // rows, so the extra frame is free
    val wTot = Window.partitionBy(groupCols.map(col): _*)
    val offsets0 = ranged.groupBy(gp.map(col): _*).agg(sum(col(cntCol)).as("__ptot"))
      .withColumn("__off", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
    val offsets = totalCol.fold(offsets0.select((gp.map(col) :+ col("__off")): _*)) { n =>
      offsets0.withColumn(n, sum(col("__ptot")).over(wTot))
        .select((gp.map(col) :+ col("__off") :+ col(n)): _*)
    }
    // column order matches [[cumulate]] (…, endCol, startCol[, totalCol]) so
    // the two variants are drop-in interchangeable
    local.join(broadcast(offsets), gp)
      .withColumn(endCol, col("__lend") + col("__off"))
      .withColumn(startCol, col(endCol) - col(cntCol))
      .select((compacted.columns.map(col) :+ col(endCol) :+ col(startCol)) ++
        totalCol.map(col).toSeq: _*)
  }

  /** Per-group-sort size above which [[cumulateRangeParallel]] beats
    * [[cumulate]] on a multi-core cluster. Measured (sf0.1/sf1 lineitem,
    * 32 cores, BENCH_NOTES "a10 shape"): 198k rows/group → plain 3.0 s vs
    * parallel 4.0 s (the extra exchange loses); 1.8M rows/group → plain
    * 12.0 s vs parallel 5.9 s (three busy cores out of 32 lose bigger).
    * 500k sits at the geometric middle of the bracketing measurements. */
  val RangeParallelPerGroupRows = 500000L

  /** Fact-table rows below which the adaptive probe is skipped entirely:
    * even a worst-case single-group all-distinct domain of this size sorts
    * in roughly one task-second, comparable to what any probe job costs —
    * below it, probing can never pay for itself. */
  val FactRowsProbeThreshold = 2000000L

  /** Fact-table rows above which every pass must come off a MATERIALIZED
    * compacted table: the mid-tier's streaming-uncached range shape
    * re-evaluates the scan+compact pipeline for the HLL probe, the range
    * sampling AND the exchange — three fact passes that are noise at sf1
    * (measured cheaper than the cache round-trip there) but dominate once a
    * single scan costs tens of seconds (measured at sf100/600M rows: the
    * uncached shape's best rep was SLOWER than the plain 3-task sort it
    * replaces — BENCH_NOTES "a10 shape"). Above this line the compacted
    * table is persisted once and probed exactly; below, streaming wins. */
  val CompactCacheMinFactRows = 100000000L

  /**
   * [[cumulate]] with the sort strategy chosen from the DATA — a THREE-tier
   * eager probe over the FACT table (probe jobs run at call time, the same
   * contract as the skew guards):
   *
   *  - Tier 1 (≤ [[FactRowsProbeThreshold]] rows): the plain shape streams
   *    compact → window in one pipeline, zero probe overhead — too small
   *    for any probe to pay for itself.
   *  - Tier 2 (≤ [[CompactCacheMinFactRows]] rows): one LIGHTWEIGHT
   *    aggregation over the (column-pruned) fact scan —
   *    `approx_count_distinct` of the compaction key and of the group key —
   *    then the chosen shape streams from the fact table UNCACHED. HLL
   *    error (~2%) is irrelevant against a threshold with
   *    order-of-magnitude bracketing measurements, and the probe scan is
   *    far cheaper than the cache round-trip at this size (measured sf1:
   *    ~0.5 s rescan vs ~3 s cache — BENCH_NOTES "a10 shape").
   *  - Tier 3 (above): fact scans dominate, so the compacted table is
   *    persisted ONCE (its own exact count doubles as the probe) and the
   *    chosen shape — and every caller pass — reads the cache (measured
   *    sf100: the uncached shape's three fact passes were slower than the
   *    serial sort they replaced — BENCH_NOTES "a10 tier 3").
   *
   * Decision rationale: plain per-group windowing sorts with parallelism =
   * GROUP COUNT; when groups are fewer than the cluster's cores and the
   * per-group domain exceeds [[RangeParallelPerGroupRows]], the dominant
   * sort serializes onto a handful of tasks while the rest of the cluster
   * idles — exactly what [[cumulateRangeParallel]] fixes, at the price of
   * an extra full exchange that LOSES on small domains. The probe picks per
   * dataset and records the choice (`Decisions`).
   *
   * COST CAVEAT: the "free tier-1 count" and "cheap tier-2 probe" hold for
   * a RAW TABLE READ (metadata-only count under parquet aggregate pushdown,
   * column-pruned probe scan — true at the a10 call site). A filtered or
   * derived `fact` pipeline re-evaluates per probe pass; such callers
   * should pass `nFactKnown` (skips the count entirely) and expect tier 2
   * to cost one extra pipeline evaluation for the HLL probe.
   *
   * Tier boundaries are conf-overridable (`spark.graft.quantiles.*` — see
   * [[graft.core.Tunables]]): the defaults are crossovers measured at
   * 32 cores / 128 GiB and a memory-rich cluster moves them.
   */
  def cumulateFromFact(fact: DataFrame, groupCols: Seq[String],
                       valueCol: String, cntCol: String = "__cnt",
                       startCol: String = "__start", endCol: String = "__end",
                       totalCol: Option[String] = None,
                       nFactKnown: Option[Long] = None): DataFrame = {
    val spark = fact.sparkSession
    val probeThreshold = graft.core.Tunables.long(spark,
      "spark.graft.quantiles.factRowsProbeThreshold", FactRowsProbeThreshold)
    val cacheMinRows = graft.core.Tunables.long(spark,
      "spark.graft.quantiles.compactCacheMinFactRows", CompactCacheMinFactRows)
    val perGroupRows = graft.core.Tunables.long(spark,
      "spark.graft.quantiles.rangeParallelPerGroupRows", RangeParallelPerGroupRows)
    val nFact = nFactKnown.getOrElse(fact.count())
    val compacted = compact(fact, groupCols, valueCol, cntCol)
    val p = spark.sparkContext.defaultParallelism
    def choose(n: Long, g: Long): Boolean = {
      val pick = g < p && n / math.max(1L, g) > perGroupRows
      graft.core.Decisions.record(
        s"quantiles.rangeParallel(n=$n, groups=$g, cores=$p)", pick)
      pick
    }
    if (nFact <= probeThreshold) {
      // tier 1: too small for any probe to pay for itself
      graft.core.Decisions.record(s"quantiles.rangeParallel(nFact=$nFact)",
        "skipped-small-fact")
      cumulate(compacted, groupCols, valueCol, cntCol, startCol, endCol, totalCol)
    } else if (nFact <= cacheMinRows) {
      // tier 2: streaming-uncached — one lightweight HLL pass chooses, the
      // chosen shape re-reads the fact scan (cheap at this size)
      val row = fact.filter(col(valueCol).isNotNull).agg(
        approx_count_distinct(struct((groupCols :+ valueCol).map(col): _*)),
        approx_count_distinct(struct(groupCols.map(col): _*))).head()
      if (choose(row.getLong(0), math.max(1L, row.getLong(1))))
        cumulateRangeParallel(compacted, groupCols, valueCol, cntCol, startCol,
          endCol, totalCol)
      else
        cumulate(compacted, groupCols, valueCol, cntCol, startCol, endCol, totalCol)
    } else {
      // tier 3: fact scans dominate — materialize the compacted table ONCE
      // (its own count doubles as the exact probe), then the range sampling
      // and exchange (or the plain window) read the cache. The cache is
      // registered against the returned plan, so it releases after the
      // caller's first action materializes the cumulated result.
      val cached = compacted.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val row = cached.agg(count(lit(1)), approx_count_distinct(
        struct(groupCols.map(col): _*))).head()
      val cum =
        if (choose(row.getLong(0), math.max(1L, row.getLong(1))))
          cumulateRangeParallel(cached, groupCols, valueCol, cntCol, startCol,
            endCol, totalCol)
        else
          cumulate(cached, groupCols, valueCol, cntCol, startCol, endCol, totalCol)
      graft.core.OperatorCaches.owned(cum, Seq(cached))
    }
  }

  /** Aggregate expression: the value whose index range covers multiset
    * index `idx` (exactly one row per group matches). */
  def valueAt(idx: Column, valueCol: String, startCol: String = "__start",
              endCol: String = "__end"): Column =
    max(when(col(startCol) <= idx && idx < col(endCol), col(valueCol)))

  /** Spark `Percentile.getPercentile`'s interpolation, operation-for-
    * operation: callers pass position p·(n−1), its floor/ceil as longs, and
    * the two covering values. */
  def interpolate(pos: Column, lo: Column, hi: Column, vLo: Column,
                  vHi: Column): Column =
    when(hi === lo || vLo === vHi, vLo)
      .otherwise((hi.cast("double") - pos) * vLo + (pos - lo.cast("double")) * vHi)

  /** Per-group quantile values over a [[cumulate]]d table: one row per
    * group with one output column per requested (p, name). All quantiles
    * come out of a single conditional aggregation pass.
    *
    * `cum` must satisfy [[cumulate]]'s invariant: one row per (group,
    * value) with contiguous non-overlapping [startCol, endCol) ranges and
    * `sum(cntCol)` equal to the group's multiset size. A table that
    * violates it (duplicate values, hand-built ranges that overlap or gap)
    * yields wrong quantiles silently — [[valueAt]] has no way to detect
    * which of several covering rows is authoritative. */
  def quantilesOfCumulated(cum: DataFrame, groupCols: Seq[String],
                           valueCol: String, ps: Seq[(Double, String)],
                           cntCol: String = "__cnt", startCol: String = "__start",
                           endCol: String = "__end",
                           totalCol: Option[String] = None): DataFrame = {
    require(ps.nonEmpty, "at least one quantile required")
    ps.foreach { case (p, _) =>
      require(p >= 0.0 && p <= 1.0, s"quantile $p outside [0, 1]")
    }
    // `totalCol` (r8): a cum table already carrying its per-group multiset
    // size (see [[cumulate]]'s totalCol) skips the totals aggregation AND
    // its broadcast join — one whole pass fewer over the cumulated table.
    // Otherwise totals come from the frequency column, NOT max(endCol):
    // that branch then uses no window output, so Catalyst prunes the window
    // away and an unpersisted `cum` costs only ONE per-group sort (in the
    // main join branch) — asserted by ExactQuantilesSpec's plan test.
    val withN = totalCol match {
      case Some(n) => cum.withColumn("__n", col(n))
      case None =>
        val tot = cum.groupBy(groupCols.map(col): _*).agg(sum(col(cntCol)).as("__n"))
        cum.join(broadcast(tot), groupCols)
    }
    val withIdx = ps.zipWithIndex.foldLeft(withN) { case (d, ((p, _), i)) =>
      d.withColumn(s"__p$i", (col("__n") - 1).cast("double") * lit(p))
        .withColumn(s"__l$i", floor(col(s"__p$i")))
        .withColumn(s"__h$i", ceil(col(s"__p$i")))
    }
    val aggs = ps.indices.flatMap { i =>
      Seq(max(col(s"__p$i")).as(s"__p$i"),
        max(col(s"__l$i")).as(s"__l$i"), max(col(s"__h$i")).as(s"__h$i"),
        valueAt(col(s"__l$i"), valueCol, startCol, endCol).as(s"__vl$i"),
        valueAt(col(s"__h$i"), valueCol, startCol, endCol).as(s"__vh$i"))
    }
    withIdx.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupCols.map(col) ++ ps.zipWithIndex.map { case ((_, name), i) =>
        interpolate(col(s"__p$i"), col(s"__l$i"), col(s"__h$i"),
          col(s"__vl$i"), col(s"__vh$i")).as(name)
      }: _*)
  }

  /**
   * Quantile-trimmed moments in ONE aggregation pass over a [[cumulate]]d
   * table (with `totalCol`): per group, the count/sum/sum-of-squares of the
   * values inside the [pLo, pHi] quantile trim window, plus the count of
   * values strictly below the low bound (the index shift trimmed-median
   * consumers need). Output: groupCols, __nt, __s1, __s2, __b.
   *
   * The two-pass formulation (quantile bounds via [[quantilesOfCumulated]],
   * then a conditional aggregation joined against them) costs one whole
   * extra pass over the cumulated table just to LEARN the bounds it filters
   * by. But the trim predicate is index arithmetic in disguise: with
   * `lo = interp(p·(n−1))` sitting between the values at indices
   * floor/ceil(p·(n−1)), a value v satisfies `v >= lo` iff its index range
   * ends past ceil(p·(n−1)) — every row except the two covering rows is
   * decided by indices alone, and `totalCol` puts n on every row. So one
   * aggregation computes index-predicate base sums PLUS the ≤4 boundary
   * covering rows (value, count, index range each), and a post-aggregation
   * projection assembles the exact answer: bounds from the captured values
   * (the same [[interpolate]] arithmetic as the two-pass shape, bit for
   * bit), then per boundary row the EXACT value-space membership test,
   * adding/subtracting the few rows where it disagrees with the index
   * base. The correction term is what makes this safe against the
   * floating-point edge the pure-index form ignores: `interp` can round to
   * exactly the lower covering value (or one ulp past the upper), flipping
   * that single row's membership — here it is re-decided by the same
   * comparison the two-pass filter would have made. Equivalence to the
   * two-pass shape is property-checked (`ExactQuantilesSpec`), and the
   * per-group correction work is O(1): a 4-element array of structs.
   */
  def trimmedMoments(cum: DataFrame, groupCols: Seq[String], valueCol: String,
                     pLo: Double, pHi: Double, cntCol: String = "__cnt",
                     startCol: String = "__start", endCol: String = "__end",
                     totalCol: String = "__n"): DataFrame = {
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0,
      s"trim quantiles out of order: [$pLo, $pHi]")
    val v = col(valueCol); val cnt = col(cntCol)
    val st = col(startCol); val en = col(endCol)
    val pL = (col(totalCol) - 1).cast("double") * lit(pLo)
    val pH = (col(totalCol) - 1).cast("double") * lit(pHi)
    val (lL, hL) = (floor(pL), ceil(pL))
    val (lH, hH) = (floor(pH), ceil(pH))
    // index-space trim region: v >= lo ⟺ end > ceil(pL·(n−1)),
    // v <= hi ⟺ start <= floor(pH·(n−1)) — exact except on covering rows
    val inBase = en > hL && st <= lH
    def coverRow(idx: Column) = max(when(st <= idx && idx < en,
      struct(st.as("s"), en.as("e"), v.as("v"), cnt.as("c"))))
    val agg = cum.groupBy(groupCols.map(col): _*).agg(
      coalesce(sum(when(inBase, cnt)), lit(0L)).as("__aN"),
      coalesce(sum(when(inBase, v * cnt)), lit(0.0)).as("__aS1"),
      coalesce(sum(when(inBase, v * v * cnt)), lit(0.0)).as("__aS2"),
      coalesce(sum(when(en <= hL, cnt)), lit(0L)).as("__aB"),
      max(pL).as("__pL"), max(lL).as("__lL"), max(hL).as("__hL"),
      max(pH).as("__pH"), max(lH).as("__lH"), max(hH).as("__hH"),
      coverRow(lL).as("__rLlo"), coverRow(hL).as("__rHlo"),
      coverRow(lH).as("__rLhi"), coverRow(hH).as("__rHhi"))
    val lo = interpolate(col("__pL"), col("__lL"), col("__hL"),
      col("__rLlo.v"), col("__rHlo.v"))
    val hi = interpolate(col("__pH"), col("__lH"), col("__hH"),
      col("__rLhi.v"), col("__rHhi.v"))
    // the (deduped) boundary rows — the only rows whose exact membership
    // can disagree with the index base
    val boundary = array_distinct(filter(
      array(col("__rLlo"), col("__rHlo"), col("__rLhi"), col("__rHhi")),
      r => r.isNotNull))
    def corr(pred: Column => Column, f: Column => Column): Column =
      coalesce(aggregate(filter(boundary, pred), lit(0.0),
        (acc, r) => acc + f(r)), lit(0.0))
    def inBaseR(r: Column) =
      r.getField("e") > col("__hL") && r.getField("s") <= col("__lH")
    def btwR(r: Column) = r.getField("v") >= lo && r.getField("v") <= hi
    def fixed(base: Column, f: Column => Column): Column =
      base + corr(r => btwR(r) && !inBaseR(r), f) -
        corr(r => !btwR(r) && inBaseR(r), f)
    def bBaseR(r: Column) = r.getField("e") <= col("__hL")
    def bR(r: Column) = r.getField("v") < lo
    val c = (r: Column) => r.getField("c").cast("double")
    agg.select(groupCols.map(col) ++ Seq(
      fixed(col("__aN").cast("double"), c).cast("long").as("__nt"),
      fixed(col("__aS1"), r => r.getField("v") * c(r)).as("__s1"),
      fixed(col("__aS2"), r => r.getField("v") * r.getField("v") * c(r)).as("__s2"),
      (col("__aB").cast("double") + corr(r => bR(r) && !bBaseR(r), c) -
        corr(r => !bR(r) && bBaseR(r), c)).cast("long").as("__b")): _*)
  }

  /** Convenience: compact + cumulate + select in one call, for callers that
    * do not reuse the cumulative table. Uses the fused totals window (r8):
    * the per-group size rides the cumulate sort, so the whole computation is
    * one scan + one window + one aggregation — no totals pass. */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                ps: Seq[(Double, String)]): DataFrame =
    quantilesOfCumulated(cumulate(compact(df, groupCols, valueCol), groupCols,
      valueCol, totalCol = Some("__n")), groupCols, valueCol, ps,
      totalCol = Some("__n"))
}
