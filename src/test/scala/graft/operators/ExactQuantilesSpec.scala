package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/**
 * Bit-exact equivalence of the sort-based rank selection against Spark's
 * own `percentile` TypedImperativeAggregate — the operator's whole claim is
 * "same doubles, scale-safe plan", so every comparison here is `==` on raw
 * doubles, never approximate.
 */
class ExactQuantilesSpec extends SparkSpecBase {

  import spark.implicits._

  private val ps = Seq(0.0 -> "q000", 0.01 -> "q001", 0.25 -> "q025",
    0.5 -> "q050", 0.99 -> "q099", 1.0 -> "q100")

  private def udafReference(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.map(_._1).mkString(",")}))").as("qs"))
      .select(col("g") +: ps.zipWithIndex.map { case ((_, n), i) =>
        col("qs").getItem(i).as(n)
      }: _*)

  private def assertMatches(df: org.apache.spark.sql.DataFrame): Unit = {
    val got = ExactQuantiles.quantiles(df, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) -> r).toMap
    val want = udafReference(df).collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet)
    for (g <- want.keySet; (_, name) <- ps) {
      val (a, b) = (got(g).getAs[Double](name), want(g).getAs[Double](name))
      assert(a == b, s"group $g quantile $name: rank-select $a != percentile $b")
    }
  }

  test("matches percentile bit-for-bit on random data with duplicates") {
    val rnd = new scala.util.Random(7)
    // duplicated values (rounded draws) force frequency > 1 in the
    // compaction; three groups with co-prime sizes cover odd/even n
    val rows = (1 to 997).map(i =>
      (s"g${i % 3}", math.floor(rnd.nextDouble() * 500) / 10 + (i % 5) * 0.001))
    assertMatches(rows.toDF("g", "v"))
  }

  test("matches percentile on degenerate groups: single row, all-equal, two values") {
    val rows = Seq("a" -> 42.0) ++
      (1 to 50).map(_ => "b" -> 7.5) ++
      (1 to 30).map(i => "c" -> (if (i % 2 == 0) 1.0 else 2.0))
    assertMatches(rows.toDF("g", "v"))
  }

  test("weighted form matches percentile(v, p, freq) on a pre-compacted table") {
    val rnd = new scala.util.Random(13)
    val compacted = (1 to 200).map(i =>
      (s"g${i % 2}", rnd.nextDouble() * 1000, 1L + rnd.nextInt(9).toLong))
      .toDF("g", "v", "__cnt")
      // compaction invariant: one row per (group, value)
      .groupBy("g", "v").agg(sum("__cnt").as("__cnt"))
    val cum = ExactQuantiles.cumulate(compacted, Seq("g"), "v")
    val got = ExactQuantiles.quantilesOfCumulated(cum, Seq("g"), "v", ps)
      .collect().map(r => r.getString(0) -> r).toMap
    val want = compacted.groupBy("g")
      .agg(expr(s"percentile(v, array(${ps.map(_._1).mkString(",")}), __cnt)").as("qs"))
      .select(col("g") +: ps.zipWithIndex.map { case ((_, n), i) =>
        col("qs").getItem(i).as(n)
      }: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    for (g <- want.keySet; (_, name) <- ps) {
      val (a, b) = (got(g).getAs[Double](name), want(g).getAs[Double](name))
      assert(a == b, s"group $g quantile $name: rank-select $a != percentile $b")
    }
  }

  test("plan has no ObjectHashAggregate and exactly one window sort") {
    val df = (1 to 100).map(i => (s"g${i % 2}", i.toDouble)).toDF("g", "v")
    val plan = ExactQuantiles.quantiles(df, Seq("g"), "v", Seq(0.5 -> "q050"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"), "percentile-style object agg leaked in")
    // the totals branch must not re-instantiate the window (Catalyst prunes
    // it once totals come from the frequency column), so an UNPERSISTED cum
    // costs exactly one per-group sort — the operator's headline property
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"expected exactly 1 Window node, found $windows:\n$plan")
  }

  test("cumulateRangeParallel emits exactly cumulate's rows (r8 parallel sort)") {
    val rnd = new scala.util.Random(31)
    // multiple groups, duplicated values (freq > 1), enough distinct values
    // to straddle several range partitions at the test session's width
    val compacted = ExactQuantiles.compact(
      (1 to 4000).map(i => (s"g${i % 3}", math.floor(rnd.nextDouble() * 300)))
        .toDF("g", "v"), Seq("g"), "v")
    val want = ExactQuantiles.cumulate(compacted, Seq("g"), "v")
      .collect().map(_.toSeq).toSet
    val got = ExactQuantiles.cumulateRangeParallel(compacted, Seq("g"), "v")
      .collect().map(_.toSeq).toSet
    assert(got === want)
    // and the quantiles read off it are bit-identical to the window form
    val a = ExactQuantiles.quantilesOfCumulated(
      ExactQuantiles.cumulateRangeParallel(compacted, Seq("g"), "v"),
      Seq("g"), "v", ps).collect().map(r => r.getString(0) -> r.toSeq).toMap
    val b = ExactQuantiles.quantilesOfCumulated(
      ExactQuantiles.cumulate(compacted, Seq("g"), "v"),
      Seq("g"), "v", ps).collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(a === b)
    // fused totals column (r8): identical between the two variants, and the
    // quantiles read through it are bit-identical too
    val wantT = ExactQuantiles.cumulate(compacted, Seq("g"), "v",
      totalCol = Some("__n")).collect().map(_.toSeq).toSet
    val gotT = ExactQuantiles.cumulateRangeParallel(compacted, Seq("g"), "v",
      totalCol = Some("__n")).collect().map(_.toSeq).toSet
    assert(gotT === wantT)
    val c = ExactQuantiles.quantilesOfCumulated(
      ExactQuantiles.cumulateRangeParallel(compacted, Seq("g"), "v",
        totalCol = Some("__n")),
      Seq("g"), "v", ps, totalCol = Some("__n"))
      .collect().map(r => r.getString(0) -> r.toSeq).toMap
    assert(c === b)
  }

  test("NULL values are ignored, matching percentile") {
    val df = Seq("a" -> Some(1.0), "a" -> None, "a" -> Some(2.0),
      "a" -> Some(3.0), "a" -> None, "b" -> None).toDF("g", "v")
    val got = ExactQuantiles.quantiles(df, Seq("g"), "v",
        Seq(0.0 -> "q0", 0.5 -> "q50", 1.0 -> "q100"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // group b (all NULL) vanishes, exactly as under percentile
    assert(got == Map("a" -> ((1.0, 2.0, 3.0))))
  }

  /** The TWO-PASS reference the fused form must match bit-for-bit: bounds
    * via quantilesOfCumulated, then a conditional aggregation joined
    * against them — the shape a10 shipped through round 8. */
  private def twoPassTrimmed(cum: org.apache.spark.sql.DataFrame,
                             pLo: Double, pHi: Double) = {
    val bounds = ExactQuantiles.quantilesOfCumulated(cum, Seq("g"), "v",
      Seq(pLo -> "__lo", pHi -> "__hi"), totalCol = Some("__n"))
    val btw = col("v").between(col("__lo"), col("__hi"))
    cum.join(broadcast(bounds), Seq("g"))
      .groupBy("g")
      .agg(sum(when(btw, col("__cnt"))).as("__nt"),
        sum(when(btw, col("v") * col("__cnt"))).as("__s1"),
        sum(when(btw, col("v") * col("v") * col("__cnt"))).as("__s2"),
        coalesce(sum(when(col("v") < col("__lo"), col("__cnt"))), lit(0L)).as("__b"))
      .filter(col("__nt").isNotNull)
  }

  test("trimmedMoments (one-pass, index-space) equals the two-pass bounds shape exactly") {
    val rnd = new scala.util.Random(23)
    // many random multisets of co-prime-ish sizes, heavy duplication, plus
    // degenerate shapes: single row, all-equal, two distinct values — the
    // covering-row corrections are exactly what these exercise
    val rows = (1 to 600).map { i =>
      (s"g${i % 7}", math.floor(rnd.nextDouble() * 40) / 4 + (i % 3) * 0.125)
    } ++ Seq(("one", 42.0)) ++ (1 to 9).map(_ => ("same", 7.5)) ++
      (1 to 10).map(i => ("twoval", if (i % 2 == 0) 1.0 else 2.0))
    val cum = ExactQuantiles.cumulate(
      ExactQuantiles.compact(rows.toDF("g", "v"), Seq("g"), "v"),
      Seq("g"), "v", totalCol = Some("__n"))
      .persist()
    try {
      for ((pLo, pHi) <- Seq(0.01 -> 0.99, 0.1 -> 0.9, 0.0 -> 1.0,
        0.25 -> 0.75, 0.5 -> 0.5)) {
        val want = twoPassTrimmed(cum, pLo, pHi).collect()
          .map(r => r.getString(0) ->
            (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
        val got = ExactQuantiles.trimmedMoments(cum, Seq("g"), "v", pLo, pHi)
          .filter(col("__nt") > 0).collect()
          .map(r => r.getString(0) ->
            (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
        assert(got == want, s"trim [$pLo, $pHi]: fused != two-pass\n" +
          s"got  $got\nwant $want")
      }
    } finally { cum.unpersist(); () }
  }
}
