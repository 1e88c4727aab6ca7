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
}
