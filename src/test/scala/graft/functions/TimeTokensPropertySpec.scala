package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase
import graft.functions.TimeTokens._

/**
 * ScalaCheck properties for the ATT token functions (F1–F5) against a direct
 * Scala model of the reference formulas
 * (patient_event_decorator_base.py:93-152), with the floor/ceil boundary
 * edges 7/28/30/360/1080, negative gaps, and exact multiples pinned
 * explicitly (SURVEY §5's recommended edge set).
 *
 * The Spark side is evaluated once, exhaustively, for every delta in
 * [−1500, 2000] (one DataFrame, one collect); the properties then sample
 * that range plus far-out values, so shrinkers report the exact boundary a
 * regression breaks.
 */
class TimeTokensPropertySpec extends SparkSpecBase {

  // ---- reference model (literal transcription of the Python) ----
  private def mCehrBert(d: Long): String =
    if (d < 0) "W-1"
    else if (d < 28) s"W${math.floor(d / 7.0).toLong}"
    else if (d < 360) s"M${math.floor(d / 30.0).toLong}"
    else "LT"
  private def mDay(d: Long): String = if (d < 1080) s"D$d" else "LT"
  private def mWeek(d: Long): String =
    if (d < 1080) s"W${math.floor(d / 7.0).toLong}" else "LT"
  private def mMonth(d: Long): String =
    if (d < 1080) s"M${math.floor(d / 30.0).toLong}" else "LT"
  private def mMix(d: Long): String =
    if (d <= 7) s"D$d"
    else if (d <= 30) s"W${math.ceil(d / 7.0).toLong}"
    else if (d <= 360) s"M${math.ceil(d / 30.0).toLong}"
    else "LT"

  private val lo = -1500L
  private val hi = 4500L

  /** token name → (delta → Spark-evaluated token) for the whole range. */
  private lazy val sparkTokens: Map[String, Map[Long, String]] = {
    import spark.implicits._
    val df = spark.range(lo, hi + 1).toDF("d")
      .select(col("d"),
        cehrBertToken(col("d")).as("cehr_bert"),
        dayToken(col("d")).as("day"),
        weekToken(col("d")).as("week"),
        monthToken(col("d")).as("month"),
        mixToken(col("d")).as("mix"))
    val rows = df.collect()
    Seq("cehr_bert", "day", "week", "month", "mix").map { name =>
      name -> rows.map(r => r.getAs[Long]("d") -> r.getAs[String](name)).toMap
    }.toMap
  }

  private val boundaryEdges: Seq[Long] = Seq(-360, -30, -7, -1, 0, 1, 6, 7, 8,
    27, 28, 29, 30, 31, 59, 60, 90, 359, 360, 361, 719, 720, 1079, 1080, 1081)
  private val genDelta: Gen[Long] = Gen.frequency(
    5 -> Gen.choose(lo, hi),
    3 -> Gen.oneOf(boundaryEdges),
    // exact multiples of the divisors, where floor vs ceil disagreements hide
    2 -> Gen.oneOf(Seq(7L, 30L, 90L, 360L).flatMap(m => (0L to 12L).map(_ * m))))

  private def check(name: String, model: Long => String): Unit = {
    val prop = Prop.forAllNoShrink(genDelta) { d =>
      val got = sparkTokens(name).getOrElse(d, sys.error(s"delta $d out of range"))
      val want = model(d)
      if (got != want) println(s"$name($d): spark=$got model=$want")
      got == want
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(result.passed, s"$name property failed: ${result.status}")
  }

  test("F1 cehr_bert token matches the reference formula on boundaries and random deltas") {
    check("cehr_bert", mCehrBert)
  }
  test("F2 day token matches") { check("day", mDay) }
  test("F3 week token matches (floor semantics, negative gaps included)") {
    check("week", mWeek)
  }
  test("F4 month token matches") { check("month", mMonth) }
  test("F5 mix token matches (ceil semantics at exact multiples)") {
    check("mix", mMix)
  }

  test("null delta yields null token for every function") {
    import spark.implicits._
    val row = Seq[Option[Long]](None).toDF("d")
      .select(cehrBertToken(col("d")), dayToken(col("d")), weekToken(col("d")),
        monthToken(col("d")), mixToken(col("d"))).collect()(0)
    (0 until 5).foreach(i => assert(row.isNullAt(i)))
  }
}
