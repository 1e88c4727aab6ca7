package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpecBase

/**
 * ScalaCheck property: [[ExactQuantiles]] is bit-for-bit equal to Spark's
 * own `percentile` TypedImperativeAggregate on ARBITRARY inputs — group
 * sizes 1-1000, value domains from heavily-duplicated small lattices to
 * extreme magnitudes, p drawn from [0, 1] including the exact endpoints,
 * plus interspersed NULLs. The fixed-seed tests in `ExactQuantilesSpec`
 * pin known shapes; this property is the hedge against Spark changing
 * `Percentile` internals in a way those shapes miss — every comparison is
 * `==` on raw doubles, never approximate. The reference side is the real
 * `percentile` aggregate (not a Scala model) so a behavior change in
 * Spark itself fails the property.
 *
 * Spark-action accounting: a Spark job costs seconds regardless of row
 * count, so each ScalaCheck evaluation BATCHES several independent group
 * scenarios (distinct group keys, one shared p-list) into one DataFrame —
 * 25 evaluations × 5 groups ≥ 125 generated group scenarios for ~50
 * actions total, instead of the 200+ actions a case-per-group design
 * would cost.
 */
class ExactQuantilesPropertySpec extends SparkSpecBase {

  import spark.implicits._

  private final case class Batch(groups: List[(String, List[Option[Double]])],
                                 ps: List[Double])

  private val GroupsPerBatch = 5
  private val MinBatches = 25

  // heavy duplication on purpose: a coarse lattice makes freq > 1 the
  // common case in the compaction, which is where rank arithmetic can
  // drift from the UDAF's per-value map
  private val genValue: Gen[Double] = Gen.frequency(
    5 -> Gen.choose(0, 24).map(_.toDouble / 4),
    2 -> Gen.choose(-1e6, 1e6),
    1 -> Gen.oneOf(0.0, 1e-300, 1e300, math.Pi, -math.E))

  private val genCell: Gen[Option[Double]] =
    Gen.frequency(9 -> genValue.map(Some(_)), 1 -> Gen.const(None))

  private val genSize: Gen[Int] = Gen.frequency(
    4 -> Gen.choose(1, 40), 2 -> Gen.choose(41, 300), 1 -> Gen.choose(301, 1000))

  private val genGroup: Gen[List[Option[Double]]] = for {
    n <- genSize
    cells <- Gen.listOfN(n - 1, genCell)
    head <- genValue // ≥1 non-NULL per group, so the group exists on both sides
  } yield Some(head) :: cells

  private val genP: Gen[Double] = Gen.frequency(
    1 -> Gen.const(0.0), 1 -> Gen.const(1.0), 1 -> Gen.const(0.5),
    5 -> Gen.choose(0.0, 1.0))

  private val genBatch: Gen[Batch] = for {
    groups <- Gen.listOfN(GroupsPerBatch, genGroup)
    nPs <- Gen.choose(1, 5)
    ps <- Gen.listOfN(nPs, genP)
  } yield Batch(groups.zipWithIndex.map { case (vs, i) => (s"g$i", vs) }, ps)

  test("matches percentile bit-for-bit on arbitrary groups, sizes, domains, and p") {
    var groupScenarios = 0
    val prop = Prop.forAllNoShrink(genBatch) { c =>
      groupScenarios += c.groups.size
      val df = c.groups.flatMap { case (g, vs) => vs.map(g -> _) }
        .toDF("g", "v")
      val named = c.ps.zipWithIndex.map { case (p, i) => p -> s"q$i" }
      val got = ExactQuantiles.quantiles(df, Seq("g"), "v", named)
        .collect().map(r => r.getString(0) -> r).toMap
      val want = df.groupBy("g")
        .agg(expr(s"percentile(v, array(${c.ps.mkString(",")}))").as("qs"))
        .select(col("g") +: named.zipWithIndex.map { case ((_, n), i) =>
          col("qs").getItem(i).as(n)
        }: _*)
        .collect().map(r => r.getString(0) -> r).toMap
      val sameGroups = got.keySet == want.keySet
      val sameValues = sameGroups && want.keySet.forall { g =>
        named.forall { case (_, n) =>
          val (a, b) = (got(g).getAs[Double](n), want(g).getAs[Double](n))
          val ok = a == b
          if (!ok) println(s"group $g $n: rank-select $a != percentile $b (ps=${c.ps})")
          ok
        }
      }
      if (!sameGroups) println(s"group sets differ: ${got.keySet} vs ${want.keySet}")
      sameGroups && sameValues
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(MinBatches), prop)
    assert(result.passed, s"ExactQuantiles property failed: ${result.status}")
    assert(groupScenarios >= 100,
      s"expected >=100 generated group scenarios, got $groupScenarios")
  }
}
