package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class SamplingSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val rows = (0L until 10000L).map(i =>
    (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    .toDF("id", "stratum")

  test("uniform sample is deterministic, key-driven, and rate-accurate") {
    val s1 = Sampling.uniform(rows, col("id"), 0.3).select("id").as[Long].collect().toSet
    val s2 = Sampling.uniform(rows, col("id"), 0.3).select("id").as[Long].collect().toSet
    assert(s1 === s2) // same rows every run — no rand(), no partitioning dependence
    // binomial(10000, 0.3): sd ≈ 46, assert within ±5 sd
    assert(math.abs(s1.size - 3000) < 230, s"got ${s1.size}")
    // membership matches the arithmetic spelled out by hand
    val manual = (0L until 10000L).filter(k =>
      ((k % 2147483648L) * 1103515245L + 12345L) % 2147483648L < (0.3 * (1L << 31)).toLong).toSet
    assert(s1 === manual)
  }

  test("samples NEST across rates: growing a training set never resamples history") {
    val small = Sampling.uniform(rows, col("id"), 0.05).select("id").as[Long].collect().toSet
    val big = Sampling.uniform(rows, col("id"), 0.20).select("id").as[Long].collect().toSet
    assert(small.subsetOf(big), "the 5% sample must be a subset of the 20% sample")
  }

  test("stratified rates apply per stratum; unlisted strata drop entirely") {
    val out = Sampling.stratified(rows, col("stratum"), col("id"),
        Map("a" -> 1.0, "b" -> 0.25))
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(out("a") === 3334L) // rate 1.0 keeps every 'a' row
    assert(!out.contains("c")) // unlisted stratum gone
    assert(math.abs(out("b") - 833L) < 150, s"got ${out("b")}") // ≈ 3333 · 0.25
  }

  test("capPerGroup: exact cap, deterministic survivors, uniform within the group") {
    val out1 = Sampling.capPerGroup(rows, col("stratum"), col("id"), 100)
    val out2 = Sampling.capPerGroup(rows, col("stratum"), col("id"), 100)
    val ids1 = out1.select("id").as[Long].collect().toSet
    assert(ids1 === out2.select("id").as[Long].collect().toSet) // repeatable
    val counts = out1.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ == 100L), counts.toString)
    // survivors are hash-chosen, not "first 100 ids": ids span the range
    val aIds = out1.filter(col("stratum") === "a").select("id").as[Long].collect()
    assert(aIds.max > 8000L && aIds.min < 2000L, s"range ${aIds.min}..${aIds.max}")
    // groups smaller than the cap pass through whole
    val tiny = Sampling.capPerGroup(rows.filter(col("id") < 9), col("stratum"), col("id"), 100)
    assert(tiny.count() === 9L)
  }

  test("capPerGroup plans as WindowGroupLimit: map-side partial top-k before the exchange") {
    val plan = Sampling.capPerGroup(rows, col("stratum"), col("id"), 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("the sampling predicate is a pure filter: no shuffle, no exchange") {
    val plan = Sampling.stratified(rows, col("stratum"), col("id"),
      Map("a" -> 0.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // 3:1 skew between two groups for the temperature tests
  private lazy val skewed = (0L until 8000L).map(i =>
    (i, if (i % 4 == 0) "small" else "big")).toDF("id", "grp")

  test("temperatureMix: alpha=1 keeps everything, alpha=0 balances, 0.5 is sqrt") {
    assert(Sampling.temperatureMix(skewed, col("grp"), col("id"), 1.0).count() === 8000L)
    val bal = Sampling.temperatureMix(skewed, col("grp"), col("id"), 0.0)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(bal("small") === 2000L) // smallest group keeps rate 1
    // big sampled at 2000/6000: binomial sd ≈ 36, assert ±5 sd
    assert(math.abs(bal("big") - 2000L) < 180, bal.toString)
    val sq = Sampling.temperatureMix(skewed, col("grp"), col("id"), 0.5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    // rate_big = sqrt(2000/6000) ≈ 0.577 → ≈ 3464 kept
    assert(math.abs(sq("big") - 3464L) < 220, sq.toString)
  }

  test("temperatureMix: deterministic, and lower alpha keeps a nested subset") {
    val a = Sampling.temperatureMix(skewed, col("grp"), col("id"), 0.5)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(skewed, col("grp"), col("id"), 0.5)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    val flat = Sampling.temperatureMix(skewed, col("grp"), col("id"), 0.0)
      .select("id").as[Long].collect().toSet
    assert(flat.subsetOf(a), "alpha=0 sample must nest inside alpha=0.5")
  }

  test("splitByCluster: cluster members land on one side; singletons split by their id") {
    // clusters: {0,1,2} labeled 0, {10,11} labeled 10; 3..9 singletons
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("node", "component")
    val docs = (0L until 12L).toDF("id")
    val out = Sampling.splitByCluster(docs, col("id"), clusters,
        "node", "component", trainRate = 0.8)
      .select("id", "split_key", "split")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size === 12)
    // whole clusters move together
    assert(Set(out(0L), out(1L), out(2L)).size === 1)
    assert(out(10L) === out(11L))
    // cluster members split by the COMPONENT's hash, singletons by their own
    def side(k: Long) =
      if (((k % 2147483648L) * 1103515245L + 12345L) % 2147483648L <
          (0.8 * (1L << 31)).toLong) "train" else "test"
    assert(out(2L)._2 === side(0L))
    assert(out(7L) === ((7L, side(7L))))
  }

  test("splitByCluster: growing trainRate only moves whole clusters into train") {
    val clusters = Seq((0L, 0L), (1L, 0L)).toDF("node", "component")
    val docs = (0L until 2000L).toDF("id")
    def trainSet(rate: Double) =
      Sampling.splitByCluster(docs, col("id"), clusters, "node", "component", rate)
        .filter(col("split") === "train").select("id").as[Long].collect().toSet
    val half = trainSet(0.5)
    val most = trainSet(0.9)
    assert(half.subsetOf(most))
  }

  test("temperatureMix: the corpus joins the rate table by broadcast, never shuffles") {
    val plan = Sampling.temperatureMix(skewed, col("grp"), col("id"), 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
