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

  test("the sampling predicate is a pure filter: no shuffle, no exchange") {
    val plan = Sampling.stratified(rows, col("stratum"), col("id"),
      Map("a" -> 0.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
