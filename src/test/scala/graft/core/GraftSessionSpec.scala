package graft.core

import graft.SparkSpecBase

/** Session-factory conf contract: shuffle-width knobs are DERIVED from the
  * cluster's parallelism (a literal tuned to one sandbox caps a real
  * cluster), and the ObjectHashAggregate fallback raise is SCOPED, never
  * session-global (the key-count threshold is the only memory guard
  * unbounded-state aggregates have). */
class GraftSessionSpec extends SparkSpecBase {

  test("initialShufflePartitions derives 8x parallelism with a 256 floor") {
    // sandbox-sized hosts sit on the floor ...
    assert(GraftSession.initialShufflePartitions(4) === 256)
    assert(GraftSession.initialShufflePartitions(32) === 256)
    // ... and a 1000-core cluster is NOT capped at the sandbox literal
    assert(GraftSession.initialShufflePartitions(1000) === 8000)
    // degenerate parallelism never yields a sub-floor width
    assert(GraftSession.initialShufflePartitions(0) === 256)
  }

  test("tune() applies the derived initial partition width to the session") {
    val expected = GraftSession.initialShufflePartitions(
      spark.sparkContext.defaultParallelism).toString
    assert(spark.conf.get(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum") === expected)
  }

  test("object-agg fallback threshold stays at Spark's default globally") {
    // the r7 session-wide raise removed the only memory guard unbounded
    // aggregates (collect_list/collect_set) have — the raise must be scoped
    assert(spark.conf.get(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold") === "128")
  }

  test("withObjectAggFallbackKeys raises inside the scope and restores after") {
    val conf = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.get(conf)
    val inside = GraftSession.withObjectAggFallbackKeys(spark, 1L << 21) {
      spark.conf.get(conf)
    }
    assert(inside === (1L << 21).toString)
    assert(spark.conf.get(conf) === before)
    // restores even when the body throws
    intercept[RuntimeException] {
      GraftSession.withObjectAggFallbackKeys(spark, 4096L) {
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(conf) === before)
  }
}
