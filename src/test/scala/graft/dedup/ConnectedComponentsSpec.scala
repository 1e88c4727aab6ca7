package graft.dedup

import org.apache.spark.sql.DataFrame

import graft.SparkSpecBase

/**
 * The r15 driver union-find tier of [[Dedup.connectedComponents]] must be
 * an exact drop-in for the distributed pointer-doubling loop: same rows,
 * same min-label components, on every input shape — chains (multi-round
 * convergence), stars, singleton-free pair sets, and string ids (binary
 * UTF8 ordering). Equality is asserted by running BOTH tiers on the same
 * edges (the conf cap forces the distributed loop) and comparing result
 * sets exactly.
 */
class ConnectedComponentsSpec extends SparkSpecBase {

  private def both(pairs: DataFrame): (Set[(Any, Any)], Set[(Any, Any)]) = {
    def run(): Set[(Any, Any)] =
      Dedup.connectedComponents(pairs, "left_id", "right_id")
        .collect().map(r => (r.get(0), r.get(1))).toSet
    val driver = run() // default cap: small inputs take the driver tier
    spark.conf.set("spark.graft.cc.driverEdgeCap", "-1")
    val distributed = try run()
    finally spark.conf.unset("spark.graft.cc.driverEdgeCap")
    (driver, distributed)
  }

  test("driver tier equals the distributed loop on a long chain") {
    import spark.implicits._
    // 0-1-2-...-40: one component, min label 0, needs several doubling rounds
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("left_id", "right_id")
    val (driver, distributed) = both(chain)
    assert(driver == distributed)
    assert(driver == (0L to 40L).map(i => (i: Any, 0L: Any)).toSet)
  }

  test("driver tier equals the distributed loop on stars and disjoint pairs") {
    import spark.implicits._
    val pairs = Seq(
      (100L, 101L), (100L, 102L), (100L, 103L), // star rooted at 100
      (7L, 3L),                                 // min on the right side
      (200L, 201L)                              // disjoint pair
    ).toDF("left_id", "right_id")
    val (driver, distributed) = both(pairs)
    assert(driver == distributed)
    assert(driver.toMap.apply(101L) == 100L)
    assert(driver.toMap.apply(7L) == 3L)
  }

  test("driver tier equals the distributed loop on string ids") {
    import spark.implicits._
    val pairs = Seq(("doc-b", "doc-a"), ("doc-b", "doc-c"), ("x", "y"))
      .toDF("left_id", "right_id")
    val (driver, distributed) = both(pairs)
    assert(driver == distributed)
    assert(driver.toMap.apply("doc-c") == "doc-a")
  }

  test("empty pair set yields empty labels in both tiers") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("left_id", "right_id")
    val (driver, distributed) = both(empty)
    assert(driver.isEmpty && distributed.isEmpty)
  }
}
