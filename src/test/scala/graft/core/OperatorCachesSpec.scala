package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.dedup.{Dedup, MinHash}

/** The operator-cache lifecycle contract: corpus-scale intermediates
  * persisted inside multi-phase operators are released once the first
  * action over the operator's result succeeds, and results stay correct
  * afterwards (recompute path). */
class OperatorCachesSpec extends SparkSpecBase {

  private def docs = {
    import spark.implicits._
    (1 to 40).map { i =>
      val text = if (i % 4 == 0) "the quick brown fox jumps over the lazy dog"
      else s"document number $i with some distinct words $i ${i * 7}"
      (i.toLong, text)
    }.toDF("doc_id", "text")
  }

  private def await(cond: => Boolean, ms: Long = 15000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(100)
    cond
  }

  test("near-dup caches are released after the result's first action") {
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val pendingBefore = OperatorCaches.pending(spark)

    val result = MinHash.nearDuplicates(docs, "doc_id", col("text"),
      threshold = 0.8, maxBucketSize = Some(5), exactStar = true)
    assert(OperatorCaches.pending(spark) > pendingBefore,
      "operator registered no owned caches")

    val n1 = result.count()
    assert(await(OperatorCaches.pending(spark) == pendingBefore),
      "registered caches were not released after the action")
    assert(await(
      spark.sparkContext.getPersistentRDDs.keySet.subsetOf(rddsBefore)),
      "persisted intermediate RDDs survived the release")

    // recompute path: releasing a cache never changes the result
    assert(result.count() === n1)
  }

  test("short-circuit (un-capped data) path releases the shingle base too") {
    val pendingBefore = OperatorCaches.pending(spark)
    // high cap → freqSet empty → adaptive short-circuit, sh still persisted
    val result = Dedup.ngramJaccardBlocked(docs, "doc_id", lit(1),
      col("text"), threshold = 0.5, maxShingleDocFreq = Some(1000))
    assert(OperatorCaches.pending(spark) > pendingBefore)
    result.count()
    assert(await(OperatorCaches.pending(spark) == pendingBefore))
  }

  test("releaseAll frees caches of never-materialized results") {
    val before = OperatorCaches.pending(spark)
    MinHash.nearDuplicates(docs, "doc_id", col("text"),
      threshold = 0.8, maxBucketSize = Some(5))
    assert(OperatorCaches.pending(spark) > before)
    OperatorCaches.releaseAll(spark)
    assert(OperatorCaches.pending(spark) === 0)
  }

  test(".rdd conversion releases entries (Spark 4.x posts the event at force time)") {
    // Pins the Spark-4.1 behavior the CONTRACT scaladoc documents: the
    // Dataset.rdd lazy val posts its own QueryExecutionListener event when
    // forced, so the IdAllocator zipWithIndex path does NOT leak — but the
    // release lands BEFORE the caller's RDD job runs (recompute, not reuse).
    // A Spark upgrade changing either half should fail here first.
    import spark.implicits._
    OperatorCaches.releaseAll(spark)
    val inter = Seq(1).toDF("x").persist()
    inter.count()
    val res = OperatorCaches.owned(inter.select((col("x") + 1).as("y")), Seq(inter))
    assert(OperatorCaches.pending(spark) === 1)
    val rdd = res.rdd // conversion only — no RDD action yet
    assert(await(OperatorCaches.pending(spark) == 0),
      ".rdd force did not post the release event — Spark behavior changed? " +
        "Re-verify the OperatorCaches CONTRACT scaladoc")
    assert(rdd.count() === 1L, "released result must still recompute correctly")
  }

  test("skipMatches=1 survives the operator's own force, releases on the caller's") {
    // the scoped-conf aggregate paths (Knn.topKByAgg, SimHash.fingerprints)
    // persist + force their own output before returning it; the internal
    // force is a matching action that must NOT release the cache
    import spark.implicits._
    OperatorCaches.releaseAll(spark)
    val out = Seq(1, 2, 3).toDF("x").select((col("x") * 2).as("y")).persist()
    OperatorCaches.owned(out, Seq(out), skipMatches = 1)
    out.count() // the operator's internal force — consumed by the skip
    // the skip is consumed asynchronously; wait for the event, then confirm
    // the entry is still pending and the cache still live
    Thread.sleep(500)
    assert(OperatorCaches.pending(spark) === 1,
      "internal force released the entry despite skipMatches = 1")
    assert(out.storageLevel.useMemory || out.storageLevel.useDisk,
      "cache was dropped before the caller's action")
    assert(out.count() === 3L) // the caller's first action
    assert(await(OperatorCaches.pending(spark) == 0),
      "caller's action after the skip did not release the entry")
  }

  test("never-materialized results trip the pending-growth warning once") {
    import spark.implicits._
    OperatorCaches.releaseAll(spark)
    assert(!OperatorCaches.pendingWarned(spark))
    val n = OperatorCaches.PendingWarnThreshold + 1
    (1 to n).foreach { i =>
      val inter = Seq(i).toDF("x").persist()
      inter.count()
      // built and registered, then discarded without any action or .rdd
      // force — the genuine CONTRACT leak
      OperatorCaches.owned(inter.select((col("x") + i).as("y")), Seq(inter))
    }
    assert(OperatorCaches.pending(spark) === n,
      "unmaterialized results should stay pending")
    assert(OperatorCaches.pendingWarned(spark),
      "pending-growth warning did not fire past the threshold")
    OperatorCaches.releaseAll(spark)
    assert(OperatorCaches.pending(spark) === 0)
    assert(!OperatorCaches.pendingWarned(spark),
      "releaseAll should reset the warning so a fresh leak warns again")
  }
}
