package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class VocabStatsSpec extends SparkSpecBase {

  import spark.implicits._

  // df: common=4 docs, mid=3, odd=2, unicorn=1 → median df 2.5;
  // common set (df >= 2.5) = {common, mid}
  private lazy val docs = Seq(
    (1L, "common mid odd unicorn"),
    (2L, "common mid odd"),
    (3L, "common mid"),
    (4L, "common common common")).toDF("doc_id", "text")

  test("docFrequency counts documents, not occurrences") {
    val df = VocabStats.docFrequency(docs, col("text"))
      .as[(String, Long)].collect().toMap
    assert(df === Map("common" -> 4L, "mid" -> 3L, "odd" -> 2L, "unicorn" -> 1L))
  }

  test("rareTokenStats: hand-checked fractions against the median-df split") {
    val out = VocabStats.rareTokenStats(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((4L, 2L, 0.5)))      // odd + unicorn rare
    assert(out(2L) === ((3L, 1L, 1.0 / 3)))  // odd rare
    assert(out(3L) === ((2L, 0L, 0.0)))
    assert(out(4L) === ((3L, 0L, 0.0)))      // occurrences, not distinct
  }

  test("empty docs drop out; the cap keeps the highest-df tokens") {
    val withEmpty = docs.union(Seq((9L, "")).toDF("doc_id", "text"))
    val out = VocabStats.rareTokenStats(withEmpty, col("doc_id"), col("text"))
    assert(!out.select("doc_id").as[Long].collect().contains(9L))
    // cap of 1 keeps only the top-df token ("common"): everything else rare
    val capped = VocabStats.rareTokenStats(docs, col("doc_id"), col("text"),
        maxCommon = 1)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(capped === Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("membership joins by broadcast: the occurrence stream never sort-merges") {
    val plan = VocabStats.rareTokenStats(docs, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
