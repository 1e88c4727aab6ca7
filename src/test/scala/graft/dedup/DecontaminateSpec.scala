package graft.dedup

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class DecontaminateSpec extends SparkSpecBase {

  import spark.implicits._

  // Hand-checkable corpus: doc 1 embeds eval doc 100's opening 4-gram
  // twice (still ONE distinct shingle); doc 2 shares a full 5-token run
  // (two overlapping 4-grams); doc 3 shares nothing.
  private lazy val train = Seq(
    (1L, "alpha beta gamma delta noise alpha beta gamma delta"),
    (2L, "x p q r s t y"),
    (3L, "totally disjoint words here man")).toDF("doc_id", "text")

  private lazy val evalSet = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "p q r s t")).toDF("doc_id", "text")

  test("overlap counts DISTINCT shared shingles per contaminated train doc") {
    val out = Decontaminate.overlap(train, evalSet, "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    // doc 1: "alpha beta gamma delta" appears twice but counts once;
    // "beta gamma delta epsilon" never appears in doc 1
    assert(out === Map(1L -> 1L, 2L -> 2L), out.toString)
  }

  test("docs shorter than n never match, and an empty eval set flags nothing") {
    val shortTrain = Seq((7L, "p q r")).toDF("doc_id", "text")
    assert(Decontaminate.overlap(shortTrain, evalSet, "doc_id", "text", 4).count() === 0)
    val emptyEval = evalSet.filter(col("doc_id") < 0)
    assert(Decontaminate.overlap(train, emptyEval, "doc_id", "text", 4).count() === 0)
  }

  test("tokenization is case/whitespace-normalized like the rest of the dedup family") {
    val shouting = Seq((9L, "  ALPHA   beta GAMMA delta  ")).toDF("doc_id", "text")
    val out = Decontaminate.overlap(shouting, evalSet, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    assert(out === Map(9L -> 1L))
  }

  test("the corpus side never shuffles before the eval join (broadcast plan)") {
    val plan = Decontaminate.overlap(train, evalSet, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only exchanges are the eval-side distinct, the broadcast, and
    // the post-match aggregation — none re-partition the exploded corpus
    // stream before the join (a SortMergeJoin would)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
