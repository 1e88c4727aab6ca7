package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class RepetitionSpec extends SparkSpecBase {

  import spark.implicits._

  private def stats(texts: (Long, String)*): Map[Long, (Int, Double)] =
    texts.toDF("id", "text")
      .select(col("id"), Exprs.let(TextFunctions.tokens(col("text"))) { ts =>
        org.apache.spark.sql.functions.struct(
          TextFunctions.topTokenCount(ts).as("top"),
          TextFunctions.dupNgramFraction(ts, 2).as("dup2"))
      }.as("r"))
      .select(col("id"), col("r.top"), col("r.dup2"))
      .as[(Long, Int, Double)].collect()
      .map { case (i, t, d) => i -> (t, d) }.toMap

  test("topTokenCount counts the modal token; dupNgramFraction counts repeated 2-grams") {
    val out = stats(
      1L -> "a b a b a",        // 'a'×3; 2-grams: ab ba ab ba → 4 total, 2 distinct
      2L -> "w x y z",          // all unique; 3 distinct 2-grams, no repeats
      3L -> "spam spam spam spam") // one token ×4; 2-grams all "spam spam"
    assert(out(1L) === ((3, 0.5)))
    assert(out(2L) === ((1, 0.0)))
    assert(out(3L) === ((4, 2.0 / 3.0)))
  }

  test("degenerate docs: empty and single-token") {
    val out = stats(1L -> "", 2L -> "word")
    assert(out(1L) === ((0, 0.0)))
    assert(out(2L) === ((1, 0.0))) // no 2-grams below n tokens
  }

  test("repetition stats are per-row compute: no exchange in the plan") {
    val plan = Seq((1L, "a b a")).toDF("id", "text")
      .select(col("id"), Exprs.let(TextFunctions.tokens(col("text"))) { ts =>
        TextFunctions.topTokenCount(ts)
      }.as("top"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
