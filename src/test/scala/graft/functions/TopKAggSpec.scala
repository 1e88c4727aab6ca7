package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.SparkSpecBase

/**
 * [[TopKPairsAggregate]] must replicate the
 * `row_number() OVER (ORDER BY cosine DESC, neighbor_id ASC) <= k` window
 * bit-for-bit — it replaces that window in the ANN paths precisely because
 * the window's pre-limit sort spills stream-proportionally (the sf100
 * disk-exhaustion failure; see the aggregate's scaladoc). Ties and
 * cross-partition partial/final merges are the risky paths.
 */
class TopKAggSpec extends SparkSpecBase {

  import spark.implicits._

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val top = ColumnBridge.column(TopKPairsAggregate(
      ColumnBridge.expression(col("neighbor_id")),
      ColumnBridge.expression(col("cosine")), k).toAggregateExpression())
    df.groupBy("query_id").agg(top.as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__p", "__t")))
      .select(col("query_id"), col("__t.neighbor_id").as("neighbor_id"),
        (col("__p") + 1).cast("int").as("rank"), col("__t.cosine").as("cosine"))
  }

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cosine")
  }

  // deterministic scored pairs with heavy score ties: 50 queries × 40
  // neighbors, scores drawn from only 5 distinct values so tie-breaks on
  // neighbor_id decide most ranks
  private lazy val scored = {
    val rnd = new scala.util.Random(3)
    (for (q <- 0L until 50L; n <- 0L until 40L if q != n)
      yield (q, n, (rnd.nextInt(5) * 0.25) - 0.5)).toDF("query_id", "neighbor_id", "cosine")
      .repartition(13) // force partial buffers to merge across partitions
  }

  test("agg top-k equals the window formulation exactly, ties included") {
    for (k <- Seq(1, 3, 7)) {
      val a = aggTopK(scored, k).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      val w = windowTopK(scored, k).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(a == w, s"k=$k mismatch: agg-only=${(a -- w).take(5)} window-only=${(w -- a).take(5)}")
    }
  }

  test("groups with fewer than k rows emit all rows, ranked") {
    val tiny = Seq((1L, 10L, 0.9), (1L, 11L, 0.8)).toDF("query_id", "neighbor_id", "cosine")
    val out = aggTopK(tiny, 5).orderBy("rank").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 10L && out(0).getInt(2) == 1)
    assert(out(1).getLong(1) == 11L && out(1).getInt(2) == 2)
  }

  test("duplicate candidates collapse to one slot (distinct-free streams)") {
    // the LSH path feeds the raw multi-table candidate stream with NO
    // upstream distinct(); a pair colliding in several tables arrives once
    // per collision with a bit-identical score and must not eat extra slots
    val dups = scored.union(scored).union(scored.limit(700))
    for (k <- Seq(1, 3, 7)) {
      val a = aggTopK(dups, k).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      val w = windowTopK(scored, k).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      assert(a == w, s"k=$k duplicated-stream mismatch")
    }
  }

  test("different-score duplicate keeps the best occurrence, never two slots") {
    val buf = new TopKPairsBuffer(3)
    buf.insert(10L, 0.5); buf.insert(11L, 0.4); buf.insert(12L, 0.3)
    buf.insert(11L, 0.9) // defensive path: same id, better score
    assert(buf.n == 3)
    assert(buf.ids.take(3).toSeq == Seq(11L, 10L, 12L))
    assert(buf.scores.take(3).toSeq == Seq(0.9, 0.5, 0.3))
    buf.insert(11L, 0.1) // worse occurrence of a buffered id: ignored
    assert(buf.ids.take(3).toSeq == Seq(11L, 10L, 12L))
    assert(buf.scores.take(3).toSeq == Seq(0.9, 0.5, 0.3))
  }

  test("plan is a hash aggregate, not a sort + window") {
    val plan = aggTopK(scored, 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), "bounded buffer must hash-aggregate")
    assert(!plan.contains("Window"), "the whole point is no window sort")
  }
}
