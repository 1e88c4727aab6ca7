package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Top-k-per-group (SURVEY §2.5 W12): the reference's pervasive
 * `row_number() OVER (PARTITION BY ... ORDER BY ...) = 1` idiom
 * (/root/reference/src/cehrbert_data/utils/spark_utils.py:748-752,
 * cohorts/spark_app_base.py:517-529, decorators/death_event_decorator.py:40-53).
 *
 * Scale: a single shuffle on the group keys. For k=1 Catalyst rewrites the
 * rank-then-filter into a partial top-k (`WindowGroupLimit`) that prunes
 * per-partition before the shuffle — confirmed in the physical plan — so this
 * beats `groupBy(...).agg(max_by(...))` on wide rows and generalizes to k>1.
 */
object TopKPerGroup {

  /** Keep the top `k` rows per group by `order`; ensure `order` is a total
    * order (add a unique tiebreaker) for deterministic output. */
  def topK(df: DataFrame, groupCols: Seq[String], order: Seq[Column], k: Int,
           rankCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    val ranked = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
    rankCol match {
      case Some(name) => ranked.withColumnRenamed("__rn", name)
      case None       => ranked.drop("__rn")
    }
  }

  def top1(df: DataFrame, groupCols: Seq[String], order: Seq[Column]): DataFrame =
    topK(df, groupCols, order, 1)
}
