package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Checkpoints

/**
 * Iterative transitive closure over an edge relation (SURVEY §2.4 A13).
 *
 * The reference builds concept-ancestry by repeatedly joining
 * `concept_relationship ('Subsumes')` and unioning into an accumulator until a
 * fixpoint (`while candidate.count() != 0`) over global temp views
 * (/root/reference/src/cehrbert_data/utils/vocab_utils.py:4-64). Spark has no
 * recursive CTE, so the driver loop is the right shape; the scale hazards are
 * (a) exponential lineage growth and (b) re-shuffling the full accumulator per
 * iteration. We cut lineage with `localCheckpoint` each iteration (the
 * reference writes parquet per iteration for the same reason) and keep the
 * frontier — not the accumulator — as the join input, so each step shuffles
 * only newly discovered paths (semi-naive evaluation).
 *
 * Implementation note: Spark 4.1's `UnionBase.rewriteConstraints` throws
 * `NoSuchElementException` when re-unioning checkpointed plans here, so
 * constraint propagation is disabled for the (eager) duration of the loop and
 * restored afterwards — every action this operator triggers happens inside.
 */
object TransitiveClosure {

  private val ConstraintConf = "spark.sql.constraintPropagation.enabled"

  /**
   * Closure of `edges(childCol, parentCol)`: all (descendant, ancestor, depth)
   * pairs reachable through 1..maxIterations hops. Distinct on
   * (descendant, ancestor) keeping the minimum depth.
   */
  def closure(edges: DataFrame, childCol: String, parentCol: String,
              maxIterations: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    val prev = spark.conf.getOption(ConstraintConf)
    spark.conf.set(ConstraintConf, "false")
    try {
      val base = Checkpoints.cut(edges
        .select(col(childCol).as("descendant"), col(parentCol).as("ancestor"))
        .where(col("descendant").isNotNull && col("ancestor").isNotNull)
        .distinct()
        .withColumn("depth", lit(1)))

      var acc = base
      var frontier = acc
      var iter = 0
      var converged = false
      while (!converged && iter < maxIterations) {
        iter += 1
        // extend only the frontier: (d, a) ⋈ (a=c', p') → (d, p', depth+1)
        val extended = frontier.as("f")
          .join(base.as("e"), col("f.ancestor") === col("e.descendant"))
          .select(col("f.descendant"), col("e.ancestor"),
            (col("f.depth") + 1).as("depth"))
        // drop pairs already known (any depth) — semi-naive delta
        val novel = Checkpoints.cut(
          extended.join(acc, Seq("descendant", "ancestor"), "left_anti").distinct())
        if (novel.isEmpty) converged = true
        else {
          acc = Checkpoints.cut(acc.unionByName(novel))
          frontier = novel
        }
      }
      Checkpoints.cut(acc.groupBy("descendant", "ancestor").agg(min("depth").as("depth")))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ConstraintConf, v)
        case None    => spark.conf.unset(ConstraintConf)
      }
    }
  }
}
