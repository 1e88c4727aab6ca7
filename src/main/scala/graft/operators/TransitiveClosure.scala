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

      // DRIVER tier (r15 optimization, mirroring connectedComponents'): each
      // distributed round costs a join + anti-join + localCheckpoint + a
      // convergence action — fixed driver-coordinated overhead that dwarfs
      // the actual work on small hierarchies. Below the edge cap the same
      // semi-naive evaluation runs in driver memory (equality/hashing only,
      // so any id type), bailing back to the loop if the closure outgrows
      // the pair cap (work and memory stay bounded either way; the bail
      // recomputes distributed — only pathological fan-out pays it twice,
      // and only once per call). BFS rounds discover each pair at its
      // minimum depth, exactly the loop's min(depth) fixpoint.
      val driverCap = graft.core.Tunables.long(spark,
        "spark.graft.closure.driverEdgeCap", DriverEdgeCap)
      val nEdges = base.count()
      if (nEdges <= driverCap) {
        driverClosure(base, maxIterations) match {
          case Some(out) => return out
          case None => // pair cap exceeded — fall through to the loop
        }
      } else {
        graft.core.Decisions.record(s"closure.driverTier(edges=$nEdges)", false)
      }

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

  /** Edge-count ceiling for the driver tier
    * (`spark.graft.closure.driverEdgeCap` overrides): 16k distinct edges
    * collect to well under a MB. */
  val DriverEdgeCap = 16384L

  /** Closure-size bail for the driver tier
    * (`spark.graft.closure.driverPairCap` overrides): a closure past 2M
    * pairs goes back to the distributed loop — the driver never holds more
    * than the cap. */
  val DriverPairCap = 2000000L

  /** Driver-side semi-naive closure over a bounded, already-materialized
    * edge set — exactly the distributed loop's fixpoint: BFS rounds reach
    * each (descendant, ancestor) pair first at its MINIMUM depth, which is
    * what the loop's final `min(depth)` aggregation selects, and the round
    * count is bounded by the SAME `maxIterations` as the loop, so a small
    * bound truncates both paths at identical depth. Ids only need
    * equality/hashing here, so every id type the loop supports works.
    * Returns None when the closure exceeds the pair cap (caller falls back
    * to the loop); the cap is enforced INSIDE the expansion loop — a hub
    * graph under the edge cap can mint millions of pairs in one round, so
    * a between-rounds check alone would let the driver overshoot the cap
    * by orders of magnitude before noticing. */
  private def driverClosure(base: DataFrame, maxIterations: Int): Option[DataFrame] = {
    val spark = base.sparkSession
    val pairCap = graft.core.Tunables.long(spark,
      "spark.graft.closure.driverPairCap", DriverPairCap)
    val rows = base.collect()
    graft.core.Decisions.record(s"closure.driverTier(edges=${rows.length})", true)
    def bail(): Option[DataFrame] = {
      graft.core.Decisions.record(
        s"closure.driverTier.pairCapExceeded(pairs>$pairCap)", true)
      None
    }
    // child → parents adjacency
    val adj = new java.util.HashMap[Any, java.util.ArrayList[Any]]()
    rows.foreach { r =>
      adj.computeIfAbsent(r.get(0), _ => new java.util.ArrayList[Any]()).add(r.get(1))
    }
    // (descendant, ancestor) → min depth; frontier = last round's new pairs
    val best = new java.util.HashMap[(Any, Any), Int]()
    var frontier = new java.util.ArrayList[(Any, Any, Int)](rows.length)
    rows.foreach { r =>
      val k = (r.get(0), r.get(1))
      if (best.putIfAbsent(k, 1) == null) frontier.add((r.get(0), r.get(1), 1))
    }
    // round r expands depth-r pairs to depth r+1 — exactly the distributed
    // loop's iteration r, so stopping after maxIterations rounds truncates
    // at the same depth the loop would
    var round = 0
    while (!frontier.isEmpty && round < maxIterations) {
      round += 1
      val next = new java.util.ArrayList[(Any, Any, Int)]()
      val it = frontier.iterator()
      while (it.hasNext) {
        val (d, a, dep) = it.next()
        val ps = adj.get(a)
        if (ps != null) {
          val pit = ps.iterator()
          while (pit.hasNext) {
            val p = pit.next()
            val k = (d, p)
            if (best.putIfAbsent(k, dep + 1) == null) {
              next.add((d, p, dep + 1))
              if (best.size() > pairCap) return bail()
            }
          }
        }
      }
      frontier = next
    }
    val out = new java.util.ArrayList[org.apache.spark.sql.Row](best.size())
    val bit = best.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      out.add(org.apache.spark.sql.Row(e.getKey._1, e.getKey._2, e.getValue))
    }
    Some(spark.createDataFrame(out, base.schema))
  }
}
