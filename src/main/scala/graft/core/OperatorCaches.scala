package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/**
 * Lifecycle for operator-internal caches.
 *
 * The multi-phase operators (MinHash / SimHash / n-gram / KNN / skew guards)
 * persist corpus-scale intermediates because several phases of ONE result
 * consume them — tokenized bases, bucket tables, candidate sets. Those
 * caches are dead weight the moment the caller's action finishes, and in a
 * long-lived session they would otherwise accumulate executor memory with
 * no release path (each `persist` is keyed by plan in Spark's CacheManager
 * and lives until an explicit `unpersist`).
 *
 * [[owned]] registers the intermediates against the operator's RESULT plan;
 * a per-session [[QueryExecutionListener]] watches every successful action
 * and, when the executed plan contains the result (subtree match on the
 * analyzed plan), unpersists that result's intermediates and drops the
 * entry. Releasing is always SAFE: a cached plan stays valid without its
 * cache — a second action over the same result recomputes instead of
 * re-reading, a perf cost only, never a correctness one. Callers that will
 * materialize a result repeatedly should persist or checkpoint the RESULT
 * (compact) rather than relying on operator internals (corpus-scale).
 *
 * [[releaseAll]] is the manual escape hatch for results that are built but
 * never materialized.
 *
 * CONTRACT (verified on Spark 4.1.2, pinned by `OperatorCachesSpec`):
 * release fires for materializations that post a QueryExecutionListener
 * event — every Dataset/DataFrame action (write, collect, count, …), and,
 * on Spark 4.x, also the `.rdd` CONVERSION itself (the `Dataset.rdd` lazy
 * val posts its own event when forced). Two consequences:
 *   - No leak on the `.rdd` path (e.g.
 *     [[graft.operators.IdAllocator.sequentialId]]'s zipWithIndex): the
 *     entry is released at conversion time.
 *   - That release happens BEFORE the caller's RDD job runs, so the job
 *     recomputes the intermediates instead of reading their cache — a perf
 *     cost only, never a correctness one (unpersist is always safe).
 * The genuine leak is a result that is NEVER materialized: built,
 * registered, then discarded without any action or `.rdd` force. Its entry
 * stays pending until [[releaseAll]]. Monitor with [[pending]]; [[owned]]
 * warns once per session past [[PendingWarnThreshold]].
 */
object OperatorCaches {

  private final class Entry(val result: LogicalPlan,
                            val intermediates: Seq[DataFrame],
                            var skipMatches: Int)

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Pending-entry count above which [[owned]] logs the one-per-session
    * leak warning (see [[pendingWarned]]). */
  val PendingWarnThreshold = 8

  private val registries =
    new ConcurrentHashMap[SparkSession, java.util.List[Entry]]()

  // sessions already warned about pending growth — warn once, not per call
  private val warned = ConcurrentHashMap.newKeySet[SparkSession]()

  /** Ops kill-switch: `SPARK_GRAFT_DISABLE_CACHE_LIFECYCLE=1` turns [[owned]]
    * into a no-op (intermediates stay persisted until session end — the
    * pre-lifecycle behavior). For A/B attribution of listener overhead and as
    * an escape hatch if release-after-action ever misbehaves in production. */
  private val disabled: Boolean =
    sys.env.get("SPARK_GRAFT_DISABLE_CACHE_LIFECYCLE").exists(v => v == "1" || v == "true")

  /** Register `intermediates` (persisted DataFrames) to be unpersisted after
    * the first successful action whose plan contains `result`. Returns
    * `result` unchanged.
    *
    * `skipMatches`: number of matching actions to IGNORE before releasing —
    * for operators that materialize their own result eagerly (the scoped-conf
    * aggregate paths persist + count their output at call time): the internal
    * count is a matching action, but the release must wait for the CALLER's
    * first action or the cache dies before anyone reads it. Listener events
    * arrive asynchronously but in execution order, so registering before the
    * internal action with `skipMatches = 1` is race-free. Only safe when no
    * FURTHER internal action consumes `result` after the skipped one. */
  def owned(result: DataFrame, intermediates: Seq[DataFrame],
            skipMatches: Int = 0): DataFrame = {
    if (disabled) return result
    val spark = result.sparkSession
    if (spark.sparkContext.isStopped) return result
    // Evict registries whose CONTEXT has stopped. Note `isStopped` is
    // per-SparkContext, not per-session: sessions minted via newSession()
    // share one context, so this only reclaims entries across full context
    // restarts — a driver cycling newSession()s over one live context keeps
    // each session's registry until that session's own results materialize
    // (or releaseAll is called). The pending-growth warning below is the
    // monitor for that case.
    registries.keySet.removeIf(s => s.sparkContext.isStopped)
    warned.removeIf(s => s.sparkContext.isStopped)
    val list = registries.computeIfAbsent(spark, { s =>
      s.listenerManager.register(listener(s))
      java.util.Collections.synchronizedList(new java.util.ArrayList[Entry]())
    })
    list.add(new Entry(result.queryExecution.analyzed, intermediates, skipMatches))
    if (list.size() > PendingWarnThreshold && warned.add(spark)) {
      log.warn(
        s"OperatorCaches: ${list.size()} registrations pending release for this " +
        "session — results are being built but never materialized (no " +
        "Dataset/DataFrame action and no .rdd force posts a " +
        "QueryExecutionListener event for them; see OperatorCaches scaladoc " +
        "CONTRACT). Call OperatorCaches.releaseAll(spark) to unpersist, or " +
        "materialize each result once.")
    }
    result
  }

  /** Whether the one-per-session pending-growth warning has fired (visible
    * for specs/ops). Reset by [[releaseAll]] so a session that recovers can
    * warn again on a fresh leak. */
  def pendingWarned(spark: SparkSession): Boolean = warned.contains(spark)

  /** How many registrations are still waiting for their result to
    * materialize (visible for specs/ops). */
  def pending(spark: SparkSession): Int = {
    val list = registries.get(spark)
    if (list == null) 0 else list.size()
  }

  /** Unpersist every registered intermediate of the session immediately —
    * for results that were built but never materialized. */
  def releaseAll(spark: SparkSession): Unit = {
    val list = registries.get(spark)
    if (list != null) list.synchronized {
      val it = list.iterator()
      while (it.hasNext) { it.next().intermediates.foreach(_.unpersist(false)); it.remove() }
    }
    warned.remove(spark)
  }

  private def listener(spark: SparkSession): QueryExecutionListener =
    new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        val list = registries.get(spark)
        if (list == null || list.isEmpty) return
        val plan =
          try qe.analyzed
          catch { case _: Throwable => return }
        list.synchronized {
          val it = list.iterator()
          while (it.hasNext) {
            val e = it.next()
            if (plan.exists(_.sameResult(e.result))) {
              if (e.skipMatches > 0) e.skipMatches -= 1
              else {
                e.intermediates.foreach(_.unpersist(false))
                it.remove()
              }
            }
          }
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
}
