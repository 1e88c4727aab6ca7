package graft.core

import scala.collection.concurrent.TrieMap

import org.slf4j.LoggerFactory

/**
 * Driver-side record of the data-dependent plan decisions the adaptive
 * operators make (skew-guard cap activation, the n-gram frequent-set
 * split, connected-components' broadcast cutover). The decisions are
 * invisible in the final SQL plan once taken — the chosen branch IS the
 * plan — so at cluster scale the only way to know which strategy ran
 * against THIS data is to record the choice at the moment it's made.
 *
 * Two consumers:
 *  - the `graft.decisions` logger: one line per decision, so a cluster
 *    run's driver log documents every adaptive choice (set the logger —
 *    or `SPARK_GRAFT_LOG_DECISIONS=1` for plain stderr — to capture);
 *  - [[snapshot]]: programmatic access for benches/specs that assert a
 *    decision fired (the scale-evidence runs in BENCH_NOTES.md).
 *
 * Every adaptive decision in this codebase is made driver-side (eager
 * probes), so a per-JVM map is sufficient; keys are
 * `<operator>.<decision>` and the latest write wins.
 */
object Decisions {
  private val log = LoggerFactory.getLogger("graft.decisions")
  private val toStderr = sys.env.get("SPARK_GRAFT_LOG_DECISIONS").contains("1")
  private val state = TrieMap.empty[String, String]

  def record(key: String, value: Any): Unit = {
    state.put(key, value.toString)
    log.info(s"[decision] $key=$value")
    if (toStderr) System.err.println(s"[decision] $key=$value")
  }

  /** Latest value per decision key, for assertions in specs/benches. */
  def snapshot: Map[String, String] = state.toMap

  def clear(): Unit = state.clear()
}
