package graft.tools

/**
 * Host-stall ("wave") detection for benchmark reps.
 *
 * This bench host intermittently enters stall waves — arbitrary queries
 * take 30-170 s with near-idle CPU, in ~30 s quanta, then recover (see
 * BENCH_NOTES.md "Host instability caveat"). A median-of-N that ingests a
 * wave-hit rep reports spreads like [4 s, 97 s] and poisons the committed
 * table; round 5 lost three full refresh attempts to exactly that.
 *
 * The guard brackets every suite rep with a cheap fixed SENTINEL query and
 * keeps the rep only when both bracketing sentinel times are within
 * `factor` × the healthiest sentinel observed in the session (the session
 * MIN — waves only ever inflate, so the min is a robust healthy anchor; an
 * optional floor lets callers seed a known-healthy value so a wave hitting
 * the very first sentinel cannot inflate the anchor). Discarded reps are
 * re-run, up to `maxAttempts`; on exhaustion the discarded reps are used
 * anyway and the outcome is flagged `contaminated` — an honest bad number
 * beats a silent empty one.
 *
 * Pure bookkeeping (timers injected) so the discard/retry policy is
 * unit-testable without a host stall.
 */
object WaveGuard {

  /** @param reps          kept reps when enough healthy ones were collected,
    *                      else every attempted rep (contaminated fallback)
    * @param wavesDetected attempts discarded because a bracketing sentinel
    *                      tripped the threshold
    * @param sentinelTimes every sentinel observation, in order
    * @param contaminated  true when fewer than `target` healthy reps were
    *                      collected within `maxAttempts` */
  final case class Outcome[T](reps: Vector[T], wavesDetected: Int,
                              sentinelTimes: Vector[Double],
                              contaminated: Boolean) {
    def baseline: Double = sentinelTimes.min
  }

  /**
   * Collect `target` wave-clean reps, spending at most `maxAttempts` suite
   * runs. `sentinel()` runs the sentinel query and returns its seconds;
   * `rep()` runs one full suite rep.
   */
  def collect[T](target: Int, maxAttempts: Int, sentinel: () => Double,
                 rep: () => T, factor: Double = 3.0,
                 baselineFloor: Option[Double] = None): Outcome[T] = {
    require(target >= 1 && maxAttempts >= target, "need maxAttempts >= target >= 1")
    var sent = Vector(sentinel())
    // the floor is a candidate anchor, not a clamp: observed-healthier wins
    def anchor: Double = (sent ++ baselineFloor).min
    var kept = Vector.empty[T]
    var discarded = Vector.empty[T]
    var waves = 0
    var attempts = 0
    while (kept.size < target && attempts < maxAttempts) {
      attempts += 1
      val before = sent.last
      val r = rep()
      val after = sentinel()
      sent :+= after
      // evaluate with the anchor INCLUDING `after`: a healthy closing
      // sentinel exposes an inflated opening one (bootstrap-wave case)
      if (before > anchor * factor || after > anchor * factor) {
        waves += 1
        discarded :+= r
      } else kept :+= r
    }
    if (kept.size >= target) Outcome(kept, waves, sent, contaminated = false)
    else Outcome(kept ++ discarded, waves, sent, contaminated = true)
  }
}
