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
    *                      collected within `maxAttempts`
    * @param attempted     EVERY rep in attempt order, discarded ones included
    *                      — the discarded reps' per-query times are the data
    *                      [[spreadFlagged]] needs to expose intra-rep waves
    *                      that recovered before the closing sentinel */
  final case class Outcome[T](reps: Vector[T], wavesDetected: Int,
                              sentinelTimes: Vector[Double],
                              contaminated: Boolean,
                              attempted: Vector[T] = Vector.empty[T]) {
    def baseline: Double = sentinelTimes.min
  }

  /**
   * Per-query spread contamination check — the guard the sentinel bracket
   * cannot provide: a stall wave that begins after the opening sentinel and
   * recovers before the closing one inflates mid-rep queries while both
   * sentinels look healthy (observed in the round-6 driver artifact: kept
   * medians 2–4× the committed run with `wave_contaminated: false`).
   *
   * Waves only ever INFLATE, so for each query the minimum over every
   * attempted rep — discarded wave-hit reps included, their unaffected
   * queries are healthy observations — is a robust healthy anchor. A query
   * is flagged when its kept-median exceeds `factor` × that anchor AND the
   * excess is at least `minExcessSeconds` (sub-second queries jitter past
   * any ratio without meaning contamination).
   *
   * With a single attempt and no discards, kept == attempted and nothing can
   * flag — the check only has teeth when retries or reps provide an
   * independent observation, which is exactly when the sentinel bracket has
   * already proven insufficient.
   */
  def spreadFlagged(kept: Seq[Map[String, Option[Double]]],
                    attempted: Seq[Map[String, Option[Double]]],
                    factor: Double = 3.0,
                    minExcessSeconds: Double = 1.0): Seq[String] = {
    val names = kept.flatMap(_.keys).distinct
    names.filter { n =>
      val keptOk = kept.flatMap(_.get(n).flatten)
      val allOk = attempted.flatMap(_.get(n).flatten)
      keptOk.nonEmpty && allOk.nonEmpty && {
        val med = {
          val s = keptOk.sorted
          if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
        }
        val anchor = allOk.min
        med > anchor * factor && med - anchor > minExcessSeconds
      }
    }
  }

  /** Run-level verdict over [[spreadFlagged]]: one slow query can be a real
    * (if unexplained) regression, but `maxFlagged`+1 simultaneous 3×
    * inflations on independent queries is a host wave. */
  def spreadContaminated(flagged: Seq[String], maxFlagged: Int = 2): Boolean =
    flagged.size > maxFlagged

  /**
   * Sentinel-bracketed SOLO re-measurement of [[spreadFlagged]] queries.
   *
   * A spread flag means the kept median is inflated by a mid-rep host wave
   * the sentinel bracket could not see — the number is wrong, and the r7
   * sf100 probe showed the artifact then ships with a footnote instead of a
   * fix (dedup3: flagged median 50.1 s vs 10.2 s solo). This closes the
   * loop: each flagged query re-runs ALONE between two fresh sentinels; the
   * solo time is accepted only when both brackets are healthy (within
   * `factor` × the running anchor — the session minimum, updated with every
   * sentinel observed here, since waves only inflate). A query whose
   * brackets stay dirty for `maxAttemptsPerQuery` tries keeps its original
   * (flagged) median — an honest inflated number beats a silently wave-hit
   * replacement.
   *
   * Pure bookkeeping (timers injected), same contract as [[collect]]:
   * `runQuery` returns None on query failure (never substituted),
   * `sentinel()` returns the bracketing query's seconds.
   */
  def soloRerun(flagged: Seq[String], anchor: Double,
                sentinel: () => Double,
                runQuery: String => Option[Double],
                factor: Double = 3.0,
                maxAttemptsPerQuery: Int = 2): Map[String, Double] = {
    var a = anchor
    flagged.flatMap { name =>
      var accepted: Option[Double] = None
      var tries = 0
      while (accepted.isEmpty && tries < maxAttemptsPerQuery) {
        tries += 1
        val before = sentinel()
        val t = runQuery(name)
        val after = sentinel()
        // evaluate with the anchor INCLUDING both new observations — a
        // healthier sentinel here exposes an inflated seed anchor, exactly
        // the bootstrap-wave rule collect() applies
        a = math.min(a, math.min(before, after))
        if (before <= a * factor && after <= a * factor) accepted = t
      }
      accepted.map(name -> _)
    }.toMap
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
    var attempted = Vector.empty[T]
    var waves = 0
    var attempts = 0
    while (kept.size < target && attempts < maxAttempts) {
      attempts += 1
      val before = sent.last
      val r = rep()
      attempted :+= r
      val after = sentinel()
      sent :+= after
      // evaluate with the anchor INCLUDING `after`: a healthy closing
      // sentinel exposes an inflated opening one (bootstrap-wave case)
      if (before > anchor * factor || after > anchor * factor) {
        waves += 1
        discarded :+= r
      } else kept :+= r
    }
    if (kept.size >= target) Outcome(kept, waves, sent, contaminated = false,
      attempted = attempted)
    // clean reps lead the contaminated fallback (NOT attempt order)
    else Outcome(kept ++ discarded, waves, sent, contaminated = true,
      attempted = attempted)
  }
}
