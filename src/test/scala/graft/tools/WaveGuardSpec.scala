package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Discard/retry policy of the bench wave guard — pure bookkeeping, timers
  * injected, no Spark. Scenarios mirror the documented host behavior
  * (BENCH_NOTES.md "Host instability caveat"): healthy ≈1.2 s sentinels,
  * wave-hit sentinels 30-170 s. Note the bracket semantics: one wave
  * landing on the sentinel BETWEEN two reps dirties both (its closing and
  * the next one's opening bracket) — correct, since the wave may overlap
  * either rep's execution. */
class WaveGuardSpec extends AnyFunSuite {

  /** Replays scripted sentinel times; reps return their 1-based attempt
    * number so the test can see which attempts were kept. */
  private def run(sentinels: Seq[Double], target: Int, maxAttempts: Int,
                  floor: Option[Double] = None) = {
    val sIt = sentinels.iterator
    var attempt = 0
    WaveGuard.collect[Int](target, maxAttempts,
      sentinel = () => sIt.next(),
      rep = () => { attempt += 1; attempt },
      baselineFloor = floor)
  }

  test("healthy session: all reps kept, zero waves") {
    val o = run(Seq(1.2, 1.3, 1.25, 1.2), target = 3, maxAttempts = 8)
    assert(o.reps == Vector(1, 2, 3))
    assert(o.wavesDetected == 0 && !o.contaminated)
    assert(o.baseline == 1.2)
  }

  test("mid-session wave discards the reps it brackets, retries recover") {
    // the 42 s sentinel closes rep 2 AND opens rep 3: both discarded
    val o = run(Seq(1.2, 1.3, 42.0, 1.25, 1.2, 1.3), target = 3, maxAttempts = 8)
    assert(o.reps == Vector(1, 4, 5))
    assert(o.wavesDetected == 2 && !o.contaminated)
  }

  test("wave on the bootstrap sentinel discards rep 1 once health returns") {
    // first sentinel wave-hit (40 s): rep 1's opening bracket is dirty even
    // though its closing sentinel (1.2 s) is clean — the healthy closing
    // sentinel lowers the anchor and exposes the opening one
    val o = run(Seq(40.0, 1.2, 1.3, 1.2), target = 2, maxAttempts = 8)
    assert(o.reps == Vector(2, 3))
    assert(o.wavesDetected == 1 && !o.contaminated)
  }

  test("a wave plateau self-anchors without a floor; the seeded floor keeps it honest") {
    // every early sentinel lands in the same ≈40 s plateau: relative-only
    // anchoring would accept rep 1 (40 ≈ 41 ≈ anchor 40); the seeded
    // known-healthy floor (1.2 s) keeps the threshold absolute enough to
    // reject until the host actually recovers
    val plateau = Seq(40.0, 41.0, 1.3, 1.2)
    val unfloored = run(plateau, target = 1, maxAttempts = 8)
    assert(unfloored.reps == Vector(1), "plateau self-anchor accepts the wave-hit rep")
    val floored = run(plateau, target = 1, maxAttempts = 8, floor = Some(1.2))
    assert(floored.reps == Vector(3))
    assert(floored.wavesDetected == 2 && !floored.contaminated)
  }

  test("exhausted attempt budget falls back to wave-hit reps, flagged contaminated") {
    val o = run(Seq(1.2, 40.0, 41.0, 39.0, 40.0), target = 3, maxAttempts = 4)
    assert(o.reps.size == 4, "contaminated fallback must surface every attempted rep")
    assert(o.wavesDetected == 4 && o.contaminated)
  }

  test("contaminated fallback leads with the clean reps it did collect") {
    // reps 1-4 bracket-dirty, rep 5 clean, budget 5 < target 3 + waves
    val o = run(Seq(1.2, 40.0, 41.0, 40.5, 1.25, 1.3), target = 3, maxAttempts = 5)
    assert(o.contaminated)
    assert(o.reps.head == 5, "clean reps must lead the fallback")
    assert(o.reps.size == 5 && o.wavesDetected == 4)
  }

  test("attempted carries every rep, discarded included, in attempt order") {
    val o = run(Seq(1.2, 1.3, 42.0, 1.25, 1.2, 1.3), target = 3, maxAttempts = 8)
    assert(o.attempted == Vector(1, 2, 3, 4, 5))
    assert(o.reps == Vector(1, 4, 5))
  }

  test("spread flag: intra-rep wave past a healthy sentinel bracket is caught") {
    // the round-6 failure mode: the KEPT rep's a10/knn3 times are 3-4× the
    // healthy observations sitting in the DISCARDED reps, both its
    // bracketing sentinels healthy. Per-query minima over every attempt
    // expose exactly the inflated queries.
    val healthy = Map("a10" -> Some(2.4), "knn3" -> Some(1.4),
      "j1" -> Some(0.6), "fast" -> Some(0.2))
    val waveHit = Map("a10" -> Some(9.4), "knn3" -> Some(6.7),
      "j1" -> Some(2.4), "fast" -> Some(0.7))
    val flagged = WaveGuard.spreadFlagged(kept = Seq(waveHit),
      attempted = Seq(healthy, waveHit))
    // a10: 9.4 > 3×2.4 and excess > 1 s — flagged. knn3: 6.7 > 3×1.4,
    // excess 5.3 s — flagged. j1: 2.4 > 3×0.6, excess 1.8 s — flagged.
    // fast: ratio trips but the 0.5 s excess is sub-threshold — jitter.
    assert(flagged.toSet == Set("a10", "knn3", "j1"))
    assert(WaveGuard.spreadContaminated(flagged))
  }

  test("spread flag: single attempt cannot flag; lone slow query is not a wave") {
    val one = Map("a10" -> Some(2.4), "j1" -> Some(0.6))
    assert(WaveGuard.spreadFlagged(Seq(one), Seq(one)).isEmpty)
    // one query 3× over its anchor across attempts = possible regression,
    // not run contamination
    val reg = WaveGuard.spreadFlagged(
      kept = Seq(Map("a10" -> Some(9.4), "j1" -> Some(0.6))),
      attempted = Seq(Map("a10" -> Some(2.4), "j1" -> Some(0.6)),
        Map("a10" -> Some(9.4), "j1" -> Some(0.6))))
    assert(reg == Seq("a10"))
    assert(!WaveGuard.spreadContaminated(reg))
  }

  test("spread flag: failed reps (None) are excluded from anchors and medians") {
    val flagged = WaveGuard.spreadFlagged(
      kept = Seq(Map("q" -> Some(5.0)), Map("q" -> Some(5.2))),
      attempted = Seq(Map("q" -> None), Map("q" -> Some(5.0)),
        Map("q" -> Some(5.2))))
    assert(flagged.isEmpty, "crash-latency Nones must not become anchors")
  }

  test("relative threshold adapts to the sf in use (no absolute seconds)") {
    // sf0.01 sentinel ≈0.3 s: a 1.2 s sentinel (healthy at sf0.1!) is a
    // 4× excursion there and must trip
    val o = run(Seq(0.3, 0.31, 1.2, 0.3, 0.32), target = 2, maxAttempts = 8)
    assert(o.reps == Vector(1, 4))
    assert(o.wavesDetected == 2)
  }

  /** Scripted solo rerun: sentinel times and per-query solo times replay
    * from queues, so the accept/retry/give-up policy is exercised without a
    * host stall. */
  private def rerun(flagged: Seq[String], anchor: Double,
                    sentinels: Seq[Double],
                    solos: Map[String, Seq[Option[Double]]],
                    maxAttempts: Int = 2) = {
    val sIt = sentinels.iterator
    val qIt = scala.collection.mutable.Map(
      solos.view.mapValues(_.iterator).toSeq: _*)
    WaveGuard.soloRerun(flagged, anchor, () => sIt.next(),
      name => qIt(name).next(), maxAttemptsPerQuery = maxAttempts)
  }

  test("solo rerun: healthy brackets substitute the solo time") {
    val subs = rerun(Seq("dedup3"), anchor = 1.2,
      sentinels = Seq(1.25, 1.3),
      solos = Map("dedup3" -> Seq(Some(10.2))))
    assert(subs == Map("dedup3" -> 10.2))
  }

  test("solo rerun: a dirty bracket retries; persistent waves keep the original") {
    // attempt 1 bracketed by a 40 s sentinel → discarded; attempt 2 healthy
    val recovered = rerun(Seq("dedup3"), anchor = 1.2,
      sentinels = Seq(1.25, 40.0, 1.3, 1.2),
      solos = Map("dedup3" -> Seq(Some(50.0), Some(10.2))))
    assert(recovered == Map("dedup3" -> 10.2))
    // both attempts dirty → no substitution (caller keeps the flagged median)
    val exhausted = rerun(Seq("dedup3"), anchor = 1.2,
      sentinels = Seq(40.0, 41.0, 39.5, 40.5),
      solos = Map("dedup3" -> Seq(Some(50.0), Some(48.0))))
    assert(exhausted.isEmpty)
  }

  test("solo rerun: a failed solo query is never substituted") {
    val subs = rerun(Seq("q"), anchor = 1.2,
      sentinels = Seq(1.2, 1.3, 1.25, 1.2),
      solos = Map("q" -> Seq(None, None)))
    assert(subs.isEmpty)
  }

  test("solo rerun: healthier sentinels here expose an inflated seed anchor") {
    // seed anchor 40 s (the whole main run rode a wave plateau that the
    // contamination verdicts missed); solo sentinels at 1.2 s pull the
    // anchor down, so a 39 s bracket is now correctly dirty
    val subs = rerun(Seq("q"), anchor = 40.0,
      sentinels = Seq(1.2, 39.0, 1.25, 1.3),
      solos = Map("q" -> Seq(Some(45.0), Some(3.1))))
    assert(subs == Map("q" -> 3.1))
  }
}
