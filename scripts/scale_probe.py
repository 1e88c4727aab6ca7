#!/usr/bin/env python3
"""Resumable per-query scale probe (sf1/sf10/sf100 evidence collection).

Problem this solves: a full heavy-query suite at sf100 runs tens of minutes,
and this host's stall waves (BENCH_NOTES.md) can contaminate any window —
r8's sf100 numbers were healthiest-rep BOUNDS because both long sessions
caught waves. Collecting the evidence per query, with completed results
persisted, lets clean medians accumulate ACROSS windows: a wave costs one
query's attempt, not the whole session.

Each query runs SOLO through scripts/bench_median.py (wave guard + degraded-
window + spread checks apply per run). A run that exits clean (code 0)
records {median, spread, sentinel_baseline_s} into the state file and is
SKIPPED on every later invocation; a contaminated/degraded run (codes 3/4/5)
records nothing — re-invoke later and only the missing queries run. Delete
the state file (or pass --fresh) to re-measure everything.

Usage:
  python3 scripts/scale_probe.py SF_DIR [--cpus 32] [--reps 3]
      [--queries a,b,c] [--state FILE] [--fresh] [--preflight MAX_S]

Defaults: the heavy seven from BENCH_NOTES.md's scale tables; state file
/tmp/graft-scale-probe-<dirname>.json. Set SPARK_DRIVER_MEM=64g for sf100
(see the verify skill). Exits 0 when every requested query has a clean
median (printing the combined table), 1 when queries remain.

Pre-flight window-health gate (--preflight MAX_S): the r13 knn2 campaign
measured a 15/15 correlation between the session sentinel and sf100
completion — ~31 s j1 sentinel -> clean completion, >= 44.6 s (or mid-run
waves) -> deterministic ENOSPC in the candidate-dedup reduce — and burned
13 multi-minute attempts re-proving it. With --preflight set, the probe
times the j1 sentinel SOLO (BenchOne, best of 2) before EACH pending
query's launch and REFUSES to start the attempt when the sentinel exceeds
MAX_S, exiting 6 with "deferred: degraded window" (the sentinel itself
costs ~1-2 min at sf100 vs an 8-12 min doomed attempt; re-checked per
query because the sf100 workload degrades its own window). Suggested
MAX_S at sf100: 35. Preflight sentinels are appended to the state file's
"_preflight_log" for the evidence trail.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

HEAVY = ("a10_percentile_stats,dedup4_dup_clusters,knn3_ivf_top3,"
         "knn2_lsh_top3,ngram1_jaccard_pairs,dedup2_minhash_pairs,"
         "dedup3_simhash")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--reps", default="3")
    ap.add_argument("--queries", default=HEAVY)
    ap.add_argument("--state", default=None)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--preflight", type=float, default=None, metavar="MAX_S",
                    help="window-health gate: time the j1 sentinel solo "
                         "before each pending query; exit 6 (deferred: "
                         "degraded window) when it exceeds MAX_S seconds")
    args = ap.parse_args()

    tag = os.path.basename(os.path.normpath(args.sf_dir))
    state_path = args.state or f"/tmp/graft-scale-probe-{tag}.json"
    state = {}
    if args.fresh and os.path.exists(state_path):
        os.remove(state_path)
    if os.path.exists(state_path):
        with open(state_path) as f:
            state = json.load(f)

    queries = [q for q in args.queries.split(",") if q]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pending = [q for q in queries if q not in state]
    done = [q for q in queries if q in state]
    if done:
        print(f"# resuming: {len(done)} clean, {len(pending)} pending "
              f"(state: {state_path})")

    def preflight_sentinel():
        """Best-of-2 solo j1 wall via BenchOne (the same query the wave
        guard brackets with; best-of-2 mirrors 'session-best sentinel')."""
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf_dir,
                   SPARK_GRAFT_CPUS=str(args.cpus))
        proc = subprocess.run(
            ["sbt", "-batch",
             "runMain graft.BenchOne j1_revenue_by_nation j1_revenue_by_nation"],
            cwd=repo, env=env, capture_output=True, text=True)
        times = [float(m.group(1)) for m in
                 re.finditer(r"TIMED j1_revenue_by_nation ([0-9.]+) s",
                             proc.stdout)]
        return min(times) if times else None

    for q in pending:
        if args.preflight is not None:
            print(f"# preflight sentinel (gate {args.preflight:.0f}s) ...",
                  flush=True)
            sent = preflight_sentinel()
            log = state.setdefault("_preflight_log", [])
            log.append({"sentinel_s": sent, "before": q,
                        "max_s": args.preflight,
                        "at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                            time.gmtime())})
            with open(state_path, "w") as f:
                json.dump(state, f, indent=2, sort_keys=True)
            if sent is None or sent > args.preflight:
                txt = f"{sent:.1f}s" if sent is not None else "unmeasurable"
                sys.stderr.write(
                    f"deferred: degraded window (j1 sentinel {txt} > "
                    f"{args.preflight:.0f}s gate) — NOT burning an attempt "
                    f"on {q}; re-invoke in a healthier window\n")
                sys.exit(6)
            print(f"# preflight sentinel {sent:.1f}s <= "
                  f"{args.preflight:.0f}s — window healthy, launching {q}",
                  flush=True)
        print(f"# probing {q} solo at {args.sf_dir} ...", flush=True)
        env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=q)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(repo, "scripts", "bench_median.py"),
             args.sf_dir, args.cpus, args.reps],
            env=env, capture_output=True, text=True)
        line = next((l for l in proc.stdout.splitlines()
                     if l.startswith('{"metric"')), None)
        if proc.returncode != 0 or line is None:
            sys.stderr.write(
                f"# {q}: UNCLEAN window (exit {proc.returncode}) — not "
                f"recorded; re-invoke later to retry just this query\n")
            sys.stderr.write(proc.stderr[-2000:] + "\n")
            continue
        d = json.loads(line)
        med = d["queries"].get(q)
        if med is None or med < 0:
            sys.stderr.write(f"# {q}: query failed in bench — not recorded\n")
            fail = [l for l in proc.stderr.splitlines() if "QUERY FAILED" in l]
            for l in fail[-2:]:
                sys.stderr.write(f"#   {l}\n")
            continue
        state[q] = {
            "median_s": med,
            "spread": d.get("spread", {}).get(q, [med, med]),
            "sentinel_baseline_s": d.get("sentinel_baseline_s"),
            "reps": d.get("reps", 1),
            "wall_s": round(time.time() - t0, 1),
            "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(state_path, "w") as f:
            json.dump(state, f, indent=2, sort_keys=True)
        sb = state[q]["sentinel_baseline_s"]
        sb_txt = f"{sb:.3f}s" if sb is not None else "n/a"
        print(f"# {q}: clean median {med:.3f}s (sentinel {sb_txt}) — recorded")

    missing = [q for q in queries if q not in state]
    print(f"\n# scale probe {args.sf_dir} — {len(queries) - len(missing)}/"
          f"{len(queries)} clean (all rows wave-guard clean at record time)")
    print(f"{'query':<32} {'median_s':>9} {'min_s':>9} {'max_s':>9} "
          f"{'sentinel_s':>10}")
    for q in queries:
        if q in state:
            s = state[q]
            lo, hi = s["spread"]
            sb = s["sentinel_baseline_s"]
            sb_txt = f"{sb:10.3f}" if sb is not None else f"{'n/a':>10}"
            print(f"{q:<32} {s['median_s']:9.3f} {lo:9.3f} {hi:9.3f} {sb_txt}")
        else:
            print(f"{q:<32} {'—':>9}")
    if missing:
        sys.stderr.write(f"pending: {','.join(missing)} — re-invoke to "
                         "collect in a cleaner window\n")
        sys.exit(1)


if __name__ == "__main__":
    main()
