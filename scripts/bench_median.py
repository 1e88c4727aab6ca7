#!/usr/bin/env python3
"""Median-of-N bench wrapper, wave-guarded.

Runs graft.Bench with SPARK_GRAFT_BENCH_REPS (default 3): the whole query
suite executes N times inside ONE JVM in the same order, and Bench reports
the per-query median plus the [min, max] spread. Use this — not a single
run — before concluding anything about a perf regression: single-run noise
on this host is +/-30-40% per query.

Wave guard (graft.tools.WaveGuard, inside Bench): every rep is bracketed
by a timed j1 sentinel; reps whose bracketing sentinels exceed 3x the
session-best sentinel are discarded and re-run automatically (the host's
documented 30-170s stall waves — BENCH_NOTES.md). The JSON line carries
waves_detected / wave_contaminated / sentinel_baseline_s. A table printed
with wave_contaminated=true must NOT be committed as the round's medians.
Seed a known-healthy sentinel time via SPARK_GRAFT_SENTINEL_BASELINE
(seconds) so a wave covering session start can't inflate the anchor;
healthy j1 at sf0.1 on this host is ~1.2-1.5s.

Degraded-window check (wrapper-side): the 3x sentinel threshold catches
stall WAVES but not sustained sub-threshold degradation (host uniformly
1.5-2x slow — observed 2026-08-13: every query up ~60%, sentinels never
tripping). The suite itself times the sentinel query, so after the run
the wrapper compares the in-suite j1 median against the session-best
sentinel: a ratio > 1.6 means the kept reps ran materially slower than
the host's demonstrated-healthy floor — exit 4, do not commit the table.
(The sentinel floor itself proves a healthy window existed; re-run.)

Process hygiene: sbt (and its forked bench JVM) runs in its own process
group, killed on exit/interrupt — a killed wrapper must not leave an
orphan JVM corrupting the next run's zinc state.

Usage: python3 scripts/bench_median.py [sf_dir] [cpus] [reps]
"""
import json
import os
import signal
import subprocess
import sys


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    reps = sys.argv[3] if len(sys.argv) > 3 else "3"
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS=cpus,
               SPARK_GRAFT_BENCH_REPS=reps)
    proc = subprocess.Popen(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        start_new_session=True)  # own process group: see kill below
    try:
        stdout, stderr = proc.communicate()
    except BaseException:  # Ctrl-C, SIGTERM via exception, anything
        # kill the WHOLE group: sbt forks the bench JVM, and an orphaned
        # forked JVM keeps zinc/ivy locks that corrupt the next sbt run
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        raise
    log_path = os.environ.get("SPARK_GRAFT_STDERR_LOG")
    if log_path:  # preserve forked-JVM stderr (e.g. [decision] lines)
        with open(log_path, "w") as f:
            f.write(stderr)
    line = next((l for l in stdout.splitlines()
                 if l.startswith('{"metric"')), None)
    if line is None:
        sys.stderr.write(stdout[-4000:] + "\n" + stderr[-4000:] + "\n")
        sys.exit("no bench JSON line found")
    d = json.loads(line)
    spread = d.get("spread", {})
    rows = sorted(d["queries"].items(), key=lambda kv: -kv[1])
    print(f"# median of {d.get('reps', 1)} runs, sf={d['sf']}, cpus={cpus}")
    waves = d.get("waves_detected")
    if waves is not None:
        print(f"# wave guard: waves_detected={waves} "
              f"contaminated={d.get('wave_contaminated')} "
              f"sentinel_baseline_s={d.get('sentinel_baseline_s'):.3f} "
              f"spread_flagged={d.get('spread_flagged')}")
    print(f"{'query':<32} {'median_s':>9} {'min_s':>9} {'max_s':>9}")
    for name, med in rows:
        lo, hi = spread.get(name, [med, med])
        print(f"{name:<32} {med:9.3f} {lo:9.3f} {hi:9.3f}")
    print(f"{'TOTAL (sum of medians)':<32} {d['value']:9.3f}")
    print(line)
    if d.get("wave_contaminated"):
        sys.stderr.write("WAVE-CONTAMINATED RUN: healthy-rep budget exhausted; "
                         "do NOT commit this table as the round's medians.\n")
        sys.exit(3)
    if d.get("spread_contaminated"):
        sys.stderr.write(
            f"SPREAD-CONTAMINATED RUN: {d.get('spread_flagged')} all sit >3x "
            "their healthiest observation across attempts — an intra-rep wave "
            "the sentinel bracket missed; do NOT commit this table.\n")
        sys.exit(5)
    base = d.get("sentinel_baseline_s")
    j1 = d["queries"].get("j1_revenue_by_nation")
    if base and j1 and j1 / base > 1.6:
        sys.stderr.write(
            f"DEGRADED WINDOW: in-suite j1 median {j1:.2f}s is "
            f"{j1 / base:.2f}x the session-best sentinel {base:.2f}s — kept "
            "reps ran on a uniformly slowed host; do NOT commit this table.\n")
        sys.exit(4)


if __name__ == "__main__":
    main()
