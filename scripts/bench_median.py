#!/usr/bin/env python3
"""Median-of-N bench wrapper.

Runs graft.Bench with SPARK_GRAFT_BENCH_REPS (default 3): the whole query
suite executes N times inside ONE JVM in the same order, and Bench reports
the per-query median plus the [min, max] spread. Use this — not a single
run — before concluding anything about a perf regression: single-run noise
on this host is +/-30-40% per query.

Usage: python3 scripts/bench_median.py [sf_dir] [cpus] [reps]
"""
import json
import os
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
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    line = next((l for l in out.stdout.splitlines()
                 if l.startswith('{"metric"')), None)
    if line is None:
        sys.stderr.write(out.stdout[-4000:] + "\n" + out.stderr[-4000:] + "\n")
        sys.exit("no bench JSON line found")
    d = json.loads(line)
    spread = d.get("spread", {})
    rows = sorted(d["queries"].items(), key=lambda kv: -kv[1])
    print(f"# median of {d.get('reps', 1)} runs, sf={d['sf']}, cpus={cpus}")
    print(f"{'query':<32} {'median_s':>9} {'min_s':>9} {'max_s':>9}")
    for name, med in rows:
        lo, hi = spread.get(name, [med, med])
        print(f"{name:<32} {med:9.3f} {lo:9.3f} {hi:9.3f}")
    print(f"{'TOTAL (sum of medians)':<32} {d['value']:9.3f}")
    print(line)


if __name__ == "__main__":
    main()
