#!/usr/bin/env bash
# One-command evidence chain: correctness dump + DuckDB oracle compare +
# per-query timing smoke + recall, in a single JVM (graft.tools.Evidence).
#
#   scripts/evidence.sh [sf_dir] [out_dir]
#
# Defaults to sf0.01 (sub-minute end to end). Exits non-zero if any oracle
# comparison fails. Timings in the JSON line are single-shot smoke numbers —
# for committable medians use scripts/bench_median.py (wave-guarded).
set -euo pipefail
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft-evidence}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_EVIDENCE_OUT="$OUT" \
  sbt -batch "runMain graft.tools.Evidence" 2>/dev/null | grep '^{"metric"' \
  | tee "$OUT/evidence.json"

python3 - "$OUT/evidence.json" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
failed = sorted(n for n, t in d["query_sec"].items() if t < 0)
if failed:
    sys.exit(f"queries failed to run: {failed}")
print(f"evidence OK: {len(d['query_sec'])} queries ran, "
      f"verify {d['verify_sec']:.0f}s, total {d['total_sec']:.0f}s")
PY

python3 scripts/local_verify.py "$SF" "$OUT/verify"
