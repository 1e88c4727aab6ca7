#!/bin/bash
# knn2 sf100 campaign: preflight-gated single-rep zstd attempts until
# $TARGET clean completions land (each in its own state file so
# scale_probe's skip-if-done doesn't stop the collection). Deferred
# windows (exit 6) sleep 8 min; unclean runs (wave/degraded/ENOSPC)
# sleep 10 min — the sf100 workload degrades its own window, so
# back-to-back attempts cluster on the bad side (BENCH_NOTES r13).
# GATE default tightened 35 -> 31 after the r14 campaign: all three
# clean runs launched at <= 29.7 s; the one burned attempt launched at
# 33.6 s — inside the old gate, in the marginal band.
set -u
TARGET=${TARGET:-3}
CYCLES=${CYCLES:-40}
cd "$(dirname "$0")/.."
count=0
for state in /tmp/graft-knn2-r14-run1.json /tmp/graft-knn2-r14-run2.json \
             /tmp/graft-knn2-r14-run3.json /tmp/graft-knn2-r14-run4.json; do
  if python3 - "$state" <<'EOF'
import json,sys,os
p=sys.argv[1]
ok=False
if os.path.exists(p):
    ok='knn2_lsh_top3' in json.load(open(p))
sys.exit(0 if ok else 1)
EOF
  then count=$((count+1)); fi
done
echo "=== campaign start: $count clean already, target $TARGET ==="
for i in $(seq 1 "$CYCLES"); do
  if [ "$count" -ge "$TARGET" ]; then echo "=== TARGET REACHED ($count clean) ==="; exit 0; fi
  run=$((count+1))
  state="/tmp/graft-knn2-r14-run${run}.json"
  echo "=== cycle $i -> run $run ($(date -u +%H:%M:%S)) ==="
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_JAVA_OPTS="-Dspark.io.compression.codec=zstd" \
    SPARK_GRAFT_PERIODIC_GC="${PERIODIC_GC:-30s}" \
    python3 scripts/scale_probe.py /tmp/graft-sf100 --cpus 32 --reps 1 \
    --queries knn2_lsh_top3 --state "$state" --preflight "${GATE:-31}"
  rc=$?
  if [ $rc -eq 0 ]; then
    count=$((count+1))
    echo "=== CLEAN COMPLETION $count/$TARGET ==="
    # cool-down even after success: the run itself churned the page cache
    [ "$count" -ge "$TARGET" ] || sleep 420
  elif [ $rc -eq 6 ]; then
    echo "--- deferred (degraded window); sleeping 480 s"
    sleep 480
  else
    echo "--- unclean run rc=$rc; sleeping 600 s"
    sleep 600
  fi
done
echo "=== cycles exhausted with $count clean ==="
exit 1
