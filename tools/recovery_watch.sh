#!/bin/bash
# Watch for host fault-path recovery; when clean, re-record the closing bench
# datapoint (sf0.1) so the round's record carries a non-degraded measurement.
# Probe thresholds mirror BENCH/BASELINE.md's documented clean floor:
# single-core calib < 130 ms and first-touch fault path > 500 MB/s.
cd /root/repo
for i in $(seq 1 ${1:-60}); do
  out=$(timeout 180 python3 tools/host_probe.py 2>/dev/null)
  calib=$(echo "$out" | python3 -c "import sys,json;d=json.load(sys.stdin);print(d['calib_ms'])" 2>/dev/null)
  fault=$(echo "$out" | python3 -c "import sys,json;d=json.load(sys.stdin);print(d['fault_mb_s'])" 2>/dev/null)
  echo "$(date -u +%H:%M:%S) calib=${calib} fault=${fault}" >> BENCH/recovery_watch.log
  ok=$(python3 -c "print(1 if (${calib:-999} < 130 and ${fault:-0} > 500) else 0)")
  if [ "$ok" = "1" ]; then
    echo "$(date -u +%H:%M:%S) CLEAN WINDOW — running bench" >> BENCH/recovery_watch.log
    timeout 1800 python3 bench.py > BENCH/recovery_bench.json 2>> BENCH/recovery_watch.log
    echo "BENCH_DONE rc=$?" >> BENCH/recovery_watch.log
    # also re-record a HEAD thread-mode scaling pair in the clean window
    SPARK_DRIVER_MEMORY=64g SCALING_TRIALS=1 timeout 3600 \
      python3 tools/scaling_run.py 1000000 2 8 >> BENCH/recovery_watch.log 2>&1
    echo "SCALING_DONE rc=$?" >> BENCH/recovery_watch.log
    exit 0
  fi
  sleep 240
done
echo "WATCH_EXPIRED no clean window" >> BENCH/recovery_watch.log
