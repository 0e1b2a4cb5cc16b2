#!/bin/bash
cd /root/repo
for i in $(seq 1 ${1:-6}); do
  SPARK_DRIVER_MEMORY=64g SCALING_TRIALS=1 python tools/scaling_run.py 1000000 8 32 >> BENCH/scaling_loop.log 2>&1
done
echo LOOP_DONE >> BENCH/scaling_loop.log
