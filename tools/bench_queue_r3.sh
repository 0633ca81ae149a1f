#!/bin/bash
# r3 serial bench queue — ONE TPU job at a time (remote compile queue).
# Run from repo root: bash tools/bench_queue_r3.sh
set -u
cd /root/repo
mkdir -p tools/bench_results_r3
R=tools/bench_results_r3
run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S)" | tee -a $R/queue.log
  timeout 4500 python bench.py "$@" > $R/$name.json 2> $R/$name.err
  echo "=== $name exit $? $(date +%H:%M:%S)" | tee -a $R/queue.log
}
run headline --burst 64 --repeats 5
run backward --backward --repeats 3
run config1 --config 1
run config2 --config 2
run config3 --config 3
run config4 --config 4 --burst 8 --repeats 3
run config5 --config 5 --repeats 2
echo "ALL DONE $(date +%H:%M:%S)" | tee -a $R/queue.log
