#!/bin/bash
# Sequential TPU bench queue — the remote compile service is a serial queue,
# so exactly one job runs at a time. Each line appends its JSON to results.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r2
mkdir -p $OUT
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue.log
  timeout 5400 python bench.py "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue.log
}
run headline
run config2 --config 2
run backward --backward --repeats 3
run config3 --config 3 --burst 8 --repeats 3
run config4 --config 4 --burst 2 --repeats 2
run config5 --config 5 --repeats 2
echo "ALL DONE $(date +%T)" >> $OUT/queue.log
