#!/bin/bash
# Final r2 queue: HEAD validation + config4 with the Morton-retry fix.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r2
mkdir -p $OUT
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue5.log
  timeout 5400 python bench.py "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue5.log
}
run config4_v4 --config 4 --burst 8 --repeats 2
run headline_v4
echo "ALL DONE $(date +%T)" >> $OUT/queue5.log
