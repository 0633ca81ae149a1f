#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r2
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue6.log
  timeout 5400 python bench.py "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue6.log
}
run config4_v5 --config 4 --burst 8 --repeats 2
echo "ALL DONE $(date +%T)" >> $OUT/queue6.log
