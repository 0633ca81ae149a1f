#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r5
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue.log
  timeout 5400 python bench.py "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue.log
}
run backward_final --backward
run backward1k_final --backward --spheres 1000
run config3_v1 --config 3 --burst 16
echo "ALL DONE $(date +%T)" >> $OUT/queue.log
