#!/bin/bash
# Round-2 queue 4: tiled fixes (compaction, precision, normals) + headline regression.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r2
mkdir -p $OUT
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue4.log
  timeout 5400 python bench.py "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue4.log
}
run config4_v3 --config 4 --burst 8 --repeats 2
run config3_v3 --config 3 --burst 16 --repeats 3
run headline_v3
run config2_v3 --config 2
run backward_v3 --backward --repeats 3
echo "ALL DONE $(date +%T)" >> $OUT/queue4.log
