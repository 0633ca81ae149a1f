#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r5
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue.log
  timeout 7200 "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue.log
}
run exp_c3e2 python tools/exp_c3e_r5.py
run config3_v4 python bench.py --config 3 --repeats 3
run config4_v5 python bench.py --config 4 --burst 8 --repeats 2
echo "QUEUE M DONE $(date +%T)" >> $OUT/queue.log
