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
run config4_final python bench.py --config 4 --burst 8 --repeats 2
run config5_final python bench.py --config 5 --repeats 2 --c5-replay-every 32
run config3_final python bench.py --config 3 --repeats 3
echo "QUEUE W DONE $(date +%T)" >> $OUT/queue.log
