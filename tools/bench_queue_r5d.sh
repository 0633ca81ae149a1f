#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r5
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue.log
  timeout 7200 python "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue.log
}
run exp_c3b tools/exp_c3b_r5.py
run config5_v1 bench.py --config 5 --repeats 2 --c5-replay-every 32
echo "QUEUE D DONE $(date +%T)" >> $OUT/queue.log
