#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r5
while ! grep -q "QUEUE H DONE" $OUT/queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue.log
  timeout 7200 "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue.log
}
run exp_c3d python tools/exp_c3d_r5.py
run config3_v3 python bench.py --config 3 --repeats 3
run config4_v3 python bench.py --config 4 --burst 8 --repeats 2
echo "QUEUE I DONE $(date +%T)" >> $OUT/queue.log
