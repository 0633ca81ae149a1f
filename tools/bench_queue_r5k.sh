#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r5
while ! grep -q "QUEUE J DONE" $OUT/queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue.log
  timeout 7200 "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue.log
}
run exp_c3e python tools/exp_c3e_r5.py
run exp_c4_stacked python tools/exp_r5_c4.py
echo "QUEUE K DONE $(date +%T)" >> $OUT/queue.log
