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
RT_NH_BLOCK_R=128 RT_NH_CHUNK_T=16 run exp_c4_r128c16 python tools/exp_r5_c4.py
RT_NH_BLOCK_R=256 RT_NH_CHUNK_T=8 run exp_c4_r256c8 python tools/exp_r5_c4.py
echo "QUEUE U DONE $(date +%T)" >> $OUT/queue.log
