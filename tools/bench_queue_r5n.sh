#!/bin/bash
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
OUT=/root/repo/tools/bench_results_r5
while ! grep -q "QUEUE M DONE" $OUT/queue.log 2>/dev/null; do sleep 30; done
run() {
  name=$1; shift
  echo "=== $name start $(date +%T) ===" >> $OUT/queue.log
  timeout 7200 "$@" > $OUT/$name.json 2> $OUT/$name.err
  echo "=== $name exit $? $(date +%T) ===" >> $OUT/queue.log
}
run headline_final python bench.py --repeats 3
run backward_v2 python bench.py --backward --repeats 3
run backward1k_v2 python bench.py --backward --spheres 1000 --repeats 3
run demo python -m raytracer_js_tpu.demo
echo "QUEUE N DONE $(date +%T)" >> $OUT/queue.log
