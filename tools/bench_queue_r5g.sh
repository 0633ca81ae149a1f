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
run probe_tpu python tools/exp_r5_probe.py
run tpu_drive2 python -c "
import numpy as np, raytracer_js_tpu as rt
from raytracer_js_tpu.config import HitBackend
from tools.exp_r5_probe import build
scene = build(0)
cam = rt.make_camera((0,0,0.5), 128, 128, np.pi/2, np.pi/2)
hdr = np.asarray(rt.render_hdr(scene, cam, rt.RenderConfig(refmax=2, backend=HitBackend.TILED)))
from raytracer_js_tpu.oracle import scalar
ref = np.asarray(scalar.render(scene, cam, rt.RenderConfig(refmax=2)))
import json; print(json.dumps({'tpu_drive_ok': bool(np.allclose(hdr, ref, atol=1e-4)), 'maxerr': float(np.abs(hdr-ref).max())}))
"
run exp_c3c python tools/exp_c3c_r5.py
run exp_c4_fixed python tools/exp_r5_c4.py
run config4_v2 bench.py --config 4 --burst 8 --repeats 2
run config3_v2 bench.py --config 3 --repeats 3
echo "QUEUE G DONE $(date +%T)" >> $OUT/queue.log
