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
run tpu_drive python -c "
import numpy as np, raytracer_js_tpu as rt
from raytracer_js_tpu.config import HitBackend
b = rt.SceneBuilder(); b.set_sky(b.add_solid_texture((.35,.45,.65)))
m = b.add_material(rt.ResponseType.REFLECTION)
import numpy.random as npr
rng = npr.default_rng(0)
for i in range(600):
    p = rng.uniform(-4, 4, 3); p[0] += 8
    b.add_sphere(tuple(p), 0.25, m, b.add_solid_texture((.8,.3,.2)))
scene = b.build()
cam = rt.make_camera((0,0,0.5), 128, 128, np.pi/2, np.pi/2)
hdr = np.asarray(rt.render_hdr(scene, cam, rt.RenderConfig(refmax=2, backend=HitBackend.TILED)))
assert np.isfinite(hdr).all(), 'nonfinite'
from raytracer_js_tpu.oracle import scalar
ref = np.asarray(scalar.render(scene, cam, rt.RenderConfig(refmax=2)))
import json; print(json.dumps({'tpu_drive_ok': bool(np.allclose(hdr, ref, atol=1e-4)), 'maxerr': float(np.abs(hdr-ref).max())}))
"
RT_NH_SUB_R=64 run exp_c4_sub64 python tools/exp_r5_c4.py
RT_NH_SUB_R=128 run exp_c4_sub128 python tools/exp_r5_c4.py
RT_NH_SUB_R=32 run exp_c4_sub32 python tools/exp_r5_c4.py
RT_NH_SUB_R=512 run exp_c4_sub512 python tools/exp_r5_c4.py
echo "QUEUE E DONE $(date +%T)" >> $OUT/queue.log
