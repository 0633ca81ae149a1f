"""Measure the unified prim-rows bounce (r4): replay fwd/vg at 50 and 1000
prims, headline shape. Follow-up to exp_backward2's ablation."""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene, _time_sustained
from raytracer_js_tpu import RenderConfig, make_camera
from raytracer_js_tpu.config import HitBackend
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.ops.trace import record_paths, trace_rays
from raytracer_js_tpu.parallel.sharding import float_partition


def main():
    w, h = 1920, 1088
    for n_sph in (50, 1000):
        scene = build_scene(n_sph)
        cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2,
                          np.pi / 2 * h / w)
        org, dirs = pixel_rays(cam)
        n = org.shape[0]
        rid = jnp.arange(n, dtype=jnp.int32)
        key = jax.random.key(0)
        params, rebuild = float_partition(scene)
        cfg = RenderConfig(refmax=2, backend=HitBackend.PALLAS)
        rec = jax.jit(lambda p: record_paths(rebuild(p), cfg, org, dirs,
                                             key, rid))(params)
        target = jnp.zeros((n, 3), jnp.float32)

        def loss(p):
            st = trace_rays(rebuild(p), cfg, org, dirs, key, rid,
                            pid_seq=rec)
            return jnp.sum((st.color - target) ** 2) / n

        row = {"n_sph": n_sph, "variant": "prim_rows"}
        dt_f, _ = _time_sustained(jax.jit(loss), params, burst=8, repeats=3)
        row.update(fwd_ms=dt_f * 1e3, fwd_rps=n / dt_f)
        dt_g, _ = _time_sustained(jax.jit(jax.value_and_grad(loss)),
                                  params, burst=8, repeats=3)
        row.update(vg_ms=dt_g * 1e3, vg_rps=n / dt_g)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
