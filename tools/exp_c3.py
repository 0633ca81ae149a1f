"""r4 config-3 ablation: where do the 0.22 s go at 512^2 / 5k tris / 3 bounce?

Measures, honest burst timing:
  full        — the config-3 frame exactly as bench.py runs it (PALLAS)
  brute       — same frame on the XLA dense search
  kernel      — nearest_hit_pallas alone on the primary rays (x1)
  record      — record_paths (search-only forward, no shading)
  replay      — forward replay from recorded pid_seq (shading glue only,
                no search) — full = record-ish + replay-ish
  solid       — same geometry, solid textures + solid sky (atlas gathers
                and image-sky sampling compiled out)
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_config3_scene, _time_sustained
from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
from raytracer_js_tpu.config import HitBackend
from raytracer_js_tpu.kernels.nearest_hit import nearest_hit_pallas
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.ops.trace import record_paths, trace_rays


def build_solid_variant():
    from raytracer_js_tpu import ResponseType, SceneBuilder
    from raytracer_js_tpu.utils.mesh import icosphere

    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.35, 0.45, 0.65)))
    grey = b.add_solid_texture((0.55, 0.55, 0.6))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    gold = b.add_solid_texture((0.9, 0.75, 0.3))
    red = b.add_solid_texture((0.55, 0.2, 0.2))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((0.0, 0.0, -51.0), 100.0, diffuse, grey)
    v, f = icosphere(4, radius=1.2, center=(6.0, 0.0, 1.0))
    b.add_mesh(v, f, mirror, gold)
    b.add_sphere((4.0, -2.0, 0.6), 0.8, mirror, white)
    b.add_sphere((4.0, 2.2, 0.7), 0.9, diffuse, red)
    b.add_sphere((6.0, 1.0, 5.0), 1.2, light, white)
    return b.build()


def main():
    w, h = 512, 512
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2)
    org, dirs = pixel_rays(cam)
    n = org.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    cfg = RenderConfig(refmax=3, backend=HitBackend.PALLAS)

    scene = build_config3_scene()
    results = {}

    fn = jax.jit(lambda s: render_hdr(s, cam, cfg))
    dt, _ = _time_sustained(fn, scene, burst=16)
    results["full"] = dt

    # (BRUTE dropped: the dense tri test materializes [262k, 5.1k]
    # cross-product temps — 35 GB HBM, measured OOM)

    kfn = jax.jit(lambda s: nearest_hit_pallas(s, org, dirs))
    dt, _ = _time_sustained(kfn, scene, burst=16)
    results["kernel_x1"] = dt

    rfn = jax.jit(lambda s: record_paths(s, cfg, org, dirs, key, rid))
    dt, _ = _time_sustained(rfn, scene, burst=16)
    results["record"] = dt
    rec = rfn(scene)

    pfn = jax.jit(lambda s: trace_rays(s, cfg, org, dirs, key, rid,
                                       pid_seq=rec).color)
    dt, _ = _time_sustained(pfn, scene, burst=16)
    results["replay_fwd"] = dt

    solid = build_solid_variant()
    dt, _ = _time_sustained(fn, solid, burst=16)
    results["solid_full"] = dt
    dt, _ = _time_sustained(pfn, solid, burst=16)
    results["solid_replay_fwd"] = dt

    out = {k: dict(ms=v * 1e3, rays_per_s=n / v) for k, v in results.items()}
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
