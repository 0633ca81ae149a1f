"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): primary rays/s per chip at 1080p, 2-bounce.
``vs_baseline`` is the ratio against the 1e9 rays/s/chip north-star target
(the reference publishes no numbers of its own — BASELINE.md §"Published").

Usage: python bench.py [--small] [--config N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: first compiles over the remote-TPU tunnel
# run minutes; identical programs then load in <1s.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def build_scene(n_spheres: int, seed: int = 42):
    from raytracer_js_tpu import ResponseType, SceneBuilder

    b = SceneBuilder()
    sky = b.add_solid_texture((0.35, 0.45, 0.65))
    b.set_sky(sky)
    grey = b.add_solid_texture((0.6, 0.6, 0.6))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((0.0, 0.0, -51.0), 100.0, diffuse, grey)
    rng = np.random.default_rng(seed)
    centers = rng.uniform([2.0, -6.0, -0.5], [14.0, 6.0, 5.0], (n_spheres, 3))
    radii = rng.uniform(0.15, 0.6, n_spheres)
    palette = [b.add_solid_texture(rng.uniform(0.2, 1.0, 3)) for _ in range(8)]
    for i in range(n_spheres):
        b.add_sphere(centers[i], float(radii[i]),
                     mirror if i % 3 == 0 else diffuse, palette[i % 8])
    b.add_sphere((8.0, 0.5, 6.0), 1.0, light, white)
    return b.build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="256x256 smoke configuration")
    ap.add_argument("--spheres", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--backward", action="store_true",
                    help="measure backward (gradient) rays/s instead")
    args = ap.parse_args()

    import jax

    from raytracer_js_tpu import RenderConfig, make_camera, render_hdr

    if args.small:
        w, h = 256, 256
    else:
        w, h = 1920, 1088  # 1080p rounded to a tile multiple of 8 rows

    from raytracer_js_tpu.config import HitBackend

    scene = build_scene(args.spheres)
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2,
                      np.pi / 2 * h / w)
    # FUSED: whole-trace Pallas kernel (falls back to BRUTE off-class)
    cfg = RenderConfig(refmax=2, backend=HitBackend.FUSED)

    if args.backward:
        return bench_backward(scene, cam, args, w, h)

    fn = jax.jit(lambda s: render_hdr(s, cam, cfg))
    img = jax.block_until_ready(fn(scene))            # compile + warm
    assert np.isfinite(np.asarray(img)).all()

    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(scene))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays = w * h * cfg.spp
    rays_per_s = rays / dt

    target = 1.0e9  # BASELINE.md north-star rays/s/chip
    print(json.dumps({
        "metric": "primary_rays_per_s_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / target,
        "detail": {
            "w": w, "h": h, "refmax": cfg.refmax, "spheres": args.spheres,
            "best_s": dt, "times_s": times,
            "backend": str(cfg.backend), "device": str(jax.devices()[0]),
        },
    }))


def bench_backward(scene, cam, args, w, h):
    """Backward (gradient) rays/s: one value_and_grad of the pixel L2 loss
    through the differentiable BRUTE path wrt all float scene leaves
    (BASELINE.md metric 2)."""
    import jax
    import jax.numpy as jnp

    from raytracer_js_tpu import RenderConfig
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.parallel.sharding import float_partition
    from raytracer_js_tpu.render import render_rays

    cfg = RenderConfig(refmax=2)
    org, dirs = pixel_rays(cam)
    rid = jnp.arange(org.shape[0], dtype=jnp.int32)
    key = jax.random.key(0)
    params, rebuild = float_partition(scene)
    target = jnp.zeros((org.shape[0], 3), jnp.float32)

    def loss(params):
        colors = render_rays(rebuild(params), cfg, org, dirs, key, rid)
        return jnp.sum((colors - target) ** 2) / org.shape[0]

    fn = jax.jit(jax.value_and_grad(loss))
    jax.block_until_ready(fn(params))
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays_per_s = w * h / dt
    print(json.dumps({
        "metric": "backward_rays_per_s_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": None,   # BASELINE: "measured & reported"
        "detail": {"w": w, "h": h, "refmax": cfg.refmax,
                   "spheres": args.spheres, "best_s": dt, "times_s": times},
    }))


if __name__ == "__main__":
    sys.exit(main())
