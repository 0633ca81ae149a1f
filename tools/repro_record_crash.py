"""Minimal repro for the >262k-ray OCTREE-DDA record worker crash (r3).

NOT run by default (it kills the TPU worker when it reproduces — rerun
jobs after). bench.py works around it by slicing recordings to <= n_pix /
--c5-slices rays (262_144 is the largest known-good size at 1M prims).

Observed r3/r4: record_paths over the OCTREE backend at 1M prims succeeds
at 261_120 rays and hard-crashes the axon TPU worker process between
262_144 and 522_240 rays (RESOURCE_EXHAUSTED-less death — the tunnel
drops). The DDA while_loop itself is ray-count-linear, so the suspected
cause is the scoped-VMEM footprint of the unrolled cell-step state at
large grids; pending a Mosaic-level diagnosis, slicing is the supported
operating mode.

Usage: python tools/repro_record_crash.py [n_rays]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 393_216
    from bench import build_config4_scene
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.accel.octree import build_octree
    from raytracer_js_tpu.config import HitBackend, OctreeConfig
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.ops.trace import record_paths

    scene = build_config4_scene(1_000_000)
    accel = build_octree(scene, OctreeConfig(max_depth=8))
    cam = make_camera((0.0, 0.0, 0.5), 1920, 1088, np.pi / 2,
                      np.pi / 2 * 1088 / 1920)
    org, dirs = pixel_rays(cam)
    org, dirs = org[:n_rays], dirs[:n_rays]
    rid = jnp.arange(n_rays, dtype=jnp.int32)
    cfg = RenderConfig(refmax=2, backend=HitBackend.OCTREE)
    rec = jax.jit(lambda: record_paths(scene, cfg, org, dirs,
                                       jax.random.key(0), rid,
                                       accel=accel))()
    print("survived:", n_rays, np.asarray(rec[:4]))


if __name__ == "__main__":
    main()
