"""Decompose headline frame time: kernel-only vs stack epilogue; FUSE_SUB sweep.

Usage: RT_FUSE_SUB=32 python exp_frame.py
"""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_scene
from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
from raytracer_js_tpu.config import HitBackend
from raytracer_js_tpu.kernels import trace_fused as tf


def sustained(fn, arg, burst=16, repeats=4):
    jax.block_until_ready(fn(arg))
    best = np.inf
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(arg) for _ in range(burst)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / burst)
    return best


def main():
    w, h = 1920, 1088
    scene = build_scene(50)
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    cfg = RenderConfig(refmax=2, backend=HitBackend.FUSED)

    # kernel only: planar outputs, no interleave
    n = w * h
    quant = tf.FUSE_SUB * tf.SP_LANE
    rows = (-(-n // quant)) * tf.FUSE_SUB

    def kernel_only(scene):
        sph, box, tri, sky, meta = tf._pack_prims(scene, cam_pos=cam.pos)
        cam_arr = jnp.concatenate([
            cam.pos, cam.front, cam.left, cam.up,
            jnp.array([cam.fov_h / cam.w, cam.fov_v / cam.h,
                       float(cam.w // 2), float(cam.h // 2),
                       1.0 / cam.w, float(cam.w)], jnp.float32)],
        ).reshape(1, tf._CAM_SLOTS)
        cr, cg, cb, st = tf._trace_frame_call(
            cam_arr, sph, box, tri, sky, meta, 2,
            float(cfg.distance_attenuation_factor), rows, interpret=False)
        return cr, cg, cb

    k = jax.jit(kernel_only)
    t_k = sustained(k, scene)
    full = jax.jit(lambda s: render_hdr(s, cam, cfg))
    t_f = sustained(full, scene)

    # refmax=1 isolates bounce-0 cost
    cfg1 = RenderConfig(refmax=1, backend=HitBackend.FUSED)
    full1 = jax.jit(lambda s: render_hdr(s, cam, cfg1))
    t_1 = sustained(full1, scene)

    print(json.dumps({
        "fuse_sub": tf.FUSE_SUB,
        "kernel_planar_ms": t_k * 1e3,
        "full_ms": t_f * 1e3,
        "full_refmax1_ms": t_1 * 1e3,
    }))


if __name__ == "__main__":
    main()
