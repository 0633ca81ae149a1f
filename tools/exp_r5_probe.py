"""r5: on-chip probe for the lane-resident nearest-hit kernel.

The 600-sphere TPU drive diverged from the oracle (maxerr 0.45) while CPU
interpret is exact — isolate which r5 kernel change miscompiles on Mosaic:

probe A: dense kernel vs XLA brute on the drive scene (inf-poisoned pads)
probe B: same rays, scene padded to a full tile with REAL far spheres
         (no pads at all) -> isolates the inf poison
probe C: i32 cross-lane min reduction micro-kernel (the _finalize idiom)
Run: python tools/exp_r5_probe.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import raytracer_js_tpu as rt
from raytracer_js_tpu.kernels.nearest_hit import nearest_hit_pallas
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.ops.trace import nearest_hit_brute


def build(n_far=0):
    b = rt.SceneBuilder()
    b.set_sky(b.add_solid_texture((.35, .45, .65)))
    m = b.add_material(rt.ResponseType.REFLECTION)
    rng = np.random.default_rng(0)
    for i in range(600):
        p = rng.uniform(-4, 4, 3)
        p[0] += 8
        b.add_sphere(tuple(p), 0.25, m, b.add_solid_texture((.8, .3, .2)))
    for i in range(n_far):
        b.add_sphere((1e6 + i, 1e6, 1e6), 1e-3, m,
                     b.add_solid_texture((1., 1., 1.)))
    return b.build()


def probe(name, scene, org, dirs):
    t_k, p_k = jax.jit(lambda o, d: nearest_hit_pallas(scene, o, d))(
        org, dirs)
    t_b, p_b = jax.jit(lambda o, d: nearest_hit_brute(scene, o, d))(
        org, dirs)
    t_k, p_k, t_b, p_b = map(np.asarray, (t_k, p_k, t_b, p_b))
    mism = p_k != p_b
    out = {"probe": name, "pid_mismatch": int(mism.sum()),
           "t_maxerr": float(np.nanmax(np.abs(np.where(
               np.isfinite(t_b) & np.isfinite(t_k), t_k - t_b, 0.0))))}
    if mism.any():
        i = int(np.argmax(mism))
        out["first"] = {"i": i, "pid_k": int(p_k[i]), "pid_b": int(p_b[i]),
                        "t_k": float(t_k[i]), "t_b": float(t_b[i])}
    print(json.dumps(out), flush=True)
    return out


def probe_i32_min():
    """i32 lane-min + the where/min pid select, exactly the _finalize idiom."""
    rng = np.random.default_rng(1)
    t = rng.uniform(0.0, 10.0, (64, 128)).astype(np.float32)
    t[rng.uniform(size=t.shape) < 0.3] = np.inf
    pid = rng.integers(0, 1 << 20, (64, 128)).astype(np.int32)

    def kern(t_ref, p_ref, tmin_ref, pmin_ref):
        tl = t_ref[:, :]
        pl_ = p_ref[:, :]
        tb = jnp.min(tl, axis=1, keepdims=True)
        pb = jnp.min(jnp.where(tl <= tb, pl_, jnp.int32(2147483647)),
                     axis=1, keepdims=True)
        tmin_ref[:, :] = tb
        pmin_ref[:, :] = pb

    tm, pm = pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct((64, 1), jnp.float32),
                   jax.ShapeDtypeStruct((64, 1), jnp.int32)],
    )(jnp.asarray(t), jnp.asarray(pid))
    tm, pm = np.asarray(tm)[:, 0], np.asarray(pm)[:, 0]
    te = t.min(1)
    pe = np.array([pid[r][t[r] <= te[r]].min() for r in range(64)])
    out = {"probe": "i32_min", "t_ok": bool(np.array_equal(tm, te)),
           "pid_ok": bool(np.array_equal(pm, pe))}
    if not out["pid_ok"]:
        bad = int(np.argmax(pm != pe))
        out["first"] = {"r": bad, "got": int(pm[bad]), "want": int(pe[bad])}
    print(json.dumps(out), flush=True)
    return out


def main():
    res = [probe_i32_min()]
    cam = rt.make_camera((0, 0, 0.5), 128, 128, np.pi / 2, np.pi / 2)
    org, dirs = pixel_rays(cam)
    res.append(probe("A_drive_pads", build(0), org, dirs))
    res.append(probe("B_full_tile", build(40), org, dirs))
    with open("/root/repo/tools/bench_results_r5/exp_probe.jsonl", "w") as f:
        for r in res:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
