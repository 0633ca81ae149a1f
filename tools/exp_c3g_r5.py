"""r5: which CLASS's uv path costs the in-round ~10.8 ms (exp_c3f)?

round_full   - control
round_sphuv  - sphere_surface uv dropped (equirect atan2 DCE'd)
round_boxuv  - box_surface uv dropped
round_triuv  - tri_surface uv dropped
round_alluv  - all three dropped (should match exp_c3f round_nouv)
Run: python tools/exp_c3g_r5.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import _materialize, _time_sustained, build_config3_scene

OUT = []


def rec(name, ms):
    OUT.append({"name": name, "ms": ms * 1e3})
    print(json.dumps(OUT[-1]), flush=True)


def drop_uv(f):
    def g(*a):
        t, p, n, (u, v) = f(*a)
        z = jnp.zeros_like(t)
        return t, p, n, (z, z)
    return g


def main():
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.config import HitBackend, RayStatus
    import raytracer_js_tpu.kernels.trace_tiled as tt
    import raytracer_js_tpu.ops.intersect as intersect
    import raytracer_js_tpu.render_tiled as rtl
    from raytracer_js_tpu.render_tiled import frame_tables

    w = h = 512
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    scene = build_config3_scene()
    cfg = RenderConfig(refmax=3, backend=HitBackend.TILED)
    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")
    tab, cnts, c_max, grid = frame_tables(scene, cam)
    st = tt.frame_bounce0(scene, cam, tab, cnts, c_max)
    rows = st["cr"].size // tt.LANE
    cols = [st[k].reshape(rows, tt.LANE) for k in names]
    bounce = jnp.where(
        st["status"].reshape(-1) == int(RayStatus.ALIVE), 1, 0)
    refr = jnp.ones((rows * tt.LANE,), jnp.float32)
    sweep_tab = rtl._sweep_perm(scene)
    seed = jnp.zeros((), jnp.uint32)
    rid = jnp.arange(rows * tt.LANE, dtype=jnp.int32)

    def time_round(name):
        def round_fn(s, cols, bounce, refr):
            out_cols, b2, r2, _ = rtl._rescue_round(
                s, cfg, cols, bounce, refr, seed, rid,
                cap=min(rows * tt.LANE, rtl.SWEEP_SLICE),
                sweep_tab=sweep_tab)
            return out_cols[6]

        rf = jax.jit(round_fn)
        _materialize(rf(scene, cols, bounce, refr))
        dt, _ = _time_sustained(lambda a: rf(*a),
                                (scene, cols, bounce, refr), burst=16)
        rec(name, dt)

    real = {k: getattr(intersect, k)
            for k in ("sphere_surface", "box_surface", "tri_surface")}
    time_round("round_full")
    for k in ("sphere_surface", "box_surface", "tri_surface"):
        try:
            setattr(intersect, k, drop_uv(real[k]))
            time_round(f"round_no_{k.split('_')[0]}uv")
        finally:
            setattr(intersect, k, real[k])
    try:
        for k in real:
            setattr(intersect, k, drop_uv(real[k]))
        time_round("round_alluv")
    finally:
        for k in real:
            setattr(intersect, k, real[k])

    with open("/root/repo/tools/bench_results_r5/exp_c3g.jsonl", "w") as fo:
        for r in OUT:
            fo.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
