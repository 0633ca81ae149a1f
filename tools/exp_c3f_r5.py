"""r5: bisect the in-round image cost (exp_c3e: round_img 25 ms vs
round_solid 8.6 ms; standalone _bounce only 2.4 ms) by surgically
stubbing one image-path component at a time inside the REAL round.

round_full      - unmodified image round (baseline, = exp_c3e round_img)
round_nosample  - tex_mod.sample stubbed to solid_rgb rows
round_nosky     - ops.trace.sky_color stubbed to a constant
round_nouv      - _surface_from_rows forced need_uv=False
Run: python tools/exp_c3f_r5.py
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


def main():
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.config import HitBackend, RayStatus
    import raytracer_js_tpu.kernels.trace_tiled as tt
    import raytracer_js_tpu.models.textures as tex_mod
    import raytracer_js_tpu.ops.trace as trace_mod
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

    time_round("round_full")

    real_sample = tex_mod.sample
    real_sky = trace_mod.sky_color
    real_sfr = trace_mod._surface_from_rows

    try:
        tex_mod.sample = lambda tex, tid, u, v: tex.solid_rgb[
            jnp.clip(tid, 0, tex.solid_rgb.shape[0] - 1)]
        trace_mod.tex_mod.sample = tex_mod.sample
        time_round("round_nosample")
    finally:
        tex_mod.sample = real_sample
        trace_mod.tex_mod.sample = real_sample

    try:
        trace_mod.sky_color = lambda sc, d: jnp.full(
            (d.shape[0], 3), 0.4, jnp.float32)
        time_round("round_nosky")
    finally:
        trace_mod.sky_color = real_sky

    try:
        trace_mod._surface_from_rows = (
            lambda sc, o, d, p, r, need_uv: real_sfr(sc, o, d, p, r, False))
        time_round("round_nouv")
    finally:
        trace_mod._surface_from_rows = real_sfr

    with open("/root/repo/tools/bench_results_r5/exp_c3f.jsonl", "w") as fo:
        for r in OUT:
            fo.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
