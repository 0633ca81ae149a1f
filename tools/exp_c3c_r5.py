"""r5: config-3 image-vs-solid cost decomposition at 512^2 (262k rays).

bounce_img / bounce_solid — one XLA replay _bounce (pid_override) over the
    full 262k-ray population on the image vs solidified scene: the
    per-round shading cost the sweep loop pays.
frame_{img,solid}_r{1,3} — full TILED frames (bounce-0-only and refmax=3).
frame_img_rounds0 — refmax=3 with RT_TILED_ROUNDS handled via module
    globals: EXTRA_ROUNDS dropped to 0 (round-machinery overhead probe).
gather_take / gather_grouped / gather_flat — gather_rows_pair variants at
    the [262k] x [5126, C] shape (the _bounce row gather).
Run: python tools/exp_c3c_r5.py
"""
import functools
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


def rec(name, ms, **kw):
    OUT.append({"name": name, "ms": ms * 1e3, **kw})
    print(json.dumps(OUT[-1]), flush=True)


def main():
    from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
    from raytracer_js_tpu.config import HitBackend, RayStatus
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.ops import gather as gth
    from raytracer_js_tpu.ops.trace import RayState, _bounce, prim_rows
    from raytracer_js_tpu.render_tiled import frame_tables
    import raytracer_js_tpu.render_tiled as rtl

    w, h = 512, 512
    n = w * h
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    scene = build_config3_scene()
    tex = scene.textures
    solid = tex.replace(kind=jnp.zeros_like(tex.kind),
                        solid_rgb=jnp.full_like(tex.solid_rgb, 0.5),
                        has_images=False, has_bilinear=False)
    ssc = scene.replace(textures=solid)

    # --- one replay _bounce over the full population ---------------------
    org, dirs = pixel_rays(cam)
    rng_np = np.random.default_rng(0)
    pid = jnp.asarray(rng_np.integers(0, scene.n_prims, n).astype(np.int32))
    st = RayState(org=org, dir=dirs, color=jnp.ones((n, 3), jnp.float32),
                  path=jnp.zeros((n,), jnp.float32),
                  refr=jnp.ones((n,), jnp.float32),
                  status=jnp.full((n,), int(RayStatus.ALIVE), jnp.int32))
    bounce = jnp.zeros((n,), jnp.int32)

    for name, sc in (("bounce_img", scene), ("bounce_solid", ssc)):
        f = jax.jit(lambda s, st: _bounce(s, RenderConfig(refmax=3), None,
                                          st, None, bounce,
                                          pid_override=pid))
        _materialize(f(sc, st).color)
        dt, _ = _time_sustained(lambda s: f(s, st).color, sc, burst=32)
        rec(name, dt)

    # --- full frames -----------------------------------------------------
    def run_frame(name, sc, refmax):
        cfg = RenderConfig(refmax=refmax, backend=HitBackend.TILED)
        tab, cnts, c_max, grid = frame_tables(sc, cam)
        fn = jax.jit(lambda s: render_hdr(sc.replace(textures=s.textures),
                                          cam, cfg,
                                          tables=(tab, cnts, c_max, grid)))
        img = fn(sc)
        assert np.isfinite(np.asarray(img)).all()
        dt, _ = _time_sustained(fn, sc, burst=16)
        rec(name, dt)

    run_frame("frame_img_r3", scene, 3)
    run_frame("frame_img_r1", scene, 1)
    run_frame("frame_solid_r3", ssc, 3)
    run_frame("frame_solid_r1", ssc, 1)

    old = rtl.EXTRA_ROUNDS
    rtl.EXTRA_ROUNDS = 0
    try:
        run_frame("frame_img_rounds0", scene, 3)
    finally:
        rtl.EXTRA_ROUNDS = old

    # --- gather variants at the _bounce shape ----------------------------
    grad_tab, disc_tab = prim_rows(scene)
    k = grad_tab.shape[0]
    rec("tables", 0.0, k=int(k), c_grad=int(grad_tab.shape[1]),
        c_disc=int(disc_tab.shape[1]))

    f_take = jax.jit(lambda g, d: gth.gather_rows_pair(g, d, pid))
    _materialize(f_take(grad_tab, disc_tab))
    dt, _ = _time_sustained(lambda a: f_take(*a), (grad_tab, disc_tab),
                            burst=32)
    rec("gather_take", dt)

    @jax.jit
    def f_grouped(g, d):
        cat = jnp.concatenate([g, jax.lax.stop_gradient(d)], axis=1)
        gsz = 64
        n_grp = -(-k // gsz)
        pad = n_grp * gsz - k
        if pad:
            cat = jnp.concatenate(
                [cat, jnp.zeros((pad, cat.shape[1]), cat.dtype)], 0)
        wide = cat.reshape(n_grp, gsz * cat.shape[1])
        oh = (pid[:, None] // gsz
              == jax.lax.iota(jnp.int32, n_grp)[None, :]).astype(cat.dtype)
        tmp = jnp.matmul(oh, wide, precision=jax.lax.Precision.HIGHEST)
        sel = (pid[:, None] % gsz
               == jax.lax.iota(jnp.int32, gsz)[None, :]).astype(cat.dtype)
        return jnp.einsum("ng,ngc->nc", sel,
                          tmp.reshape(-1, gsz, cat.shape[1]),
                          precision=jax.lax.Precision.HIGHEST)

    r_g = f_grouped(grad_tab, disc_tab)
    r_t = jnp.concatenate(f_take(grad_tab, disc_tab), axis=1)
    assert np.array_equal(np.asarray(r_g), np.asarray(r_t)), "grouped != take"
    dt, _ = _time_sustained(lambda a: f_grouped(*a), (grad_tab, disc_tab),
                            burst=32)
    rec("gather_grouped", dt)

    old_rows = gth.ONE_HOT_MAX_ROWS
    gth.ONE_HOT_MAX_ROWS = 8192
    try:
        f_flat = jax.jit(lambda g, d: gth.gather_rows_pair(g, d, pid))
        _materialize(f_flat(grad_tab, disc_tab))
        dt, _ = _time_sustained(lambda a: f_flat(*a),
                                (grad_tab, disc_tab), burst=32)
        rec("gather_flat", dt)
    finally:
        gth.ONE_HOT_MAX_ROWS = old_rows

    with open("/root/repo/tools/bench_results_r5/exp_c3c.jsonl", "w") as fo:
        for r in OUT:
            fo.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
