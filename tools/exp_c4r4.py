"""r4 config-4 breakdown: where do the 0.75 s go with the listed cull?

  full_listed / full_dense / bounce0 — frame-level splits
  rounds — sweep while-loop iterations (measured: 1 at refmax=2)
  sel   — cull selectivity on the REAL post-bounce0 state
  comp  — per-component times of the single sweep round: the sort pair,
          the block-tile selection, the listed vs dense kernel on the
          compacted slice, and the XLA shade/respawn (_bounce).
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

from bench import build_config4_scene, _time_sustained
from raytracer_js_tpu import RenderConfig, make_camera
from raytracer_js_tpu.config import HitBackend, RayStatus
import raytracer_js_tpu.render_tiled as rtl
import raytracer_js_tpu.kernels.trace_tiled as tt
from raytracer_js_tpu.render_tiled import frame_tables, render_frame_tiled

SCENE = build_config4_scene(100_000)
W, H = 1920, 1088
CAM = make_camera((0.0, 0.0, 0.5), W, H, np.pi / 2, np.pi / 2 * H / W)
TAB, CNTS, C_MAX, GRID = frame_tables(SCENE, CAM)


def frame_splits():
    out = {}
    cfg2 = RenderConfig(refmax=2, backend=HitBackend.TILED)
    fn = jax.jit(lambda s: render_frame_tiled(
        s, cfg2, CAM, tables=(TAB, CNTS, C_MAX, GRID), with_diag=True))
    img, diag = fn(SCENE)
    out["rounds"] = int(diag["rounds"])
    out["unresolved"] = int(diag["unresolved"])
    dt, _ = _time_sustained(fn, SCENE, burst=8)
    out["full_listed_ms"] = dt * 1e3

    rtl.SWEEP_LISTED = False
    fnD = jax.jit(lambda s: render_frame_tiled(
        s, cfg2, CAM, tables=(TAB, CNTS, C_MAX, GRID), with_diag=True))
    dt, _ = _time_sustained(fnD, SCENE, burst=8)
    out["full_dense_ms"] = dt * 1e3
    rtl.SWEEP_LISTED = True

    cfg1 = RenderConfig(refmax=1, backend=HitBackend.TILED)
    fn1 = jax.jit(lambda s: render_frame_tiled(
        s, cfg1, CAM, tables=(TAB, CNTS, C_MAX, GRID)))
    dt, _ = _time_sustained(fn1, SCENE, burst=8)
    out["bounce0_ms"] = dt * 1e3
    print(json.dumps(out), flush=True)


@jax.jit
def _post_b0_slice(scene):
    """(org, dirs, working) of the sorted compacted cap slice, exactly as
    the sweep round sees it."""
    st = tt.frame_bounce0(scene, CAM, TAB, CNTS, C_MAX)
    flat = {k: st[k].reshape(-1) for k in st}
    org = jnp.stack([flat["ox"], flat["oy"], flat["oz"]], -1)
    dirs = jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1)
    working = flat["status"] == int(RayStatus.ALIVE)
    key = (rtl._pos_cell(scene, org) * 64
           + rtl._dir_bin(dirs)).astype(jnp.int32)
    key = jnp.where(working, key, jnp.int32(1 << 30))
    n = org.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    _, _, ox, oy, oz, dx, dy, dz, wk = jax.lax.sort(
        (key, idx, org[:, 0], org[:, 1], org[:, 2],
         dirs[:, 0], dirs[:, 1], dirs[:, 2],
         working.astype(jnp.int32)), num_keys=1)
    cap = min(n, rtl.SWEEP_SLICE)
    return (jnp.stack([ox, oy, oz], -1)[:cap],
            jnp.stack([dx, dy, dz], -1)[:cap],
            wk[:cap].astype(bool), jnp.sum(working))


def sel_and_components():
    from raytracer_js_tpu.kernels.nearest_hit import (BLOCK_R,
                                                      nearest_hit_pallas)

    orgs, dirss, wks, n_work = _post_b0_slice(SCENE)
    sweep_tab = rtl._sweep_perm(SCENE)
    scene_p, perm, tb = sweep_tab
    sel = jax.jit(lambda o, d, w: rtl._block_tile_select(o, d, w, tb))
    ids, cnt = sel(orgs, dirss, wks)
    cnt_np = np.asarray(cnt)
    blk_live = np.asarray(wks).reshape(-1, BLOCK_R).sum(1)
    lv = blk_live > 0
    T = int(tb.shape[0])
    print(json.dumps(dict(
        n_working=int(n_work), tiles=T,
        mean_cnt_live=float(cnt_np[lv].mean()),
        p50=float(np.percentile(cnt_np[lv], 50)),
        p90=float(np.percentile(cnt_np[lv], 90)),
        live_blocks=int(lv.sum()), blocks=int(lv.size),
    )), flush=True)

    comp = {}
    nl = jnp.minimum(n_work, orgs.shape[0])
    dt, _ = _time_sustained(lambda a: sel(*a), (orgs, dirss, wks), burst=16)
    comp["select_ms"] = dt * 1e3
    k_listed = jax.jit(lambda o, d: nearest_hit_pallas(
        scene_p, o, d, n_live=nl, tile_ids=(ids, cnt)))
    dt, _ = _time_sustained(lambda a: k_listed(*a), (orgs, dirss), burst=16)
    comp["kernel_listed_ms"] = dt * 1e3
    k_dense = jax.jit(lambda o, d: nearest_hit_pallas(
        scene_p, o, d, n_live=nl))
    dt, _ = _time_sustained(lambda a: k_dense(*a), (orgs, dirss), burst=16)
    comp["kernel_dense_ms"] = dt * 1e3

    # the sort pair at full frame size (15 operands there; 9 here is close)
    @jax.jit
    def sort_pair(scene):
        st = tt.frame_bounce0(scene, CAM, TAB, CNTS, C_MAX)
        flat = {k: st[k].reshape(-1) for k in st}
        org = jnp.stack([flat["ox"], flat["oy"], flat["oz"]], -1)
        dirs = jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1)
        working = flat["status"] == int(RayStatus.ALIVE)
        key = (rtl._pos_cell(scene, org) * 64
               + rtl._dir_bin(dirs)).astype(jnp.int32)
        n = org.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        _, inv, *rest = jax.lax.sort(
            (key, idx, *(flat[k] for k in
                         ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg",
                          "cb", "path"))), num_keys=1)
        _, *back = jax.lax.sort((inv, *rest), num_keys=1)
        return back[0]

    d0, _ = _time_sustained(jax.jit(
        lambda s: tt.frame_bounce0(s, CAM, TAB, CNTS, C_MAX)["cr"]),
        SCENE, burst=8)
    dt, _ = _time_sustained(sort_pair, SCENE, burst=8)
    comp["sortpair_minus_b0_ms"] = (dt - d0) * 1e3

    # XLA shade/respawn on the slice (replay _bounce with given winners)
    from raytracer_js_tpu.ops.trace import RayState, _bounce
    _t, pid = k_listed(orgs, dirss)
    cfg2 = RenderConfig(refmax=2, backend=HitBackend.TILED)
    state = RayState(org=orgs, dir=dirss, color=jnp.ones_like(orgs),
                     path=jnp.zeros(orgs.shape[:1]),
                     refr=jnp.ones(orgs.shape[:1]),
                     status=jnp.zeros(orgs.shape[:1], jnp.int32))
    bfn = jax.jit(lambda st, pid: _bounce(SCENE, cfg2, None, st, None,
                                          jnp.ones((), jnp.int32),
                                          pid_override=pid).color)
    dt, _ = _time_sustained(lambda a: bfn(*a), (state, pid), burst=16)
    comp["bounce_xla_ms"] = dt * 1e3
    print(json.dumps(comp), flush=True)


if __name__ == "__main__":
    frame_splits()
    sel_and_components()
