"""r5: config-4 listed sweep kernel at one RT_NH_SUB_R value.

Measures the bounce>=1 whole-table listed kernel (lane-resident min +
poisoned padding + sub-block early exit) on the real post-bounce0 ray
population, plus the per-block tile selection cost — one process per
RT_NH_SUB_R value (env is read at import time).
Run: RT_NH_SUB_R=64 python tools/exp_r5_c4.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bench import build_config4_scene, _time_sustained
from raytracer_js_tpu import make_camera
from raytracer_js_tpu.config import RayStatus
import raytracer_js_tpu.render_tiled as rtl
import raytracer_js_tpu.kernels.trace_tiled as tt
from raytracer_js_tpu.render_tiled import frame_tables
from raytracer_js_tpu.kernels.nearest_hit import (BLOCK_R, SUB_R,
                                                  nearest_hit_pallas)


def main():
    scene = build_config4_scene(100_000)
    w, h = 1920, 1088
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    tab, cnts, c_max, grid = frame_tables(scene, cam)

    @jax.jit
    def post_b0(scene):
        st = tt.frame_bounce0(scene, cam, tab, cnts, c_max)
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

    orgs, dirss, wks, n_work = post_b0(scene)
    n_pad = -(-orgs.shape[0] // BLOCK_R) * BLOCK_R
    if n_pad != orgs.shape[0]:
        pad = ((0, n_pad - orgs.shape[0]), (0, 0))
        orgs = jnp.pad(orgs, pad)
        dirss = jnp.pad(dirss, pad, constant_values=1.0)
        wks = jnp.pad(wks, (0, n_pad - wks.shape[0]))
    out = {"sub_r": SUB_R, "block_r": BLOCK_R, "n_work": int(n_work)}
    nl = jnp.minimum(n_work, orgs.shape[0])
    scene_p, sph_e, tri_e = rtl._sweep_perm(scene)
    perm, tb, fan = sph_e
    sel = jax.jit(lambda o, d, w: rtl._block_tile_select(o, d, w, tb))
    ids, tlo = sel(orgs, dirss, wks)
    dt, _ = _time_sustained(lambda a: sel(*a), (orgs, dirss, wks),
                            burst=16)
    out["select_ms"] = dt * 1e3
    cnt_np = np.isfinite(np.asarray(tlo)).sum(1)
    lv = np.asarray(wks).reshape(-1, BLOCK_R).sum(1) > 0
    out["mean_cnt_live"] = float(cnt_np[lv].mean())
    out["tiles"] = int(tb.shape[0])
    k_listed = jax.jit(lambda o, d, i, c: nearest_hit_pallas(
        scene_p, o, d, n_live=nl, tile_ids=(i, c), sph_fan=fan))
    t0, p0 = k_listed(orgs, dirss, ids, tlo)
    dt, _ = _time_sustained(lambda a: k_listed(*a),
                            (orgs, dirss, ids, tlo), burst=16)
    out["kernel_listed_ms"] = dt * 1e3
    # exactness cross-check vs the dense stream on a slice
    k_dense = jax.jit(lambda o, d: nearest_hit_pallas(scene_p, o, d,
                                                      n_live=nl))
    td, pd = k_dense(orgs, dirss)
    nw = int(n_work)
    ok_t = np.allclose(np.asarray(t0)[:nw], np.asarray(td)[:nw],
                       rtol=1e-6, atol=1e-6, equal_nan=True)
    mism = int((np.asarray(p0)[:nw] != np.asarray(pd)[:nw]).sum())
    out["parity_t_ok"] = bool(ok_t)
    out["parity_pid_mismatch"] = mism
    print(json.dumps(out), flush=True)
    with open("/root/repo/tools/bench_results_r5/exp_c4.jsonl", "a") as fo:
        fo.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
