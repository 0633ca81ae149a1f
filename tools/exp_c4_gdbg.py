"""Round-by-round config-4 grid-path debugging on chip.

Drives the tiled rounds from the HOST (no while_loop) printing, per round:
working-ray count, wall time, and the first live segment's selection
diagnostics (t_safe stats, selected-row counts) — to find why the grid
path leaves stragglers that the interpret-scale tests resolve.

Usage: python tools/exp_c4_gdbg.py [--prims 100000] [--rounds 8]
"""
import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prims", type=int, default=100_000)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--rescues", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import build_config4_scene
    import raytracer_js_tpu as rt
    from raytracer_js_tpu import render_tiled as rtl
    from raytracer_js_tpu.accel import candidates as cand
    from raytracer_js_tpu.config import RayStatus
    from raytracer_js_tpu.kernels import trace_tiled as tt

    scene = build_config4_scene(args.prims)
    cfg = rt.RenderConfig(refmax=2)
    cam = rt.make_camera((0.0, 0.0, 0.5), 1920, 1088, np.pi / 2,
                         np.pi / 2 * 1088 / 1920)
    tab, cnts, c_max, grid = rtl.frame_tables(scene, cam)
    print(f"grid c_max {grid.c_max} budget {grid.budget} base {grid.base}",
          flush=True)
    st = jax.jit(lambda s: tt.frame_bounce0(
        scene, cam, tab, cnts, c_max))(scene)
    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")
    hp, wp = np.asarray(st["cr"]).shape
    rows = hp * wp // tt.LANE
    n = hp * wp
    cols = [jnp.asarray(np.asarray(st[k]).reshape(rows, tt.LANE))
            for k in names]
    bounce = jnp.where(jnp.asarray(np.asarray(st["status"]).reshape(-1))
                       == int(RayStatus.ALIVE), 1, 0)
    t_done = jnp.zeros((n,), jnp.float32)
    refr = jnp.zeros((n,), jnp.float32)
    _CAP = rtl._CAP

    def working_count(cols, bounce):
        return int(np.asarray(jnp.sum(
            ((cols[10].reshape(-1) == int(RayStatus.ALIVE))
             & (bounce < cfg.refmax)).astype(jnp.int32))))

    @functools.partial(jax.jit, static_argnums=(4,))
    def one_round_fine(cols, t_done, refr, bounce, fine):
        status_f = cols[10].reshape(-1)
        capped = ((status_f == int(RayStatus.ALIVE))
                  & (bounce >= cfg.refmax))
        cols = list(cols)
        cols[10] = jnp.where(capped, _CAP, status_f).reshape(rows, tt.LANE)
        cols, t_done, res_hit, refr, _pid = rtl.packet_bounce(
            scene, cols, 4096, t_done, rng=None, accel=None,
            wave_sub=tt.WAVE_SUB, fine_key=fine, grid=grid)
        status_o = cols[10].reshape(-1)
        bounce2 = bounce + jnp.where(
            res_hit & (status_o == int(RayStatus.ALIVE)), 1, 0)
        cols[10] = jnp.where(status_o == _CAP, int(RayStatus.ALIVE),
                             status_o).reshape(rows, tt.LANE)
        return cols, t_done, refr, bounce2

    # selection diagnostics on the first live segment
    @functools.partial(jax.jit, static_argnums=(2,))
    def seg_diag(cols, t_done, fine):
        flat = [c.reshape(-1) for c in cols]
        org = jnp.stack(flat[0:3], -1)
        dirs = jnp.stack(flat[3:6], -1)
        alive = flat[10] == int(RayStatus.ALIVE)
        s_lo, s_hi = rtl._robust_extent(scene)
        diag = jnp.linalg.norm(s_hi - s_lo) + 1e-6
        qt = jnp.clip((t_done / (diag / 16.0)).astype(jnp.int32), 0, 63)
        if fine:
            key = ((((qt << 6) + rtl._dir_bin(dirs)) << 18)
                   + rtl._morton_key(scene, org, bits=6))
        else:
            key = ((qt * 4096 + rtl._pos_cell(scene, org)) * 64
                   + rtl._dir_bin(dirs)).astype(jnp.int32)
        key = jnp.where(alive, key, jnp.int32(1 << 30))
        idx = jnp.arange(n, dtype=jnp.int32)
        _, _, *flat_s = jax.lax.sort((key, idx, *flat, t_done), num_keys=1)
        td_s = flat_s[11]
        packet = tt.WAVE_SUB * tt.LANE
        seg = 128 * packet
        org_s = jnp.stack(flat_s[0:3], -1)[:seg]
        dir_s = jnp.stack(flat_s[3:6], -1)[:seg]
        al_s = (flat_s[10] == int(RayStatus.ALIVE))[:seg]
        tab2, cnts2, t_safe = cand.packet_candidates_grid(
            scene, grid, org_s, dir_s, al_s, packet, t_done=td_s[:seg])
        o0 = cnts2[:, 4:7]
        d_c = jnp.linalg.norm(org_s.reshape(-1, packet, 3) - o0[:, None],
                              axis=-1)
        live_pk = al_s.reshape(-1, packet)
        tsr = t_safe[:, None] - d_c
        frac_pos = (jnp.sum((tsr > 0) & live_pk)
                    / jnp.maximum(jnp.sum(live_pk), 1))
        return (t_safe, cnts2[:, :3].sum(1), frac_pos,
                jnp.sum(al_s.astype(jnp.int32)))

    w0 = working_count(cols, bounce)
    print(f"after b0: working {w0}", flush=True)
    for r in range(args.rounds):
        fine = r > 0
        ts, nrows, frac, seg_live = seg_diag(cols, t_done, fine)
        ts = np.asarray(ts)
        print(f"  seg diag r{r}: live {int(seg_live)} t_safe med "
              f"{np.median(ts[np.isfinite(ts)]):.2f} inf "
              f"{np.mean(~np.isfinite(ts)):.2f} rows med "
              f"{np.median(np.asarray(nrows)):.0f} "
              f"frac(tsr>0) {float(frac):.3f}", flush=True)
        t0 = time.perf_counter()
        cols, t_done, refr, bounce = one_round_fine(cols, t_done, refr,
                                                    bounce, fine)
        w = working_count(cols, bounce)
        print(f"round {r}: working {w}  ({time.perf_counter()-t0:.2f}s)",
              flush=True)
        if w == 0:
            break
    seed = rid = None
    for r in range(args.rescues):
        t0 = time.perf_counter()
        cols, bounce, refr, _rec = rtl._rescue_round(scene, cfg, cols, bounce,
                                               refr, seed, rid)
        w = working_count(cols, bounce)
        print(f"rescue {r}: working {w}  ({time.perf_counter()-t0:.2f}s)",
              flush=True)
        if w == 0:
            break


if __name__ == "__main__":
    main()
