"""Config-4 phase timing on chip (honest burst timing per phase).

Times, separately: bounce-0 frame kernel, the global 13-operand packet
sorts, packet_candidates on the live segments, the wave kernel, and one
full packet_bounce round — to aim the next optimization at the real
bottleneck. Run AFTER any bench queue finishes (one TPU job at a time).

Usage: python tools/exp_c4_phases.py [--prims 100000] [--burst 8]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prims", type=int, default=100_000)
    ap.add_argument("--burst", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _materialize, _rtt, build_config4_scene
    import raytracer_js_tpu as rt
    from raytracer_js_tpu import render_tiled as rtl
    from raytracer_js_tpu.config import RayStatus
    from raytracer_js_tpu.kernels import trace_tiled as tt

    scene = build_config4_scene(args.prims)
    cam = rt.make_camera((0.0, 0.0, 0.5), 1920, 1088, np.pi / 2,
                         np.pi / 2 * 1088 / 1920)
    tab, cnts, c_max, grid = rtl.frame_tables(scene, cam)
    print(f"c_max {c_max}", flush=True)

    def timeit(name, fn, *a):
        out = fn(*a)
        _materialize(out)
        rtt = _rtt()
        t0 = time.perf_counter()
        outs = [fn(*a) for _ in range(args.burst)]
        _materialize(outs[-1])
        dt = (time.perf_counter() - t0 - rtt) / args.burst
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)
        return out

    # bounce 0
    b0 = jax.jit(lambda s: tt.frame_bounce0(scene, cam, tab, cnts, c_max))
    st = timeit("bounce0_kernel", b0, scene)

    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")
    hp, wp = np.asarray(st["cr"]).shape
    rows = hp * wp // tt.LANE
    n = hp * wp
    cols = [jnp.asarray(np.asarray(st[k]).reshape(rows, tt.LANE))
            for k in names]
    t_done = jnp.zeros((n,), jnp.float32)
    alive_n = int((np.asarray(st["status"]).reshape(-1)
                   == int(RayStatus.ALIVE)).sum())
    print(f"live after b0: {alive_n} / {n}", flush=True)

    # the global sort pair (isolated)
    def sort_only(cols, t_done):
        flat = [c.reshape(-1) for c in cols]
        org = jnp.stack(flat[0:3], axis=-1)
        dirs = jnp.stack(flat[3:6], axis=-1)
        alive = flat[10] == int(RayStatus.ALIVE)
        key = (rtl._pos_cell(scene, org) * 64
               + rtl._dir_bin(dirs)).astype(jnp.int32)
        key = jnp.where(alive, key, jnp.int32(1 << 30))
        idx = jnp.arange(n, dtype=jnp.int32)
        _, inv, *flat_s = jax.lax.sort((key, idx, *flat, t_done), num_keys=1)
        _, *back = jax.lax.sort((inv, *flat_s), num_keys=1)
        return back[0]

    timeit("sort_pair_13ops", jax.jit(sort_only), cols, t_done)

    # one full round (standard) and one retry-config round (fine Morton
    # binning, escalated-but-capped budget)
    pb = jax.jit(lambda c, t: rtl.packet_bounce(scene, c, 4096, t))
    out_r = timeit("round_standard", pb, cols, t_done)
    pb1 = jax.jit(lambda c, t: rtl.packet_bounce(
        scene, c, rtl.ESC_MAX, t, fine_key=True))
    timeit("round_retry_fine_escmax", pb1, cols, t_done)
    # a retry round as it actually runs: after the standard round, on the
    # carried state (mostly-resolved wavefront)
    cols_r, t_done_r = out_r[0], out_r[1]
    n_alive1 = int((np.asarray(cols_r[10]).reshape(-1)
                    == int(RayStatus.ALIVE)).sum())
    print(f"live after round 1: {n_alive1}", flush=True)
    timeit("round2_retry_on_carried", pb1, cols_r, t_done_r)

    # full frame end to end + diag
    fr = jax.jit(lambda s: rtl.render_frame_tiled(
        scene, rt.RenderConfig(refmax=2), cam, tables=(tab, cnts, c_max),
        with_diag=True))
    img, diag = fr(scene)
    print("unresolved:", int(diag["unresolved"]), flush=True)
    timeit("full_frame", lambda s: fr(s)[0], scene)


if __name__ == "__main__":
    main()
