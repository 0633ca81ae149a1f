"""Split the config-4 round cost: candidate selection vs wave kernel.

Isolates, on one LIVE segment (128 packets = 131k rays) of the post-bounce-0
wavefront, the honest cost of:

* packet_candidates (whole)            — the traced selection
*   .. cone include + t_lo             — the [B, P] test matrix
*   .. argsort [B, P]                  — globally-nearest selection
*   .. everything after the argsort    — gathers, seg sort, layout, pack
* wave_bounce                          — the Pallas kernel on prebuilt tables

Run after any queue finishes (one TPU job at a time):
    python tools/exp_c4_split.py [--prims 100000] [--burst 8]
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
    ap.add_argument("--c-max", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _materialize, _rtt, build_config4_scene
    import raytracer_js_tpu as rt
    from raytracer_js_tpu import render_tiled as rtl
    from raytracer_js_tpu.accel import candidates as cand
    from raytracer_js_tpu.config import RayStatus
    from raytracer_js_tpu.kernels import trace_tiled as tt

    scene = build_config4_scene(args.prims)
    cam = rt.make_camera((0.0, 0.0, 0.5), 1920, 1088, np.pi / 2,
                         np.pi / 2 * 1088 / 1920)
    tab0, cnts0, c_max0, grid0 = rtl.frame_tables(scene, cam)
    st = jax.jit(lambda s: tt.frame_bounce0(
        scene, cam, tab0, cnts0, c_max0))(scene)

    def timeit(name, fn, *a):
        out = fn(*a)
        _materialize(out)
        rtt = _rtt()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(*a) for _ in range(args.burst)]
            _materialize(outs[-1])
            ts.append((time.perf_counter() - t0 - rtt) / args.burst)
        print(f"{name}: {min(ts)*1e3:.1f} ms", flush=True)
        return out

    # sort live rays to the front exactly like packet_bounce, keep the
    # first segment (128 packets)
    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")
    flat = [jnp.asarray(np.asarray(st[k]).reshape(-1)) for k in names]
    org = jnp.stack(flat[0:3], -1)
    dirs = jnp.stack(flat[3:6], -1)
    alive = flat[10] == int(RayStatus.ALIVE)
    keyb = (rtl._pos_cell(scene, org) * 64
            + rtl._dir_bin(dirs)).astype(jnp.int32)
    keyb = jnp.where(alive, keyb, jnp.int32(1 << 30))
    _, *flat_s = jax.lax.sort((keyb, *flat), num_keys=1)
    packet = tt.WAVE_SUB * tt.LANE
    seg_n = 128 * packet
    seg_cols = tuple(np.asarray(f[:seg_n]) for f in flat_s)
    seg_org = jnp.stack([jnp.asarray(seg_cols[i]) for i in range(3)], -1)
    seg_dir = jnp.stack([jnp.asarray(seg_cols[i]) for i in range(3, 6)], -1)
    seg_alive = jnp.asarray(seg_cols[10]) == int(RayStatus.ALIVE)
    n_live = int(np.asarray(seg_alive).sum())
    print(f"segment live rays: {n_live} / {seg_n}", flush=True)
    c_max = args.c_max

    # whole selection
    pc = jax.jit(lambda o, d, a: cand.packet_candidates(
        scene, o, d, a, packet, c_max))
    tab, cnts, t_safe = timeit("packet_candidates", pc, seg_org, seg_dir,
                               seg_alive)

    # cone include + t_lo only
    def cone_only(o, d, a):
        centers, radii = cand.bounding_spheres_jnp(scene)
        o0, ro, axis, cos_t = cand.packet_cones(o, d, a, packet)
        v = centers[None] - o0[:, None]
        dist = jnp.linalg.norm(v, axis=-1)
        rr = radii[None] + ro[:, None]
        inside = dist <= rr * (1.0 + 1e-5) + 1e-7
        sin_a = jnp.clip(rr / jnp.maximum(dist, 1e-20), 0.0, 1.0)
        cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
        cos_b = jnp.einsum("bpk,bk->bp", v, axis,
                           precision=jax.lax.Precision.HIGHEST
                           ) / jnp.maximum(dist, 1e-20)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        include = inside | (cos_b >= cos_a * cos_t[:, None]
                            - sin_a * sin_t[:, None] - 1e-5)
        t_lo = jnp.maximum(dist - radii[None], 0.0)
        return include, t_lo

    inc, tlo = timeit("cone_include_tlo", jax.jit(cone_only),
                      seg_org, seg_dir, seg_alive)

    # argsort of the keyed matrix
    def argsort_only(include, t_lo):
        key = jnp.where(include, t_lo, jnp.float32(1e30))
        return jnp.argsort(key, axis=1)[:, :c_max]

    timeit("argsort_BxP", jax.jit(argsort_only), inc, tlo)

    # the pack row-gather alone: [B*c_max, N_ATTR] rows from the per-prim
    # table at realistic (spatially clustered) indices
    rng = np.random.default_rng(0)
    pid_fake = jnp.asarray(
        rng.integers(0, scene.n_prims, (128 * c_max,)).astype(np.int32))
    tlo_fake = jnp.zeros((128 * c_max,), jnp.float32)
    pk = jax.jit(lambda p, t: cand.pack_candidate_attrs_jnp(scene, p, t))
    timeit("pack_rowgather", pk, pid_fake, tlo_fake)

    # take_along_axis slice of the argsort output (3 operands)
    def takes(include, t_lo, order):
        pid_all = jnp.arange(scene.n_prims, dtype=jnp.int32)
        pid = jnp.take_along_axis(
            jnp.broadcast_to(pid_all[None], include.shape), order, axis=1)
        inc_sel = jnp.take_along_axis(include, order, axis=1)
        tlo_sel = jnp.take_along_axis(t_lo, order, axis=1)
        return pid, inc_sel, tlo_sel

    order = jax.jit(argsort_only)(inc, tlo)
    timeit("take_along_x3", jax.jit(takes), inc, tlo, order)

    # top-k replacement for the argsort (approx_max_k, TPU-optimized)
    def topk_sel(include, t_lo):
        key = jnp.where(include, -t_lo, -jnp.float32(1e30))
        _, idx = jax.lax.approx_max_k(key, c_max)
        return idx

    timeit("approx_topk", jax.jit(topk_sel), inc, tlo)

    # grid (sort-free) selection: whole + pieces
    grid = grid0
    pcg = jax.jit(lambda o, d, a: cand.packet_candidates_grid(
        scene, grid, o, d, a, packet))
    tabg, cntsg, _ts = timeit("grid_packet_candidates", pcg, seg_org,
                              seg_dir, seg_alive)
    print(f"grid rows mean {float(np.asarray(cntsg)[:, :3].sum(1).mean()):.0f}"
          f" c_max {grid.c_max}", flush=True)

    def grid_sel_only(o, d, a):
        o0, ro, axis, cos_t = cand.packet_cones(o, d, a, packet)
        G = grid.centers.shape[0]
        v = grid.centers[None] - o0[:, None]
        cdist = jnp.linalg.norm(v, axis=-1)
        q = jnp.clip(((o0 - grid.lo[None]) * grid.inv_h[None]
                      ).astype(jnp.int32), 0, grid.g - 1)
        c0 = (q[:, 0] * grid.g + q[:, 1]) * grid.g + q[:, 2]
        order = grid.order[c0]
        keep_o = jnp.take_along_axis(cdist < 1e30, order, axis=1)
        b = o0.shape[0]
        cnt_o = jnp.take_along_axis(
            jnp.broadcast_to(grid.cnt_s[None], (b, G)), order, axis=1)
        cum = jnp.cumsum(jnp.where(keep_o, cnt_o, 0.0), axis=1)
        return cum

    cum = timeit("grid_cum_phase", jax.jit(grid_sel_only), seg_org,
                 seg_dir, seg_alive)

    def ss_only(cum):
        budget = grid.budget[0]
        b = cum.shape[0]
        jq = jnp.arange(budget, dtype=jnp.float32)[None]
        return jax.vmap(
            lambda c, q_: jnp.searchsorted(c, q_, side="right"))(
                cum, jnp.broadcast_to(jq, (b, budget)))

    timeit("grid_searchsorted", jax.jit(ss_only), cum)

    # wave kernel on prebuilt tables (rowwise + grid-laid)
    cols2 = [jnp.asarray(c.reshape(-1, tt.LANE)) for c in seg_cols]
    wb = jax.jit(lambda cols, tb, ct: tt.wave_bounce(
        scene, cols, tb, ct, c_max))
    timeit("wave_kernel", wb, cols2, tab, cnts)
    wbg = jax.jit(lambda cols, tb, ct: tt.wave_bounce(
        scene, cols, tb, ct, grid.c_max,
        static_bases=(grid.base[1], grid.base[2])))
    timeit("wave_kernel_grid", wbg, cols2, tabg, cntsg)

    mean_c = float(np.asarray(cnts)[:, :3].sum(1).mean())
    print(f"cand mean/packet: {mean_c:.0f}  c_max {c_max}", flush=True)


if __name__ == "__main__":
    main()
