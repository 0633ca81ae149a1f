"""Pallas fused nearest-hit kernel.

The XLA brute path (ops/trace.nearest_hit_brute) materializes [N, P] hit
matrices in HBM (~400 MB per temp at 1080p x 50 prims — measured 33 ms for
the sphere test alone on a v5e). This kernel fuses intersection + running
min + argmin so only the [N] (t, pid) results leave VMEM.

Layout: a grid over ray blocks; each program holds R rays on *sublanes* and
streams prim tiles of K on *lanes* ([R, K] VPU tiles), keeping the whole
primitive table resident in VMEM as type-major rows (``[4, S]`` spheres,
``[6, B]`` boxes, ``[9, T]`` triangles — 100k prims ≈ 1.6 MB, fits easily).

Semantics are identical to ops/trace.nearest_hit_brute: first-forward param
per primitive (the reference's FORWARD filter, intersection.ts:207-216),
global argmin, pid -1 on miss. The hit search is discrete and runs under
stop_gradient in the trace loop, so the kernel needs no custom VJP — the
differentiable surface recompute (ops/intersect ``*_surface``) stays in XLA.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.scene import Scene

Array = jnp.ndarray

#: rays per program (sublane dim, multiple of 8). Large R amortizes the
#: per-program prim streaming; small R tightens the per-block cone cull
#: (included tiles 395/502/604 at 128/256/512) at the price of a bigger
#: [B, T] selection argsort (83/42/21 ms). The r4 freeze at 512 was
#: measured on the phantom-precision kernel; with the EXACT dots the
#: per-test cost doubled and the cull side of the tradeoff wins: r5
#: kernel+select totals 826/730/672/712 ms at 512/256/128/64
#: (tools/bench_results_r5/exp_c4*.json). Env-tunable for experiments.
BLOCK_R = int(__import__("os").environ.get("RT_NH_BLOCK_R", "128"))
#: primitives per streamed tile (lane dim). 128 = the minimum lane tile:
#: measured on-chip, a 512-lane tile wastes ~90% of VPU lanes on 50-prim
#: scenes (69 ms vs XLA brute's 34 ms); prim-count padding is per 128.
BLOCK_K = 128

_INF = float(np.inf)   # plain python float: a jnp scalar here would be a
                       # captured constant, which pallas_call rejects
#: |dir| floor matching ops/intersect.SLAB_DIR_EPS
_SLAB_EPS = 1e-12
_MT_EPS = 1e-9


def _first_forward(t_near, t_far, valid):
    t = jnp.where(t_near >= 0.0, t_near, jnp.where(t_far >= 0.0, t_far, _INF))
    return jnp.where(valid, t, _INF)


def _update(best, t_mat, lane, k0, gid_base):
    """Fold an [R, K] hit matrix into the LANE-RESIDENT running min.

    State is (t, pid) per (ray, lane): one compare + two selects per tile
    instead of the per-tile cross-lane min+argmin (two 7-step lane
    reductions — r5 measured them costing about as much as the
    intersection math itself). The single cross-lane reduce happens once
    per block in :func:`_finalize` (and once per CHUNK_T tiles for the
    early-exit horizon).
    """
    t_lane, pid_lane = best
    upd = t_mat < t_lane
    t_lane = jnp.where(upd, t_mat, t_lane)
    pid_lane = jnp.where(upd, lane + (k0 + gid_base), pid_lane)
    return t_lane, pid_lane


def _finalize(best):
    """Cross-lane reduce of the lane-resident state -> [R, 1] (t, pid).

    Ties across lanes resolve to the LOWEST pid (brute argmin semantics);
    within a lane the earliest-streamed tile wins (strict ``<`` in
    :func:`_update`)."""
    t_lane, pid_lane = best
    t_best = jnp.min(t_lane, axis=1, keepdims=True)
    pid_best = jnp.min(jnp.where(t_lane <= t_best, pid_lane,
                                 jnp.int32(2147483647)),
                       axis=1, keepdims=True)
    return t_best, pid_best


def _nearest_hit_kernel(nl_ref, org_ref, dir_ref, sph_ref, box_ref,
                        tri_ref, t_ref, pid_ref, *, n_sph, n_box, n_tri,
                        n_rays):
    i = pl.program_id(0)
    r0 = t_ref.shape[0]

    # LIVE-PREFIX BLOCK SKIP: callers that compact live rays to the front
    # pass n_live; whole blocks past the live prefix cost one predicate
    # (the rescue path's cost then scales with the straggler count, not
    # with its static capacity)
    @pl.when(i * r0 >= nl_ref[0, 0])
    def _dead_block():
        t_ref[:, :] = jnp.full(t_ref.shape, _INF, jnp.float32)
        pid_ref[:, :] = jnp.full(pid_ref.shape, -1, jnp.int32)

    @pl.when(i * r0 < nl_ref[0, 0])
    def _live_block():
        _nearest_hit_block(i, org_ref, dir_ref, sph_ref, box_ref, tri_ref,
                           t_ref, pid_ref, n_sph=n_sph, n_box=n_box,
                           n_tri=n_tri, n_rays=n_rays)


def _nearest_hit_kernel_culled(nl_ref, tb_ref, org_ref, dir_ref, sph_ref,
                               box_ref, tri_ref, t_ref, pid_ref, *, n_sph,
                               n_box, n_tri, n_rays):
    i = pl.program_id(0)
    r0 = t_ref.shape[0]

    @pl.when(i * r0 >= nl_ref[0, 0])
    def _dead_block():
        t_ref[:, :] = jnp.full(t_ref.shape, _INF, jnp.float32)
        pid_ref[:, :] = jnp.full(pid_ref.shape, -1, jnp.int32)

    @pl.when(i * r0 < nl_ref[0, 0])
    def _live_block():
        _nearest_hit_block(i, org_ref, dir_ref, sph_ref, box_ref, tri_ref,
                           t_ref, pid_ref, n_sph=n_sph, n_box=n_box,
                           n_tri=n_tri, n_rays=n_rays, tb_ref=tb_ref,
                           nl_ref=nl_ref)


#: listed-kernel chunk: tiles streamed between early-exit checks (the
#: per-chunk scalar branch amortizes to 1/CHUNK_T per tile — a per-tile
#: cond chain was the r3 SWEEP_CULL failure mode). r5 re-sweep on the
#: exact kernel at BLOCK_R=128: kernel 672/595/558/551 ms at chunk
#: 4/8/16/32 — the while-loop's serial cond+reduce latency dominates at
#: small chunks; 16 takes 99% of the plateau. Env-tunable.
CHUNK_T = int(__import__("os").environ.get("RT_NH_CHUNK_T", "16"))

#: rays per PROGRAM in the listed variant (tile selection stays at
#: BLOCK_R granularity — see _nearest_hit_kernel_listed). Smaller
#: sub-blocks exit the near-to-far stream on tighter horizons, but r5
#: measured per-program overhead swamping the gain at the config-4 shape
#: (kernel ms: 426 @512, 445 @128, 544 @64, 742 @32 — exp_c4.jsonl), so
#: the frozen default keeps one program per selection block. The
#: mechanism stays for narrower-population callers (tools/exp_r5_c4.py).
SUB_R = int(__import__("os").environ.get("RT_NH_SUB_R", "512"))

#: contiguous 128-sphere tiles per dense HIGHEST dot pair (the sphere
#: table is padded+poisoned to this granularity); amortizes the 6-pass
#: exact-dot setup that costs ~2x at per-tile granularity.
DENSE_SPAN = 4


def _nearest_hit_kernel_listed(nl_ref, bbox_ref, *refs, n_sph, n_box,
                               n_tri, n_rays, sph_listed, tri_listed,
                               sph_fan=1, tri_fan=1, rpl=1):
    # refs layout: [ids_s, tlo_s]? + [ids_t, tlo_t]? + org, dir, sph, box,
    # tri, t_out, pid_out — presence of the list pairs is static
    k = 0
    ids_ref = tlo_ref = ids_t_ref = tlo_t_ref = None
    if sph_listed:
        ids_ref, tlo_ref = refs[k], refs[k + 1]
        k += 2
    if tri_listed:
        ids_t_ref, tlo_t_ref = refs[k], refs[k + 1]
        k += 2
    org_ref, dir_ref, sph_ref, box_ref, tri_ref, t_ref, pid_ref = refs[k:]
    i = pl.program_id(0)
    r0 = t_ref.shape[0]
    # SUB-BLOCK grid (r5): tile selection stays at BLOCK_R-ray
    # granularity (its argsort cost scales with block count) but each
    # program runs only SUB_R rays against the parent's sorted list, so
    # the near-to-far early exit fires on the sub-block's own tighter
    # horizon — ``rpl`` = BLOCK_R // SUB_R programs share one list row.
    # ids/tlo ride 8-row SMEM windows (Mosaic requires block sublane dims
    # divisible by 8); this program's row within its window:
    ids_row = (i // rpl) % 8

    @pl.when(i * r0 >= nl_ref[0, 0])
    def _dead_block():
        t_ref[:, :] = jnp.full(t_ref.shape, _INF, jnp.float32)
        pid_ref[:, :] = jnp.full(pid_ref.shape, -1, jnp.int32)

    @pl.when(i * r0 < nl_ref[0, 0])
    def _live_block():
        _nearest_hit_block(i, org_ref, dir_ref, sph_ref, box_ref, tri_ref,
                           t_ref, pid_ref, n_sph=n_sph, n_box=n_box,
                           n_tri=n_tri, n_rays=n_rays, ids_ref=ids_ref,
                           tlo_ref=tlo_ref, ids_t_ref=ids_t_ref,
                           tlo_t_ref=tlo_t_ref, bbox_ref=bbox_ref,
                           ids_row=ids_row, sph_fan=sph_fan,
                           tri_fan=tri_fan)


def _nearest_hit_block(i, org_ref, dir_ref, sph_ref, box_ref, tri_ref,
                       t_ref, pid_ref, *, n_sph, n_box, n_tri, n_rays,
                       tb_ref=None, nl_ref=None, ids_ref=None,
                       tlo_ref=None, ids_t_ref=None, tlo_t_ref=None,
                       bbox_ref=None, ids_row=0, sph_fan=1, tri_fan=1):
    ox = org_ref[:, 0:1]
    oy = org_ref[:, 1:2]
    oz = org_ref[:, 2:3]
    dx = dir_ref[:, 0:1]
    dy = dir_ref[:, 1:2]
    dz = dir_ref[:, 2:3]
    r_blk = ox.shape[0]

    a = dx * dx + dy * dy + dz * dz                          # [R, 1]
    inv_a = 1.0 / a
    # safe reciprocal direction for the slab test
    def safe_inv(d):
        tiny = jnp.abs(d) < _SLAB_EPS
        d_safe = jnp.where(tiny, jnp.where(d < 0, -_SLAB_EPS, _SLAB_EPS), d)
        return 1.0 / d_safe

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    lane = jax.lax.broadcasted_iota(jnp.int32, (r_blk, BLOCK_K), 1)

    # lane-resident running min (see _update/_finalize)
    t_best = jnp.full((r_blk, BLOCK_K), _INF, jnp.float32)
    pid_best = jnp.zeros((r_blk, BLOCK_K), jnp.int32)
    best = (t_best, pid_best)

    # ---- spheres: rows cx, cy, cz, (c.c - r^2) --------------------------
    # The o.c / d.c cross terms ride the MXU as [R,3]x[3,K] contractions
    # (the same factoring ops/intersect.sphere_hit_t uses in XLA); only
    # ~10 elementwise ops remain on the VPU per tile.
    o3 = org_ref[:, 0:3]
    d3 = dir_ref[:, 0:3]
    do3 = jnp.concatenate([d3, o3], axis=0)                  # [2R, 3]
    o_dot_o = ox * ox + oy * oy + oz * oz                    # [R, 1]
    o_dot_d = ox * dx + oy * dy + oz * dz

    if tb_ref is not None:
        # block bounding cone (callers pre-sort rays into coherent blocks
        # and pass Morton-tight per-tile bounds): apex ball (o0, ro) over
        # the block origins, axis = mean direction, cos_t = worst
        # alignment — the same conservative identity as
        # accel/candidates.cone_include_np, evaluated per 128-prim tile
        # as a scalar predicate that skips the whole tile. Rows past the
        # live prefix (n_live straddling this block, or rays padded past
        # n_rays) are EXCLUDED from the statistics — a single dead row's
        # padded direction would collapse cos_t and silently disable the
        # cull for every partial tail block.
        row = jax.lax.broadcasted_iota(jnp.int32, (r_blk, 1), 0) + i * r_blk
        lim = n_rays if nl_ref is None else jnp.minimum(nl_ref[0, 0], n_rays)
        lv = row < lim                                       # [R, 1] bool
        lvf = lv.astype(jnp.float32)
        r_inv = 1.0 / jnp.maximum(jnp.sum(lvf), 1.0)
        o0x = jnp.sum(ox * lvf) * r_inv
        o0y = jnp.sum(oy * lvf) * r_inv
        o0z = jnp.sum(oz * lvf) * r_inv
        ro = jnp.sqrt(jnp.max(((ox - o0x) ** 2 + (oy - o0y) ** 2
                               + (oz - o0z) ** 2) * lvf))
        axm = jnp.sum(dx * lvf) * r_inv
        aym = jnp.sum(dy * lvf) * r_inv
        azm = jnp.sum(dz * lvf) * r_inv
        a_n = 1.0 / jnp.sqrt(jnp.maximum(
            axm * axm + aym * aym + azm * azm, 1e-20))
        axm, aym, azm = axm * a_n, aym * a_n, azm * a_n
        d_inv = 1.0 / jnp.sqrt(a)
        cos_t = jnp.min(jnp.where(
            lv, (dx * axm + dy * aym + dz * azm) * d_inv, 1.0))
        use_cone = cos_t >= 0.25
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))

    def _sphere_eval(cT, ccmr):
        """t matrix [R, L] for an [3, L]/[1, L] sphere slab (L = any
        multiple of BLOCK_K).

        HIGHEST on the o.c / d.c dots is CORRECTNESS, not style:
        default-precision dots bf16-round o/d/c, and the factored
        c = o.o - 2 o.c + (c.c - r^2) then flips near-miss discriminants
        positive (r5 probe: disc -0.124 -> +0.048 on a 600-sphere scene =
        phantom hits at ~25% of miss rays). HIGHEST's 6 bf16 passes cost
        ~2x on per-tile dots (426 -> 811 ms at the config-4 shape), so
        callers batch L = CHUNK_T (or fan) tiles per dot pair to amortize
        the pass setup.

        NaN-POISON validity: sqrt(disc < 0) = NaN propagates through the
        select chain (every NaN compare is false), so misses fold to INF
        without an explicit disc>=0 mask. Padded lanes carry ccmr = +inf
        (poisoned in nearest_hit_pallas) -> disc = -inf -> NaN -> INF, so
        no lane-bound mask either. t_near >= 0 implies t_far >= 0, so one
        forwardness test on t_far suffices.
        """
        # one stacked [2R, 3] x [3, L] contraction computes BOTH dot
        # planes per pass — halves the 6-pass HIGHEST setup count again
        dots = jnp.dot(do3, cT, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        r_blk_ = d3.shape[0]
        d_dot_c = jax.lax.slice_in_dim(dots, 0, r_blk_, axis=0)
        o_dot_c = jax.lax.slice_in_dim(dots, r_blk_, 2 * r_blk_, axis=0)
        b_half = o_dot_d - d_dot_c                           # [R, L]
        c = o_dot_o - 2.0 * o_dot_c + ccmr
        disc = b_half * b_half - a * c
        sq = jnp.sqrt(disc)
        u = (d_dot_c - o_dot_d) * inv_a                      # -b_half/a
        s = sq * inv_a
        t_sel = jnp.where(u - s >= 0.0, u - s, u + s)
        return jnp.where(u + s >= 0.0, t_sel, _INF)

    def sphere_run(k0, n_t, best):
        """n_t CONTIGUOUS 128-sphere tiles from lane k0: one slice, one
        HIGHEST dot pair, n_t elementwise folds."""
        sl = pl.ds(k0, n_t * BLOCK_K)
        t_mat = _sphere_eval(sph_ref[0:3, sl], sph_ref[3:4, sl])
        for i in range(n_t):
            seg = jax.lax.slice_in_dim(t_mat, i * BLOCK_K,
                                       (i + 1) * BLOCK_K, axis=1)
            best = _update(best, seg, lane, k0 + i * BLOCK_K, 0)
        return best

    def sphere_scatter(bases, best):
        """Non-contiguous 128-sphere tiles (listed fan=1 chunks): concat
        the slices so the HIGHEST dot pair runs once for the chunk."""
        cT = jnp.concatenate(
            [sph_ref[0:3, pl.ds(b, BLOCK_K)] for b in bases], axis=1)
        ccmr = jnp.concatenate(
            [sph_ref[3:4, pl.ds(b, BLOCK_K)] for b in bases], axis=1)
        t_mat = _sphere_eval(cT, ccmr)
        for i, b in enumerate(bases):
            seg = jax.lax.slice_in_dim(t_mat, i * BLOCK_K,
                                       (i + 1) * BLOCK_K, axis=1)
            best = _update(best, seg, lane, b, 0)
        return best

    def sphere_math(k0, best):
        # k0 may be a TRACED tile offset (listed variant): pl.ds dynamic
        # block slices on the lane dim are supported; only per-lane
        # gathers are not
        return sphere_run(k0, 1, best)

    def sphere_tile_body(k, best):
        return sphere_run(k * (BLOCK_K * DENSE_SPAN), DENSE_SPAN, best)

    if (ids_ref is not None) or (ids_t_ref is not None):
        # LISTED variant with NEAR-TO-FAR EARLY EXIT: stream the tiles the
        # XLA-side block cone selected (render_tiled._block_tile_select),
        # sorted ascending by their conservative entry distance t_lo, and
        # stop as soon as every ray's capped best-hit precedes the next
        # tile: t_lo(tile) lower-bounds any block ray's hit against the
        # tile's prims (apex-ball inflation), and each ray's exit bound is
        # min(t_best, scene-bbox exit) — the bbox cap is what lets blocks
        # containing MISS rays (t_best = inf) terminate (the r3 bounce-0
        # lesson). Excluded/past-the-end slots carry t_lo = +inf, so the
        # count is implicit. CHUNK_T tiles run unconditioned between
        # checks (a per-tile cond chain stalls Mosaic streaming).
        lo_x, lo_y, lo_z = bbox_ref[0, 0], bbox_ref[0, 1], bbox_ref[0, 2]
        hi_x, hi_y, hi_z = bbox_ref[0, 3], bbox_ref[0, 4], bbox_ref[0, 5]

        def exit_axis(o, inv, lo, hi):
            ta = (lo - o) * inv
            tb = (hi - o) * inv
            return jnp.maximum(ta, tb)

        t_exit = jnp.minimum(
            jnp.minimum(exit_axis(ox, ix, lo_x, hi_x),
                        exit_axis(oy, iy, lo_y, hi_y)),
            exit_axis(oz, iz, lo_z, hi_z))                   # [R, 1]
        t_cap = jnp.maximum(t_exit, 0.0) * (1.0 + 1e-4) + 1e-3

        def listed_scan(ids_r, tlo_r, chunk_fn, best):
            # ``chunk_fn(j, best)`` folds the CHUNK_T (super)tiles at list
            # position j; supertile fans (ids index ``fan`` consecutive
            # 128-prim tiles, granularity chosen so the id table fits its
            # SMEM window at any prim count — render_tiled._sweep_perm)
            # expand statically inside it, so streaming stays cond-free
            # between the per-chunk exit checks
            t_pad = tlo_r.shape[1]

            def chunk_cond(carry):
                j, t_best, _pid = carry
                # per-ray horizon = min over lanes of the lane-resident
                # min, capped at the ray's bbox exit; stream while any
                # ray's horizon still reaches the next tile
                t_hi = jnp.max(jnp.min(jnp.minimum(t_best, t_cap),
                                       axis=1))
                return (j < t_pad) & (tlo_r[ids_row, j] <= t_hi)

            def chunk_body(carry):
                j, t_best, pid_best = carry
                b = chunk_fn(j, (t_best, pid_best))
                return j + CHUNK_T, b[0], b[1]

            _, t_best, pid_best = jax.lax.while_loop(
                chunk_cond, chunk_body, (jnp.int32(0), best[0], best[1]))
            return (t_best, pid_best)
    else:
        listed_scan = None

    if ids_ref is not None:
        if sph_fan > 1:
            # supertiles are contiguous fan*128 spans: one dot pair each
            def sph_chunk(j, b):
                for k in range(CHUNK_T):
                    base = ids_ref[ids_row, j + k] * (BLOCK_K * sph_fan)
                    b = sphere_run(base, sph_fan, b)
                return b
        else:
            # scattered 128-tiles: concat the chunk so the dot pair runs
            # once per CHUNK_T tiles
            def sph_chunk(j, b):
                bases = [ids_ref[ids_row, j + k] * BLOCK_K
                         for k in range(CHUNK_T)]
                return sphere_scatter(bases, b)

        best = listed_scan(ids_ref, tlo_ref, sph_chunk, best)
    elif tb_ref is None:
        best = jax.lax.fori_loop(0, pl.cdiv(n_sph, BLOCK_K * DENSE_SPAN),
                                 sphere_tile_body, best)
    else:
        def sphere_tile(k, best):
            vx = tb_ref[k, 0] - o0x
            vy = tb_ref[k, 1] - o0y
            vz = tb_ref[k, 2] - o0z
            dist = jnp.sqrt(vx * vx + vy * vy + vz * vz)
            rr = tb_ref[k, 3] + ro
            inside = dist <= rr * (1.0 + 1e-5) + 1e-7
            sin_a = jnp.minimum(rr / jnp.maximum(dist, 1e-20), 1.0)
            cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
            cos_b = (vx * axm + vy * aym + vz * azm) / jnp.maximum(
                dist, 1e-20)
            include = (inside
                       | (cos_b >= cos_a * cos_t - sin_a * sin_t - 1e-5)
                       | ~use_cone)
            return jax.lax.cond(include,
                                lambda b: sphere_run(k * BLOCK_K, 1, b),
                                lambda b: b, best)

        best = jax.lax.fori_loop(0, pl.cdiv(n_sph, BLOCK_K), sphere_tile,
                                 best)

    # ---- boxes: rows cx, cy, cz, hx, hy, hz -----------------------------
    def box_tile(k, best):
        k0 = k * BLOCK_K
        sl = pl.ds(k0, BLOCK_K)
        cx = box_ref[0:1, sl]
        cy = box_ref[1:2, sl]
        cz = box_ref[2:3, sl]
        hx = box_ref[3:4, sl]
        hy = box_ref[4:5, sl]
        hz = box_ref[5:6, sl]

        def axis_slab(o, inv, c, h):
            ta = (c - h - o) * inv
            tb = (c + h - o) * inv
            return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

        t0x, t1x = axis_slab(ox, ix, cx, hx)
        t0y, t1y = axis_slab(oy, iy, cy, hy)
        t0z, t1z = axis_slab(oz, iz, cz, hz)
        t_enter = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
        t_exit = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
        valid = (t_enter <= t_exit) & (lane + k0 < n_box)
        return _update(best, _first_forward(t_enter, t_exit, valid),
                       lane, k0, n_sph)

    best = jax.lax.fori_loop(0, pl.cdiv(n_box, BLOCK_K), box_tile, best)

    # ---- triangles: rows v0x..v0z, v1x..v1z, v2x..v2z -------------------
    def tri_math(k0, best):
        sl = pl.ds(k0, BLOCK_K)
        v0x, v0y, v0z = tri_ref[0:1, sl], tri_ref[1:2, sl], tri_ref[2:3, sl]
        v1x, v1y, v1z = tri_ref[3:4, sl], tri_ref[4:5, sl], tri_ref[5:6, sl]
        v2x, v2y, v2z = tri_ref[6:7, sl], tri_ref[7:8, sl], tri_ref[8:9, sl]
        e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
        e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
        # p = dir x e2
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < _MT_EPS, _MT_EPS, det)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = (sx * px + sy * py + sz * pz) * inv_det
        # q = s x e1
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        # padded lanes are all-zero vertices -> det = 0 -> invalid, so no
        # lane-bound mask is needed
        valid = ((jnp.abs(det) >= _MT_EPS) & (u >= 0.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (t >= 0.0))
        return _update(best, jnp.where(valid, t, _INF), lane, k0,
                       n_sph + n_box)

    if ids_t_ref is not None:
        # Moeller-Trumbore is fully elementwise (no dots to amortize), so
        # the tri chunk handler just expands tiles statically
        def tri_chunk(j, b):
            for k in range(CHUNK_T):
                base = ids_t_ref[ids_row, j + k] * (BLOCK_K * tri_fan)
                for f in range(tri_fan):
                    b = tri_math(base + f * BLOCK_K, b)
            return b

        best = listed_scan(ids_t_ref, tlo_t_ref, tri_chunk, best)
    else:
        best = jax.lax.fori_loop(0, pl.cdiv(n_tri, BLOCK_K),
                                 lambda k, b: tri_math(k * BLOCK_K, b),
                                 best)

    t_best, pid_best = _finalize(best)
    # mask rows past the wavefront tail (padded rays)
    row = jax.lax.broadcasted_iota(jnp.int32, (r_blk, 1), 0) + i * r_blk
    live = row < n_rays
    t_ref[:, :] = jnp.where(live, t_best, _INF)
    pid_ref[:, :] = jnp.where(live & (t_best < _INF), pid_best, -1)


def _pack_rows(*arrs, rows: int, pad_to: int) -> np.ndarray | Array:
    """Stack 1-D prim columns into a [rows, pad_to] row-major table."""
    out = jnp.zeros((rows, pad_to), jnp.float32)
    for r, a in enumerate(arrs):
        if a.shape[0]:
            out = out.at[r, : a.shape[0]].set(a.astype(jnp.float32))
    return out


@functools.partial(jax.jit, static_argnames=("meta", "sph_listed",
                                             "tri_listed", "sph_fan",
                                             "tri_fan", "interpret"))
def _nearest_hit_call_listed(nl, bbox, lists, org, dir, sph, box, tri,
                             meta, sph_listed, tri_listed,
                             sph_fan=1, tri_fan=1, interpret=False):
    n_sph, n_box, n_tri, n_rays = meta
    n_pad = org.shape[0]
    sub_r = min(SUB_R, BLOCK_R)
    assert BLOCK_R % sub_r == 0, (BLOCK_R, sub_r)
    rpl = BLOCK_R // sub_r
    grid = (n_pad // sub_r,)
    kern = functools.partial(_nearest_hit_kernel_listed, n_sph=n_sph,
                             n_box=n_box, n_tri=n_tri, n_rays=n_rays,
                             sph_listed=sph_listed, tri_listed=tri_listed,
                             sph_fan=sph_fan, tri_fan=tri_fan, rpl=rpl)
    list_specs = [
        pl.BlockSpec((8, a.shape[1]),
                     lambda i, rpl=rpl: (i // (8 * rpl), 0),
                     memory_space=pltpu.SMEM)
        for a in lists
    ]
    t, pid = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(nl.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(bbox.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *list_specs,
            pl.BlockSpec((sub_r, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_r, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sph.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(box.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sub_r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sub_r, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        # the resident prim table alone is 16 MB at 1M spheres ([4, 1M]
        # f32) — past Mosaic's default 16 MB scoped-VMEM limit (physical
        # VMEM is far larger); same raise as trace_tiled._wave_call
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nl, bbox, *lists, org, dir, sph, box, tri)
    return t[:, 0], pid[:, 0]


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _nearest_hit_call(nl, org, dir, sph, box, tri, meta, interpret=False):
    n_sph, n_box, n_tri, n_rays = meta
    n_pad = org.shape[0]
    grid = (n_pad // BLOCK_R,)
    kern = functools.partial(_nearest_hit_kernel, n_sph=n_sph, n_box=n_box,
                             n_tri=n_tri, n_rays=n_rays)
    t, pid = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(nl.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sph.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(box.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        # the resident prim table alone is 16 MB at 1M spheres ([4, 1M]
        # f32) — past Mosaic's default 16 MB scoped-VMEM limit (physical
        # VMEM is far larger); same raise as trace_tiled._wave_call
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nl, org, dir, sph, box, tri)
    return t[:, 0], pid[:, 0]


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _nearest_hit_call_culled(nl, tb, org, dir, sph, box, tri, meta,
                             interpret=False):
    n_sph, n_box, n_tri, n_rays = meta
    n_pad = org.shape[0]
    grid = (n_pad // BLOCK_R,)
    kern = functools.partial(_nearest_hit_kernel_culled, n_sph=n_sph,
                             n_box=n_box, n_tri=n_tri, n_rays=n_rays)
    t, pid = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(nl.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tb.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sph.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(box.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        # the resident prim table alone is 16 MB at 1M spheres ([4, 1M]
        # f32) — past Mosaic's default 16 MB scoped-VMEM limit (physical
        # VMEM is far larger); same raise as trace_tiled._wave_call
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nl, tb, org, dir, sph, box, tri)
    return t[:, 0], pid[:, 0]


# ---------------------------------------------------------------------------
# Scalar-prim broadcast variant
# ---------------------------------------------------------------------------
#
# The tile kernel above pays the 128-lane floor per primitive tile — a
# 50-prim scene wastes ~60% of VPU lanes and a 2-box scene wastes ~98% of a
# tile. This variant fills BOTH sublanes and lanes with rays ([256, 128] ray
# tiles) and streams primitives one at a time as lane-replicated [1, 128]
# row broadcasts (dynamic *sublane* indexing — Mosaic cannot index lanes
# dynamically), so per-ray work is proportional to the true primitive
# count. Right regime: P up to a few hundred; beyond that tiling/culling
# wins and the table replication (P x 128 per attribute) stops being free.

#: ray tile: sublanes x lanes; 256x128 = 32k rays per program
SP_SUB = 256
SP_LANE = 128


def _row(ref, base, p):
    """Lane-replicated [1, 128] attribute row of prim ``p`` (attr block
    ``base`` rows into the packed table)."""
    return ref[pl.ds(base + p, 1), :]


def _nh_scalar_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                      sph_ref, box_ref, tri_ref, t_ref, pid_ref,
                      *, n_sph, n_box, n_tri, s_pad, b_pad, r_pad):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    o_dot_d = ox * dx + oy * dy + oz * dz
    o_dot_o = ox * ox + oy * oy + oz * oz

    def safe_inv(d):
        tiny = jnp.abs(d) < _SLAB_EPS
        d_safe = jnp.where(tiny, jnp.where(d < 0, -_SLAB_EPS, _SLAB_EPS), d)
        return 1.0 / d_safe

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    t_best = jnp.full(ox.shape, _INF, jnp.float32)
    pid_best = jnp.full(ox.shape, -1, jnp.int32)

    def sph_body(p, carry):
        t_best, pid = carry
        cx = _row(sph_ref, 0, p)
        cy = _row(sph_ref, s_pad, p)
        cz = _row(sph_ref, 2 * s_pad, p)
        ccmr = _row(sph_ref, 3 * s_pad, p)
        b_half = o_dot_d - (dx * cx + dy * cy + dz * cz)
        c = o_dot_o - 2.0 * (ox * cx + oy * cy + oz * cz) + ccmr
        disc = b_half * b_half - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = (-b_half - sq) * inv_a
        t_far = (-b_half + sq) * inv_a
        t = jnp.where(t_near >= 0.0, t_near,
                      jnp.where(t_far >= 0.0, t_far, _INF))
        t = jnp.where(disc >= 0.0, t, _INF)
        upd = t < t_best
        return (jnp.where(upd, t, t_best),
                jnp.where(upd, p, pid))

    t_best, pid_best = jax.lax.fori_loop(0, n_sph, sph_body,
                                         (t_best, pid_best))

    def box_body(p, carry):
        t_best, pid = carry
        cx = _row(box_ref, 0, p)
        cy = _row(box_ref, b_pad, p)
        cz = _row(box_ref, 2 * b_pad, p)
        hx = _row(box_ref, 3 * b_pad, p)
        hy = _row(box_ref, 4 * b_pad, p)
        hz = _row(box_ref, 5 * b_pad, p)
        tax = (cx - hx - ox) * ix
        tbx = (cx + hx - ox) * ix
        tay = (cy - hy - oy) * iy
        tby = (cy + hy - oy) * iy
        taz = (cz - hz - oz) * iz
        tbz = (cz + hz - oz) * iz
        t_enter = jnp.maximum(jnp.maximum(jnp.minimum(tax, tbx),
                                          jnp.minimum(tay, tby)),
                              jnp.minimum(taz, tbz))
        t_exit = jnp.minimum(jnp.minimum(jnp.maximum(tax, tbx),
                                         jnp.maximum(tay, tby)),
                             jnp.maximum(taz, tbz))
        t = jnp.where(t_enter >= 0.0, t_enter,
                      jnp.where(t_exit >= 0.0, t_exit, _INF))
        t = jnp.where(t_enter <= t_exit, t, _INF)
        upd = t < t_best
        return (jnp.where(upd, t, t_best),
                jnp.where(upd, p + n_sph, pid))

    t_best, pid_best = jax.lax.fori_loop(0, n_box, box_body,
                                         (t_best, pid_best))

    def tri_body(p, carry):
        t_best, pid = carry
        v0x = _row(tri_ref, 0, p)
        v0y = _row(tri_ref, r_pad, p)
        v0z = _row(tri_ref, 2 * r_pad, p)
        e1x = _row(tri_ref, 3 * r_pad, p) - v0x
        e1y = _row(tri_ref, 4 * r_pad, p) - v0y
        e1z = _row(tri_ref, 5 * r_pad, p) - v0z
        e2x = _row(tri_ref, 6 * r_pad, p) - v0x
        e2y = _row(tri_ref, 7 * r_pad, p) - v0y
        e2z = _row(tri_ref, 8 * r_pad, p) - v0z
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < _MT_EPS, _MT_EPS, det)
        sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
        u = (sx * px + sy * py + sz * pz) * inv_det
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ((jnp.abs(det) >= _MT_EPS) & (u >= 0.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t >= 0.0))
        t = jnp.where(ok, t, _INF)
        upd = t < t_best
        return (jnp.where(upd, t, t_best),
                jnp.where(upd, p + n_sph + n_box, pid))

    t_best, pid_best = jax.lax.fori_loop(0, n_tri, tri_body,
                                         (t_best, pid_best))

    t_ref[:, :] = t_best
    pid_ref[:, :] = jnp.where(t_best < _INF, pid_best, -1)


def pack_replicated(cols, pad_to: int) -> Array:
    """Stack 1-D prim columns into [n_cols * pad_to, 128], each value
    replicated across lanes (the broadcastable row layout)."""
    n_cols = len(cols)
    out = jnp.zeros((n_cols * pad_to, SP_LANE), jnp.float32)
    for i, c in enumerate(cols):
        if c.shape[0]:
            rep = jnp.broadcast_to(c.astype(jnp.float32)[:, None],
                                   (c.shape[0], SP_LANE))
            out = jax.lax.dynamic_update_slice(out, rep, (i * pad_to, 0))
    return out


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _nh_scalar_call(cols, sph, box, tri, meta, interpret=False):
    n_sph, n_box, n_tri, s_pad, b_pad, r_pad = meta
    rows = cols[0].shape[0]
    grid = (rows // SP_SUB,)
    kern = functools.partial(_nh_scalar_kernel, n_sph=n_sph, n_box=n_box,
                             n_tri=n_tri, s_pad=s_pad, b_pad=b_pad,
                             r_pad=r_pad)
    ray_spec = pl.BlockSpec((SP_SUB, SP_LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, pid = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[ray_spec] * 6 + [
            pl.BlockSpec(sph.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(box.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tri.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[ray_spec, ray_spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, SP_LANE), jnp.float32),
            jax.ShapeDtypeStruct((rows, SP_LANE), jnp.int32),
        ],
        interpret=interpret,
    )(*cols, sph, box, tri)
    return t, pid


def _ray_cols(org: Array, dir: Array, n_pad: int):
    n = org.shape[0]

    def col(x, fill):
        c = jnp.pad(x, (0, n_pad - n), constant_values=fill)
        return c.reshape(n_pad // SP_LANE, SP_LANE)

    return (col(org[:, 0], 0.0), col(org[:, 1], 0.0), col(org[:, 2], 0.0),
            col(dir[:, 0], 1.0), col(dir[:, 1], 1.0), col(dir[:, 2], 1.0))


def nearest_hit_pallas_scalar(scene: Scene, org: Array, dir: Array,
                              interpret: bool | None = None
                              ) -> Tuple[Array, Array]:
    """Scalar-prim-broadcast nearest hit; same contract as the tile kernel."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    quant = SP_SUB * SP_LANE
    n_pad = -(-n // quant) * quant
    cols = _ray_cols(org, dir, n_pad)

    def pad8(x):
        return -(-max(x, 1) // 8) * 8

    s_pad, b_pad, r_pad = (pad8(scene.n_spheres), pad8(scene.n_boxes),
                           pad8(scene.n_tris))
    c_dot_c = jnp.sum(scene.sphere_center ** 2, axis=-1)
    sph = pack_replicated([scene.sphere_center[:, 0], scene.sphere_center[:, 1],
                           scene.sphere_center[:, 2],
                           c_dot_c - scene.sphere_radius ** 2], s_pad)
    box = pack_replicated([scene.box_center[:, 0], scene.box_center[:, 1],
                           scene.box_center[:, 2], scene.box_half[:, 0],
                           scene.box_half[:, 1], scene.box_half[:, 2]], b_pad)
    tri = pack_replicated([scene.tri_v0[:, 0], scene.tri_v0[:, 1],
                           scene.tri_v0[:, 2],
                           scene.tri_v1[:, 0], scene.tri_v1[:, 1],
                           scene.tri_v1[:, 2],
                           scene.tri_v2[:, 0], scene.tri_v2[:, 1],
                           scene.tri_v2[:, 2]], r_pad)
    meta = (scene.n_spheres, scene.n_boxes, scene.n_tris,
            s_pad, b_pad, r_pad)
    t, pid = _nh_scalar_call(cols, sph, box, tri, meta, interpret=interpret)
    return t.reshape(-1)[:n], pid.reshape(-1)[:n]


def nearest_hit_pallas(scene: Scene, org: Array, dir: Array,
                       interpret: bool | None = None,
                       n_live: Array | None = None,
                       tile_bounds: Array | None = None,
                       tile_ids=None, tri_tile_ids=None,
                       sph_fan: int = 1, tri_fan: int = 1
                       ) -> Tuple[Array, Array]:
    """Drop-in for ops/trace.nearest_hit_brute -> (t [N], pid [N]).

    ``interpret`` defaults to True off-TPU so the same code path is testable
    on the CPU mesh (pallas interpret mode). ``n_live`` (traced scalar)
    declares that only the first n_live rays matter — whole ray BLOCKS past
    it are skipped in-kernel (callers compact live rays to the front).
    NOTE: only fully-dead blocks report miss; a block straddling n_live
    computes real results for its rows past n_live, so callers must mask
    rows >= n_live themselves (as render_tiled._rescue_round does via its
    ``working`` mask).

    ``tile_ids = (ids [B, T] i32, tlo [B, T] f32)`` switches the SPHERE
    scan to the LISTED variant with near-to-far early exit: ray block b
    streams its selected 128-sphere tiles ``ids[b]`` in ascending
    ``tlo[b]`` order (XLA-side cone selection + sort,
    render_tiled._block_tile_select; excluded slots carry tlo = +inf) and
    stops once every ray's bbox-capped best hit precedes the next tile.
    Callers must pass spheres in the same Morton-tile order the ids index
    and the selection + t_lo must be conservative (a missed tile or an
    over-estimated t_lo is an exactness bug, not a perf bug).
    ``tri_tile_ids`` is the same contract for 128-TRIANGLE Morton tiles
    (mesh-heavy scenes — config 3's class); boxes always stream dense.
    B must equal ceil(N / BLOCK_R). ``sph_fan``/``tri_fan`` declare the
    ids as SUPERTILE indices covering ``fan`` consecutive 128-prim tiles
    (the SMEM id-window cap would otherwise exclude big tables — 1M
    spheres is 7813 tiles; fan=4 lists 1954 supertiles), with t_lo the
    supertile-granular conservative bound.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    n_pad = -(-n // BLOCK_R) * BLOCK_R
    if n_pad != n:
        pad = ((0, n_pad - n), (0, 0))
        org = jnp.pad(org, pad)
        dir = jnp.pad(dir, pad, constant_values=1.0)  # keep dirs nonzero

    def pad_k(x, fan=1):
        k_pad = BLOCK_K * max(fan, 1)
        return -(-max(x, 1) // k_pad) * k_pad

    c_dot_c = jnp.sum(scene.sphere_center ** 2, axis=-1)
    # sphere pad covers BOTH the supertile fan and the dense DENSE_SPAN
    # dot batching (poisoned below, so over-reads are harmless misses)
    sph = _pack_rows(scene.sphere_center[:, 0], scene.sphere_center[:, 1],
                     scene.sphere_center[:, 2],
                     c_dot_c - scene.sphere_radius ** 2,
                     rows=4,
                     pad_to=pad_k(scene.n_spheres,
                                  max(sph_fan, DENSE_SPAN)))
    # POISON padded sphere lanes: ccmr = +inf -> disc = -inf -> invalid,
    # which lets the kernel drop the per-tile lane-bound mask (a zero pad
    # is a radius-0 sphere at the origin — a real false hit)
    if sph.shape[1] > scene.n_spheres:
        sph = sph.at[3, scene.n_spheres:].set(_INF)
    box = _pack_rows(scene.box_center[:, 0], scene.box_center[:, 1],
                     scene.box_center[:, 2], scene.box_half[:, 0],
                     scene.box_half[:, 1], scene.box_half[:, 2],
                     rows=6, pad_to=pad_k(scene.n_boxes))
    tri = _pack_rows(scene.tri_v0[:, 0], scene.tri_v0[:, 1], scene.tri_v0[:, 2],
                     scene.tri_v1[:, 0], scene.tri_v1[:, 1], scene.tri_v1[:, 2],
                     scene.tri_v2[:, 0], scene.tri_v2[:, 1], scene.tri_v2[:, 2],
                     rows=9, pad_to=pad_k(scene.n_tris, tri_fan))
    meta = (scene.n_spheres, scene.n_boxes, scene.n_tris, n)
    nl = (jnp.full((1, 1), n, jnp.int32) if n_live is None
          else jnp.reshape(n_live, (1, 1)).astype(jnp.int32))
    if tile_ids is not None or tri_tile_ids is not None:
        def prep(pair):
            ids, tlo = pair
            assert ids.shape[0] * BLOCK_R >= n, (ids.shape, n)
            ids = ids.astype(jnp.int32)
            tlo = tlo.astype(jnp.float32)
            rpad = -(-ids.shape[0] // 8) * 8 - ids.shape[0]
            if rpad:
                ids = jnp.pad(ids, ((0, rpad), (0, 0)))
                tlo = jnp.pad(tlo, ((0, rpad), (0, 0)),
                              constant_values=jnp.inf)
            cpad = -(-ids.shape[1] // CHUNK_T) * CHUNK_T - ids.shape[1]
            if cpad:
                ids = jnp.pad(ids, ((0, 0), (0, cpad)))
                tlo = jnp.pad(tlo, ((0, 0), (0, cpad)),
                              constant_values=jnp.inf)
            return ids, tlo

        lists = ()
        if tile_ids is not None:
            lists += prep(tile_ids)
        if tri_tile_ids is not None:
            lists += prep(tri_tile_ids)
        # per-ray early-exit cap: the scene-bbox exit (any hit point lies
        # inside the union of prim AABBs, so no prim can beat a ray's
        # bbox-exit param — what lets MISS rays terminate the stream)
        from ..models.scene import prim_aabbs

        lo, hi = prim_aabbs(scene)
        bbox = jnp.concatenate(
            [jnp.min(lo, axis=0), jnp.max(hi, axis=0),
             jnp.zeros((2,), jnp.float32)]).reshape(1, 8)
        t, pid = _nearest_hit_call_listed(nl, bbox, lists, org, dir,
                                          sph, box, tri, meta,
                                          sph_listed=tile_ids is not None,
                                          tri_listed=(tri_tile_ids
                                                      is not None),
                                          sph_fan=sph_fan,
                                          tri_fan=tri_fan,
                                          interpret=interpret)
        return t[:n], pid[:n]
    if tile_bounds is not None:
        # per-sphere-tile bounds [T, 4] (cx, cy, cz, r) enable the block
        # cone cull; caller must pass spheres in Morton-tight tile order
        assert tile_bounds.shape[0] * BLOCK_K >= scene.n_spheres
        t, pid = _nearest_hit_call_culled(nl, tile_bounds, org, dir, sph,
                                          box, tri, meta,
                                          interpret=interpret)
    else:
        t, pid = _nearest_hit_call(nl, org, dir, sph, box, tri, meta,
                                   interpret=interpret)
    return t[:n], pid[:n]
