"""Tiled candidate-list trace kernel — the big-scene (100k+ prim) path.

The fused kernel (kernels/trace_fused) streams the whole primitive table
past every ray tile from lane-replicated VMEM rows; at 100k primitives that
table alone would be ~0.5 GB and the scan 2000x too much work. This kernel
instead consumes, per ray tile, a *candidate table* built by
accel/candidates: the exact conservative set of primitives any ray of the
tile could hit, type-segregated and sorted by a lower-bound entry distance
``t_lo``. The per-tile scan then

* reads each candidate's attributes as VMEM scalars (dense [C, N_ATTR]
  rows, dynamic-sublane indexed — no lane-replication, no gathers), and
* early-exits per CHUNK of candidates once every live ray's current best
  hit precedes every remaining candidate (``t_best <= next chunk's t_lo``)
  — the tile-granular analogue of the reference walker's per-ray
  near-to-far termination (octree_space.ts:316-361, raytracer.ts:186-195).

One kernel call performs ONE bounce (hit search + winner extraction +
shading + respawn) and writes the full ray state back; divergent bounces
re-tile the wavefront into coherent packets between calls
(render.render_tiled drives this). Directions must be unit (camera rays are
unit by construction; mirror reflections preserve the norm), which drops
the |d|^2 quadratic terms exactly like trace_fused's ``unit_d`` path.

Shading semantics are identical to ops/trace._bounce for the restricted
class (solid textures/sky, no transmission, zero roughness — mirrored from
raytracer.ts:166-277); the EXHAUST blackout and light-hit inverse-square
attenuation are applied by the caller after the last bounce
(raytracer.ts:256-263, :273-275).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPS_ADVANCE, RayStatus
from ..accel.candidates import N_ATTR
from .mathx import atan2_poly

Array = jnp.ndarray

#: ray-tile sublanes (rays per program = TILE_SUB * 128)
TILE_SUB = int(os.environ.get("RT_TILE_SUB", "32"))
#: wavefront-packet sublanes (rays per packet = WAVE_SUB * 128). Smaller
#: than the frame tile: divergent-bounce packets need tight bounding cones
#: or their t_lo lower bounds clamp to zero and the resolution rounds
#: stall (a packet spanning the scene "contains" every primitive).
WAVE_SUB = int(os.environ.get("RT_WAVE_SUB", "8"))
LANE = 128
#: candidates per early-exit check == the builders' segment alignment
from ..accel.candidates import SEG_ALIGN as CHUNK  # noqa: E402

_INF = float(np.inf)
_SLAB_EPS = 1e-12
_MT_EPS = 1e-9
_ALIVE = int(RayStatus.ALIVE)
_LIGHT = int(RayStatus.LIGHT)
_KEEP = int(RayStatus.KEEP)
_MISS = int(RayStatus.MISS)

# SMEM camera/constants layout (f32):
# 0-2 pos, 3-5 front, 6-8 left, 9-11 up, 12 step_h, 13 step_v,
# 14 off_h, 15 off_v, 16-18 sky rgb, 19 w, 20 h, 21-23 scene bbox lo,
# 24-26 scene bbox hi, 27 spare
TCAM_SLOTS = 28


def _safe_inv(d):
    tiny = jnp.abs(d) < _SLAB_EPS
    return 1.0 / jnp.where(tiny, jnp.where(d < 0, -_SLAB_EPS, _SLAB_EPS), d)


def _pad_chunk(x):
    """Round a (possibly traced) count up to a CHUNK multiple."""
    return ((x + CHUNK - 1) // CHUNK) * CHUNK


def _bounce_tile(tab, cnt_s, cnt_b, cnt_t, t_safe, bb_lo, bb_hi, c_max,
                 ox, oy, oz, dx, dy, dz, col_r, col_g, col_b,
                 path, status, sky_r, sky_g, sky_b,
                 want_uv=False, sky_solid=True, has_trans=False,
                 want_normal=False, static_bases=None):
    """One traverse->intersect->shade->respawn pass over one ray tile.

    ``tab`` is the tile's [c_max, N_ATTR] candidate ref (see
    accel/candidates for the column layout; segments start at CHUNK-aligned
    rows: spheres at 0, boxes at pad(cnt_s), tris at pad(cnt_s)+pad(cnt_b));
    ``cnt_*`` are the real per-type counts; ray state is
    (TILE_SUB, LANE)-shaped. Candidate attributes are fetched as whole
    [CHUNK, N_ATTR] vector blocks and broadcast by static extraction —
    measured 5x faster than per-attribute scalar VMEM reads (147 -> 28
    cycles per candidate, tools/exp_mech.py).

    EXACTNESS under truncated candidate lists: ``t_safe`` (scalar) lower-
    bounds the hit param of every candidate the list builder dropped. A ray
    is RESOLVED this pass iff its best hit precedes t_safe, or it provably
    exits the scene bounds (``bb_lo``/``bb_hi`` scalars x3) before t_safe.
    Unresolved rays pass through COMPLETELY unchanged — the driver rebuilds
    candidates with a larger cleared horizon and retries
    (render_tiled round loop).

    ``want_uv`` (static) computes the winner's texture coordinates (sphere
    equirect uv_mapping.ts:19-25, box 6:1 face layout
    ops/intersect.box_surface, triangle barycentric) for the XLA glue's
    image-texture sampling; image-textured candidates carry rgb = 1 so the
    in-kernel modulation is the identity for them. ``sky_solid=False``
    (static) skips the in-kernel miss modulation — the glue applies the
    (possibly image) sky instead.

    Returns the updated state tuple plus (t_best, pid, u, v).
    """
    shape = dx.shape
    alive = status == _ALIVE
    any_alive = jnp.any(alive)
    o_dot_d = ox * dx + oy * dy + oz * dz
    o_dot_o = ox * ox + oy * oy + oz * oz
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    n_chunks = -(-c_max // CHUNK)      # ceil: c_max < CHUNK still scans
    # centroid-anchored per-ray geometry: candidate t_lo values and the
    # resolution bound t_safe are measured from the packet centroid o0;
    # each ray compensates by its centroid distance d_c (accel/candidates)
    t_safe_pkt, o0x, o0y, o0z, _ro = t_safe
    d_c = jnp.sqrt((ox - o0x) ** 2 + (oy - o0y) ** 2 + (oz - o0z) ** 2)
    # per-ray scene-bounds exit: every primitive lives inside the bbox, so
    # any hit satisfies t <= t_exit_bb. Capping the early-exit comparison
    # at the exit lets MISS rays (t_best = inf forever) release the
    # tile-global scan — without it one sky lane forces a full-list scan
    ex_x = jnp.maximum((bb_lo[0] - ox) * ix, (bb_hi[0] - ox) * ix)
    ex_y = jnp.maximum((bb_lo[1] - oy) * iy, (bb_hi[1] - oy) * iy)
    ex_z = jnp.maximum((bb_lo[2] - oz) * iz, (bb_hi[2] - oz) * iz)
    t_exit_bb = jnp.minimum(jnp.minimum(ex_x, ex_y), ex_z)

    # ---- phase 1: hit search; carry (t_best, jwin) only ------------------
    t_best0 = jnp.full(shape, _INF, jnp.float32)
    jwin0 = jnp.full(shape, -1, jnp.int32)

    def at(blk, k, col):
        return jnp.broadcast_to(blk[k, col], shape)

    def sphere_t(blk, k):
        cx = at(blk, k, 2)
        cy = at(blk, k, 3)
        cz = at(blk, k, 4)
        ccmr = at(blk, k, 5)
        b_half = o_dot_d - (dx * cx + dy * cy + dz * cz)
        c = o_dot_o - 2.0 * (ox * cx + oy * cy + oz * cz) + ccmr
        disc = b_half * b_half - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where(-b_half - sq >= 0.0, -b_half - sq, sq - b_half)
        return t, (disc >= 0.0) & (t >= 0.0)

    def box_t(blk, k):
        cx = at(blk, k, 2)
        cy = at(blk, k, 3)
        cz = at(blk, k, 4)
        hx = at(blk, k, 5)
        hy = at(blk, k, 6)
        hz = at(blk, k, 7)
        tax = (cx - hx - ox) * ix
        tbx = (cx + hx - ox) * ix
        tay = (cy - hy - oy) * iy
        tby = (cy + hy - oy) * iy
        taz = (cz - hz - oz) * iz
        tbz = (cz + hz - oz) * iz
        t_en = jnp.maximum(jnp.maximum(jnp.minimum(tax, tbx),
                                       jnp.minimum(tay, tby)),
                           jnp.minimum(taz, tbz))
        t_ex = jnp.minimum(jnp.minimum(jnp.maximum(tax, tbx),
                                       jnp.maximum(tay, tby)),
                           jnp.maximum(taz, tbz))
        t = jnp.where(t_en >= 0.0, t_en, t_ex)
        return t, (t_en <= t_ex) & (t >= 0.0)

    def tri_t(blk, k):
        v0x = at(blk, k, 2)
        v0y = at(blk, k, 3)
        v0z = at(blk, k, 4)
        e1x = at(blk, k, 5)
        e1y = at(blk, k, 6)
        e1z = at(blk, k, 7)
        e2x = at(blk, k, 8)
        e2y = at(blk, k, 9)
        e2z = at(blk, k, 10)
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
        return t, ok

    def load_chunk(j0):
        j0 = pl.multiple_of(jnp.minimum(j0, c_max - CHUNK), CHUNK)
        return tab[pl.ds(j0, CHUNK), :]

    def scan_segment(test, base, cnt, carry):
        """Chunked early-exit scan of candidate rows [base, base+cnt);
        ``base`` must be a CHUNK multiple (builders pad segments). The
        early-exit state update lives INSIDE the cond: closed chunks cost
        one scalar branch, not a whole-tile reduction (the fori_loop always
        runs n_chunks trips)."""
        end = base + cnt

        def chunk_step(ci, st):
            def do(st):
                t_best, jwin, open_ = st
                j0 = base + ci * CHUNK
                blk = load_chunk(j0)
                for k in range(CHUNK):
                    j = j0 + k
                    t, valid = test(blk, k)
                    upd = (t < t_best) & valid & (j < end)
                    t_best = jnp.where(upd, t, t_best)
                    jwin = jnp.where(upd, j, jwin)
                nxt = base + (ci + 1) * CHUNK
                next_tlo = tab[jnp.minimum(nxt, c_max - 1), 0]
                # remaining candidates hit ray i at t >= t_lo - d_c[i];
                # a ray is released once min(t_best, bbox exit) precedes
                # that bound (misses resolve at the exit, not at inf)
                done = jnp.all(~alive | (jnp.minimum(t_best, t_exit_bb)
                                         + d_c <= next_tlo))
                return t_best, jwin, open_ & ~done & (nxt < end)

            return jax.lax.cond(st[2], do, lambda s: s, st)

        t_best, jwin, _ = jax.lax.fori_loop(
            0, n_chunks, chunk_step, (*carry, (cnt > 0) & any_alive))
        return t_best, jwin

    if static_bases is None:
        base_b = _pad_chunk(cnt_s)
        base_t = base_b + _pad_chunk(cnt_b)
    else:
        # cell-grid tables lay segments out at fixed offsets
        base_b, base_t = static_bases
    carry = (t_best0, jwin0)
    carry = scan_segment(sphere_t, 0, cnt_s, carry)
    carry = scan_segment(box_t, base_b, cnt_b, carry)
    carry = scan_segment(tri_t, base_t, cnt_t, carry)
    t_best, jwin = carry

    # ---- phase 2: winner attribute extraction by jwin match --------------
    # The winner is always within the scanned prefix; exit once every lane's
    # winner index precedes the next chunk (jwin is bounded by the hit-phase
    # scan, so this converges at least as fast).
    zero = jnp.zeros(shape, jnp.float32)
    one = jnp.ones(shape, jnp.float32)
    st0 = dict(wr=one, wg=one, wb=one, wm=zero, pid=jnp.full(
        shape, -1, jnp.int32), g0=zero, g1=zero, g2=zero, g3=zero,
        g4=zero, g5=zero, g6=zero, g7=zero, g8=zero)

    def pick_segment(base, cnt, geo_cols, st):
        end = base + cnt

        def chunk_step(ci, st_open):
            def do(st_open):
                st, open_ = st_open
                out = dict(st)
                j0 = base + ci * CHUNK
                blk = load_chunk(j0)
                for k in range(CHUNK):
                    j = j0 + k
                    m = jwin == j
                    out["wr"] = jnp.where(m, at(blk, k, 14), out["wr"])
                    out["wg"] = jnp.where(m, at(blk, k, 15), out["wg"])
                    out["wb"] = jnp.where(m, at(blk, k, 16), out["wb"])
                    out["wm"] = jnp.where(m, at(blk, k, 17), out["wm"])
                    out["pid"] = jnp.where(
                        m, jnp.broadcast_to(blk[k, 1], shape).astype(
                            jnp.int32), out["pid"])
                    for gi, col in enumerate(geo_cols):
                        out[f"g{gi}"] = jnp.where(m, at(blk, k, col),
                                                  out[f"g{gi}"])
                nxt = base + (ci + 1) * CHUNK
                done = jnp.all(jwin < nxt)
                return out, open_ & ~done & (nxt < end)

            return jax.lax.cond(st_open[1], do, lambda s: s, st_open)

        st, _ = jax.lax.fori_loop(
            0, n_chunks, chunk_step,
            (st, (cnt > 0) & jnp.any((jwin >= base) & (jwin < end))))
        return st

    # sphere winners: center + 1/r; box winners: center + half;
    # tri winners: v0, e1, e2 (normal and barycentric uv recomputed once)
    s_st = pick_segment(0, cnt_s, (2, 3, 4, 6), st0)
    is_sph = (jwin >= 0) & (jwin < base_b)
    b_st = pick_segment(base_b, cnt_b, (2, 3, 4, 5, 6, 7), s_st)
    is_box = (jwin >= base_b) & (jwin < base_t)
    t_st = pick_segment(base_t, cnt_t,
                        (2, 3, 4, 5, 6, 7, 8, 9, 10), b_st)
    is_tri = jwin >= base_t
    wr, wg, wb, w_mode, pid = (t_st["wr"], t_st["wg"], t_st["wb"],
                               t_st["wm"], t_st["pid"])

    # ---- winner normal (+ optional uv), once per bounce ------------------
    t_fin = jnp.where(t_best < _INF, t_best, 0.0)
    hx_ = ox + t_fin * dx
    hy_ = oy + t_fin * dy
    hz_ = oz + t_fin * dz
    # sphere: (hit - c) * (1/r); overwritten below for box/tri winners
    nx = (hx_ - t_st["g0"]) * t_st["g3"]
    ny = (hy_ - t_st["g1"]) * t_st["g3"]
    nz = (hz_ - t_st["g2"]) * t_st["g3"]
    if want_uv:
        # sphere equirect uv from the UNFLIPPED (hit-c)/r direction
        # (entity_sphere.ts:98-101 -> uv_mapping.ts:19-25); atan2 via the
        # octant-reduced polynomial (Mosaic has no atan2 lowering)
        eps_uv = 2.0 ** -52
        u_out = (atan2_poly(ny, nx) / (2.0 * np.pi) + 0.5 - eps_uv)
        v_out = (atan2_poly(nz, jnp.sqrt(nx * nx + ny * ny)) / np.pi
                 + 0.5 - eps_uv)
    else:
        u_out = zero
        v_out = zero
    # box: winning slab axis -> face normal (ops/intersect.box_surface
    # x > y > z tie order); boolean logic only (no i1-vector selects)
    bcx, bcy, bcz = t_st["g0"], t_st["g1"], t_st["g2"]
    bhx, bhy, bhz = t_st["g3"], t_st["g4"], t_st["g5"]
    tax = (bcx - bhx - ox) * ix
    tbx = (bcx + bhx - ox) * ix
    tay = (bcy - bhy - oy) * iy
    tby = (bcy + bhy - oy) * iy
    taz = (bcz - bhz - oz) * iz
    tbz = (bcz + bhz - oz) * iz
    t0x, t1x = jnp.minimum(tax, tbx), jnp.maximum(tax, tbx)
    t0y, t1y = jnp.minimum(tay, tby), jnp.maximum(tay, tby)
    t0z, t1z = jnp.minimum(taz, tbz), jnp.maximum(taz, tbz)
    t_en = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
    t_ex = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
    entering = t_en >= 0.0
    wx = (entering & (t0x == t_en)) | (~entering & (t1x == t_ex))
    wy = ((entering & (t0y == t_en)) | (~entering & (t1y == t_ex))) & ~wx
    wz = ~wx & ~wy
    sxn = jnp.where(dx < 0.0, 1.0, -1.0)
    syn = jnp.where(dy < 0.0, 1.0, -1.0)
    szn = jnp.where(dz < 0.0, 1.0, -1.0)
    nx = jnp.where(is_box, jnp.where(wx, sxn, 0.0), nx)
    ny = jnp.where(is_box, jnp.where(wy, syn, 0.0), ny)
    nz = jnp.where(is_box, jnp.where(wz, szn, 0.0), nz)
    if want_uv:
        # box 6:1 face layout (ops/intersect.box_surface; the reference
        # declares-but-stubs this, entity_box.ts:104-107)
        axis = jnp.where(wx, 0, jnp.where(wy, 1, 2))
        sgn = jnp.where(wx, sxn, jnp.where(wy, syn, szn))   # = -sign(d_ax)
        outward = jnp.where(entering, sgn, -sgn)
        face = (axis * 2 + (outward > 0.0).astype(jnp.int32)
                ).astype(jnp.float32)
        clip_hi = 1.0 - 2.0 ** -23
        rx = jnp.clip((hx_ - (bcx - bhx)) / (2.0 * bhx), 0.0, clip_hi)
        ry = jnp.clip((hy_ - (bcy - bhy)) / (2.0 * bhy), 0.0, clip_hi)
        rz = jnp.clip((hz_ - (bcz - bhz)) / (2.0 * bhz), 0.0, clip_hi)
        u_loc = jnp.where(axis == 0, ry, rx)
        v_loc = jnp.where(axis == 2, ry, rz)
        u_out = jnp.where(is_box, (face + u_loc) / 6.0, u_out)
        v_out = jnp.where(is_box, v_loc, v_out)
    # tri: recompute geometric normal + barycentric uv from the winner's
    # (v0, e1, e2) — once per bounce, not per candidate
    e1x, e1y, e1z = t_st["g3"], t_st["g4"], t_st["g5"]
    e2x, e2y, e2z = t_st["g6"], t_st["g7"], t_st["g8"]
    gx = e1y * e2z - e1z * e2y
    gy = e1z * e2x - e1x * e2z
    gz = e1x * e2y - e1y * e2x
    g_inv = 1.0 / jnp.sqrt(jnp.maximum(gx * gx + gy * gy + gz * gz, 1e-40))
    nx = jnp.where(is_tri, gx * g_inv, nx)
    ny = jnp.where(is_tri, gy * g_inv, ny)
    nz = jnp.where(is_tri, gz * g_inv, nz)
    if want_uv:
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < _MT_EPS, _MT_EPS, det)
        sx_, sy_, sz_ = (ox - t_st["g0"], oy - t_st["g1"], oz - t_st["g2"])
        bu = (sx_ * px + sy_ * py + sz_ * pz) * inv_det
        qx = sy_ * e1z - sz_ * e1y
        qy = sz_ * e1x - sx_ * e1z
        qz = sx_ * e1y - sy_ * e1x
        bv = (dx * qx + dy * qy + dz * qz) * inv_det
        u_out = jnp.where(is_tri, bu, u_out)
        v_out = jnp.where(is_tri, bv, v_out)
    # flip toward the incoming ray (sphere inside view / tri winding);
    # box face normals already oppose the ray by construction
    do_flip = is_sph | is_tri
    flip = jnp.where(do_flip & (dx * nx + dy * ny + dz * nz > 0.0),
                     -1.0, 1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip
    # normalize: the sphere normal (hit - c) * inv_r inherits the hit-t
    # rounding error amplified by 1/r — without this, reflections drift the
    # direction norm by ~1e-4 on small spheres and the unit-|d| sphere
    # quadratic then systematically flips grazing hits vs the XLA path
    # (which normalizes in ops/intersect.*_surface)
    n_inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    nx, ny, nz = nx * n_inv, ny * n_inv, nz * n_inv

    # ---- resolution (exactness under truncated candidate lists) ---------
    # a found hit is final iff it precedes every dropped candidate's lower
    # bound; a miss is final iff the ray leaves the scene bounds before any
    # dropped candidate could be hit (all primitives live inside the bbox,
    # so hits happen at t <= bbox exit). Per ray the bound is the
    # resolution radius tau = t_safe - d_c (centroid-anchored).
    t_safe_ray = t_safe_pkt - d_c            # t_exit_bb hoisted to phase 1

    # ---- shade + respawn (raytracer.ts:166-277 via ops/trace._bounce) ----
    # mode decode: 0 keep, 1 mirror continuation, 2 emissive,
    # 3 transmission continuation (glue-refracted: the kernel modulates
    # color and path but leaves org/dir/status for render_tiled's glue)
    hit = alive & (jwin >= 0) & (t_best <= t_safe_ray)
    lit = hit & (w_mode > 1.5) & (w_mode < 2.5)
    cont = hit & (w_mode > 0.5) & (w_mode < 1.5)
    cont_t = (hit & (w_mode > 2.5)) if has_trans else jnp.zeros(shape, bool)
    keep = hit & ~lit & ~cont & ~cont_t
    miss = alive & (jwin < 0) & (t_safe_ray > t_exit_bb)

    if sky_solid:
        col_r = jnp.where(hit, col_r * wr,
                          jnp.where(miss, col_r * sky_r, col_r))
        col_g = jnp.where(hit, col_g * wg,
                          jnp.where(miss, col_g * sky_g, col_g))
        col_b = jnp.where(hit, col_b * wb,
                          jnp.where(miss, col_b * sky_b, col_b))
    else:
        # image sky: the XLA glue modulates newly-MISS lanes instead
        col_r = jnp.where(hit, col_r * wr, col_r)
        col_g = jnp.where(hit, col_g * wg, col_g)
        col_b = jnp.where(hit, col_b * wb, col_b)
    path = jnp.where(hit, path + t_best, path)
    status = jnp.where(lit, _LIGHT,
                       jnp.where(keep, _KEEP,
                                 jnp.where(miss, _MISS, status)))

    d_dot_n = dx * nx + dy * ny + dz * nz
    rdx = dx - 2.0 * d_dot_n * nx
    rdy = dy - 2.0 * d_dot_n * ny
    rdz = dz - 2.0 * d_dot_n * nz
    ox = jnp.where(cont, hx_ + EPS_ADVANCE * rdx, ox)
    oy = jnp.where(cont, hy_ + EPS_ADVANCE * rdy, oy)
    oz = jnp.where(cont, hz_ + EPS_ADVANCE * rdz, oz)
    dx = jnp.where(cont, rdx, dx)
    dy = jnp.where(cont, rdy, dy)
    dz = jnp.where(cont, rdz, dz)
    pid_out = jnp.where(hit, pid, -1)
    out = (ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path, status,
           t_best, pid_out, u_out, v_out)
    if want_normal:
        # flipped winner normal for the glue's scatter/refract (rough and
        # transmission scenes)
        out = out + (nx, ny, nz)
    return out


def _frame_kernel(cam_ref, cnt_ref, tab_ref, *refs,
                  c_max, want_uv, sky_solid, has_trans=False,
                  want_normal=False):
    """Bounce-0 frame entry: rays generated in-register from the camera pose
    (the equiangular closed form of models/camera.pixel_rays, exactly as
    trace_fused._trace_frame_kernel)."""
    by = pl.program_id(0)
    bx = pl.program_id(1)
    row = by * pl.num_programs(1) + bx
    sub = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_SUB, LANE), 1)
    x = (bx * LANE + lane).astype(jnp.float32)
    y = (by * TILE_SUB + sub).astype(jnp.float32)
    th_h = (x - cam_ref[0, 14]) * cam_ref[0, 12]
    th_v = (y - cam_ref[0, 15]) * cam_ref[0, 13]
    ch, sh = jnp.cos(th_h), jnp.sin(th_h)
    cv, sv = jnp.cos(th_v), jnp.sin(th_v)
    a1, a2 = ch * cv, ch * sv
    dx = a1 * cam_ref[0, 3] + a2 * cam_ref[0, 9] + sh * cam_ref[0, 6]
    dy = a1 * cam_ref[0, 4] + a2 * cam_ref[0, 10] + sh * cam_ref[0, 7]
    dz = a1 * cam_ref[0, 5] + a2 * cam_ref[0, 11] + sh * cam_ref[0, 8]
    shape = dx.shape
    zero = jnp.zeros(shape, jnp.float32)
    ox = zero + cam_ref[0, 0]
    oy = zero + cam_ref[0, 1]
    oz = zero + cam_ref[0, 2]
    # padding pixels of partial edge tiles start as MISS: their candidate
    # cones exclude them anyway (outputs are cropped) and marking them dead
    # keeps them from stalling the whole-tile early exit
    pad = (x >= cam_ref[0, 19]) | (y >= cam_ref[0, 20])
    status0 = jnp.where(pad, _MISS, _ALIVE).astype(jnp.int32)
    out = _bounce_tile(
        tab_ref, cnt_ref[row, 0].astype(jnp.int32),
        cnt_ref[row, 1].astype(jnp.int32),
        cnt_ref[row, 2].astype(jnp.int32),
        (cnt_ref[row, 3], cnt_ref[row, 4], cnt_ref[row, 5],
         cnt_ref[row, 6], cnt_ref[row, 7]),
        (cam_ref[0, 21], cam_ref[0, 22], cam_ref[0, 23]),
        (cam_ref[0, 24], cam_ref[0, 25], cam_ref[0, 26]), c_max,
        ox, oy, oz, dx, dy, dz,
        jnp.ones(shape, jnp.float32), jnp.ones(shape, jnp.float32),
        jnp.ones(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
        status0,
        cam_ref[0, 16], cam_ref[0, 17], cam_ref[0, 18],
        want_uv=want_uv, sky_solid=sky_solid, has_trans=has_trans,
        want_normal=want_normal)
    for ref, val in zip(refs, out):
        ref[:, :] = val


def _wave_kernel(cam_ref, cnt_ref, tab_ref, *refs,
                 c_max, want_uv, sky_solid, has_trans=False,
                 want_normal=False, static_bases=None):
    """Wavefront entry: one bounce of an arbitrary (packetized) wavefront.
    ``refs`` = 11 input state refs then the 15 (+3 normal) output refs."""
    row = pl.program_id(0)
    ins, outs = refs[:11], refs[11:]
    out = _bounce_tile(
        tab_ref, cnt_ref[row, 0].astype(jnp.int32),
        cnt_ref[row, 1].astype(jnp.int32),
        cnt_ref[row, 2].astype(jnp.int32),
        (cnt_ref[row, 3], cnt_ref[row, 4], cnt_ref[row, 5],
         cnt_ref[row, 6], cnt_ref[row, 7]),
        (cam_ref[0, 21], cam_ref[0, 22], cam_ref[0, 23]),
        (cam_ref[0, 24], cam_ref[0, 25], cam_ref[0, 26]), c_max,
        *(r[:, :] for r in ins),
        cam_ref[0, 16], cam_ref[0, 17], cam_ref[0, 18],
        want_uv=want_uv, sky_solid=sky_solid, has_trans=has_trans,
        want_normal=want_normal, static_bases=static_bases)
    for ref, val in zip(outs, out):
        ref[:, :] = val


def _scene_bbox(scene):
    """Conservative scene bounds from the primitive bounding spheres."""
    from ..accel.candidates import bounding_spheres_jnp

    c, r = bounding_spheres_jnp(scene)
    lo = jnp.min(c - r[:, None], axis=0) - 1e-3
    hi = jnp.max(c + r[:, None], axis=0) + 1e-3
    return lo, hi


def _cam_array(cam, sky_rgb, bb_lo, bb_hi) -> Array:
    return jnp.concatenate([
        cam.pos.astype(jnp.float32),
        cam.front.astype(jnp.float32),
        cam.left.astype(jnp.float32),
        cam.up.astype(jnp.float32),
        jnp.array([cam.fov_h / cam.w, cam.fov_v / cam.h,
                   float(cam.w // 2), float(cam.h // 2)], jnp.float32),
        jnp.asarray(sky_rgb, jnp.float32).reshape(3),
        jnp.array([float(cam.w), float(cam.h)], jnp.float32),
        jnp.asarray(bb_lo, jnp.float32).reshape(3),
        jnp.asarray(bb_hi, jnp.float32).reshape(3),
        jnp.zeros((TCAM_SLOTS - 27,), jnp.float32),
    ]).reshape(1, TCAM_SLOTS)


@functools.partial(jax.jit, static_argnames=("nby", "nbx", "c_max",
                                             "want_uv", "sky_solid",
                                             "has_trans", "want_normal",
                                             "interpret"))
def _frame_call(cam_arr, cnts, tab, nby, nbx, c_max, want_uv, sky_solid,
                has_trans=False, want_normal=False, interpret=False):
    kern = functools.partial(_frame_kernel, c_max=c_max, want_uv=want_uv,
                             sky_solid=sky_solid, has_trans=has_trans,
                             want_normal=want_normal)
    tile = pl.BlockSpec((TILE_SUB, LANE), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    cam_spec = pl.BlockSpec(cam_arr.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec(cnts.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    tab_spec = pl.BlockSpec((c_max, N_ATTR),
                            lambda i, j: (i * nbx + j, 0),
                            memory_space=pltpu.VMEM)
    h_pad, w_pad = nby * TILE_SUB, nbx * LANE
    f32 = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)
    i32 = jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32)
    n_out = 18 if want_normal else 15
    shapes = [f32] * 10 + [i32, f32, i32, f32, f32] + [f32] * (n_out - 15)
    # 1M-prim frames carry ~49k-candidate tile blocks (~4 MB each, double
    # buffered) — past Mosaic's default 16 MB scoped-VMEM stack; same
    # raise as _wave_call
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(nby, nbx),
        in_specs=[cam_spec, cnt_spec, tab_spec],
        out_specs=[tile] * n_out,
        out_shape=shapes,
        compiler_params=params,
        interpret=interpret,
    )(cam_arr, cnts, tab)


@functools.partial(jax.jit, static_argnames=("c_max", "want_uv",
                                             "sky_solid", "has_trans",
                                             "want_normal", "wave_sub",
                                             "static_bases", "interpret"))
def _wave_call(cam_arr, cnts, tab, cols, c_max, want_uv, sky_solid,
               has_trans=False, want_normal=False, wave_sub=WAVE_SUB,
               static_bases=None, interpret=False):
    kern = functools.partial(_wave_kernel, c_max=c_max, want_uv=want_uv,
                             sky_solid=sky_solid, has_trans=has_trans,
                             want_normal=want_normal,
                             static_bases=static_bases)
    rows = cols[0].shape[0]
    nblk = rows // wave_sub
    tile = pl.BlockSpec((wave_sub, LANE), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    cam_spec = pl.BlockSpec(cam_arr.shape, lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    cnt_spec = pl.BlockSpec(cnts.shape, lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    tab_spec = pl.BlockSpec((c_max, N_ATTR), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
    i32 = jax.ShapeDtypeStruct((rows, LANE), jnp.int32)
    n_out = 18 if want_normal else 15
    shapes = [f32] * 10 + [i32, f32, i32, f32, f32] + [f32] * (n_out - 15)
    # escalated retry budgets push the double-buffered [c_max, N_ATTR]
    # block past Mosaic's default 16 MB scoped-VMEM limit; raise it (the
    # physical VMEM is far larger)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[cam_spec, cnt_spec, tab_spec] + [tile] * 11,
        out_specs=[tile] * n_out,
        out_shape=shapes,
        compiler_params=params,
        interpret=interpret,
    )(cam_arr, cnts, tab, *cols)


STATE_NAMES = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
               "path", "status", "t", "pid", "u", "v", "nx", "ny", "nz")


def _flags(scene):
    """Static kernel flags for a scene: (want_uv, sky_solid, has_trans,
    want_normal)."""
    has_img = scene.textures.has_images
    want_n = bool(scene.has_rough or scene.has_transmission)
    # cube-map skies sample per-face textures in the XLA glue, so the
    # kernel must NOT apply its solid sky even for image-free scenes
    sky_glue = has_img or scene.sky_box is not None
    return dict(want_uv=has_img, sky_solid=not sky_glue,
                has_trans=bool(scene.has_transmission), want_normal=want_n)


def frame_bounce0(scene, cam, tab, cnts, c_max, interpret=None):
    """Bounce 0 over the whole frame -> dict of [h_pad, w_pad] state arrays.

    ``tab``/``cnts`` from accel.candidates.frame_candidates with
    sub=TILE_SUB, lane=LANE. Scenes with image textures get (u, v) filled
    and NO in-kernel sky modulation (the glue applies textures + sky).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nbx = -(-cam.w // LANE)
    nby = -(-cam.h // TILE_SUB)
    sky_rgb = scene.textures.solid_rgb[scene.sky_tex]
    bb_lo, bb_hi = _scene_bbox(scene)
    cam_arr = _cam_array(cam, sky_rgb, bb_lo, bb_hi)
    outs = _frame_call(cam_arr, cnts, tab, nby, nbx, c_max,
                       **_flags(scene), interpret=interpret)
    return dict(zip(STATE_NAMES, outs))


def wave_bounce(scene, cols, tab, cnts, c_max, wave_sub=WAVE_SUB,
                static_bases=None, interpret=None):
    """One bounce of a packetized wavefront. ``cols`` is the 11-tuple
    (ox..dz, cr, cg, cb, path, status) of [rows, 128] arrays; returns the
    15-tuple including (t, pid, u, v) (+3 normals for glue scenes).
    ``wave_sub`` is the packet height in sublanes (packet = wave_sub*128
    rays) — retry rounds use 1 for tight straggler packets."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    sky_rgb = scene.textures.solid_rgb[scene.sky_tex]
    bb_lo, bb_hi = _scene_bbox(scene)
    # camera pose slots unused by the wavefront entry; sky + bbox are read
    cam_arr = jnp.concatenate([
        jnp.zeros((16,), jnp.float32),
        jnp.asarray(sky_rgb, jnp.float32).reshape(3),
        jnp.zeros((2,), jnp.float32),
        jnp.asarray(bb_lo, jnp.float32).reshape(3),
        jnp.asarray(bb_hi, jnp.float32).reshape(3),
        jnp.zeros((TCAM_SLOTS - 27,), jnp.float32)]).reshape(1, TCAM_SLOTS)
    return _wave_call(cam_arr, cnts, tab, tuple(cols), c_max,
                      wave_sub=wave_sub, static_bases=static_bases,
                      **_flags(scene), interpret=interpret)
