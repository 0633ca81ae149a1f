"""Fused full-trace Pallas kernel.

The whole wavefront bounce loop (ops/trace.trace_rays) for the *restricted
scene class* — solid textures, solid sky, no transmission, zero roughness —
executed inside one kernel launch: ray state (origin, direction, color,
path, status) never leaves VMEM between bounces, primitives stream as
lane-replicated row broadcasts (see kernels/nearest_hit scalar variant),
and the winning primitive's normal and shading attributes ride the
running-min carry, so there is no per-ray gather anywhere.

Two entry points share one kernel core (``_trace_core``):

- :func:`trace_rays_fused` — arbitrary ray wavefront in, colors out. This is
  the exact-parity path: bit-identical to ops/trace.trace_rays for the
  restricted class (golden tests assert lane-for-lane equality).
- :func:`trace_frame_fused` — the headline full-frame path. Ray generation
  happens *inside* the kernel (pixel (x, y) decoded from the ray index, the
  equiangular camera direction computed from SMEM pose scalars), so the XLA
  raygen + column-packing stage and its ~50 MB of HBM ray traffic vanish.
  Because camera directions are unit by construction and mirror reflections
  preserve the norm, this path also drops the |d|^2 terms from every sphere
  candidate (``unit_d``), and bounce 0's shared origin lets the sphere
  quadratic constant c0 = o.o - 2 o.c + (c.c - r^2) be folded host-side
  (``has_c0``). Numerics differ from the wavefront path only in ULPs
  (tested at 1e-5 tolerance, not bitwise).

This is the headline-benchmark path (BASELINE configs 1-2 class scenes are
exactly this restricted class). Unrestricted scenes fall back to the XLA
wavefront loop (ops/trace), which remains the semantic reference.

Semantics (all mirrored from ops/trace._bounce, raytracer.ts:166-277):
hit -> color *= prim rgb, path += t; emissive -> LIGHT + ISL at the end;
mirror REFLECTION -> reflect + eps-advance; non-mirror/BOTH -> KEEP;
miss -> color *= sky, MISS; refmax exhaustion -> black EXHAUST.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPS_ADVANCE, JS_EPSILON, RayStatus, RenderConfig, ResponseType
from ..models.scene import Scene
from ..ops import sampling
import os

from .nearest_hit import SP_LANE, _ray_cols, _row, pack_replicated

#: ray-tile sublanes for the fused kernel (rays per program = FUSE_SUB*128).
#: Tunable via RT_FUSE_SUB; smaller tiles reduce VMEM pressure of the
#: per-bounce live set and pipeline better — measured on a v5e at 1080p,
#: 50 spheres, 2 bounces: 256 -> 5.52 ms, 64 -> 3.85 ms, 32 -> 3.69 ms.
FUSE_SUB = int(os.environ.get("RT_FUSE_SUB", "32"))

Array = jnp.ndarray

_INF = float(np.inf)
_SLAB_EPS = 1e-12
_MT_EPS = 1e-9

_ALIVE = int(RayStatus.ALIVE)
_LIGHT = int(RayStatus.LIGHT)
_KEEP = int(RayStatus.KEEP)
_MISS = int(RayStatus.MISS)
_EXHAUST = int(RayStatus.EXHAUST)


def _unroll(n: int) -> int | bool:
    """Mosaic fori_loop lowering supports only full unroll or none."""
    return n if 0 < n <= 128 else 1


class ExtRows(NamedTuple):
    """Static row indices of the optional prim-table rows (-1 = absent):
    per-class roughness, and the transmission substance/volume columns."""
    s_rough: int = -1
    b_rough: int = -1
    t_rough: int = -1
    s_refr: int = -1
    s_vol: int = -1
    b_refr: int = -1
    b_vol: int = -1


def supports(scene: Scene) -> bool:
    """Static eligibility for the fused kernel.

    Transmission (in-kernel containment scan + Snell/TIR) and roughness
    (in-kernel counter-RNG scatter, ops/sampling) are handled since r2;
    image textures remain the one exclusion (atlas gathers need dynamic
    lane indexing Mosaic does not have — those scenes route to TILED/PALLAS);
    cube-map skies likewise sample per-face textures in the glue.
    ResponseType.BOTH scenes route to the XLA paths (the kernel's mode
    decode has no Fresnel-split branch — ops/trace._bounce owns it).
    """
    return (not scene.textures.has_images and scene.sky_box is None
            and not scene.has_both)


def _trace_core(ox, oy, oz, dx, dy, dz,
                sph_ref, box_ref, tri_ref, sky_ref, sid_ref,
                cr_ref, cg_ref, cb_ref, st_ref,
                *, n_sph, n_box, n_tri, s_pad, b_pad, r_pad,
                refmax, atten, use_short, unit_d, has_c0,
                tab_ref=None, dyn_short=False, tab_row=0,
                ext=(), rid=None, seed=None, refr0=None, refr_def=None):
    """Shared bounce-loop body. ``ox/oy/oz`` may be rank-0 (shared camera
    origin, frame path) or [SUB, LANE] tiles (wavefront path); ``unit_d``
    statically drops the |d|^2 quadratic terms (valid when every incoming
    direction is unit — reflections preserve the norm); ``has_c0`` reads the
    host-folded bounce-0 sphere constant from table row 9; ``dyn_short``
    makes bounce 0's sphere loops run over the per-tile compact id list in
    row ``tab_row`` of ``tab_ref`` (SMEM, full table: one [cnt, id-pairs...]
    row per tile — TPU lowering rejects sub-8-row SMEM blocks, so programs
    share the whole table and pick their row by scalar index).

    ``ext`` is the static extended-class descriptor from
    :func:`_pack_prims` — a tuple ``(has_rough, has_trans, row-index...)``
    gating the roughness-scatter and transmission code paths (compiled out
    entirely for the restricted class). ``rid`` (global ray-id tile),
    ``seed`` (uint32 scalar), ``refr0``/``refr_def`` (start / empty-space
    refractive-index scalars) feed those paths."""
    has_rough, has_trans = (ext[0], ext[1]) if ext else (False, False)
    rows_ix = ext[2] if ext else ExtRows()
    shape = dx.shape
    col_r = jnp.ones(shape, jnp.float32)
    col_g = jnp.ones(shape, jnp.float32)
    col_b = jnp.ones(shape, jnp.float32)
    path = jnp.zeros(shape, jnp.float32)
    status = jnp.full(shape, _ALIVE, jnp.int32)
    # per-ray refractive-index plane only exists for transmission scenes
    # (the restricted-class bounce-loop carry stays 11 arrays)
    refr = (jnp.broadcast_to(refr0, shape).astype(jnp.float32)
            if has_trans else None)
    sky_r = sky_ref[0:1, :]
    sky_g = sky_ref[1:2, :]
    sky_b = sky_ref[2:3, :]

    def safe_inv(d):
        tiny = jnp.abs(d) < _SLAB_EPS
        d_safe = jnp.where(tiny, jnp.where(d < 0, -_SLAB_EPS, _SLAB_EPS), d)
        return 1.0 / d_safe

    blk = pl.program_id(0)

    def _one_bounce(state, short, first, b_idx):
        """One traverse->intersect->shade->respawn pass over the tile."""
        (ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path,
         status) = state[:11]
        refr = state[11] if has_trans else None
        alive = status == _ALIVE
        if not unit_d:
            a = dx * dx + dy * dy + dz * dz
            inv_a = 1.0 / a
        o_dot_d = ox * dx + oy * dy + oz * dz
        o_dot_o = ox * ox + oy * oy + oz * oz
        ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

        zero = jnp.zeros(shape, jnp.float32)

        # ---- phase 1: hit search. Carry is (t, pid) ONLY — winner
        # attributes are extracted afterwards by pid-match, so each
        # candidate costs ~half the VPU ops of the attribute-carrying
        # variant (no per-candidate normal, no 8-wide select cascade).
        best = (jnp.full(shape, _INF, jnp.float32),
                jnp.full(shape, -1, jnp.int32))

        def upd(best, t, p_glob):
            t_best, pid = best
            u = t < t_best
            return jnp.where(u, t, t_best), jnp.where(u, p_glob, pid)

        def upd_if(best, t, valid, p_glob):
            """Running-min update with the forward/validity filter folded
            into the update predicate — selecting the same floats as
            masking t to INF first, ~5 fewer VPU ops per candidate."""
            t_best, pid = best
            u = (t < t_best) & valid
            return jnp.where(u, t, t_best), jnp.where(u, p_glob, pid)

        # sphere rows: cx cy cz ccmr inv_r | r g b mode [| c0]
        def sph_body(p, best):
            cx = _row(sph_ref, 0, p)
            cy = _row(sph_ref, s_pad, p)
            cz = _row(sph_ref, 2 * s_pad, p)
            b_half = o_dot_d - (dx * cx + dy * cy + dz * cz)
            if first and has_c0:
                # bounce 0 shares one origin: the whole quadratic constant
                # was folded host-side into table row 9
                c = _row(sph_ref, 9 * s_pad, p)
            else:
                ccmr = _row(sph_ref, 3 * s_pad, p)
                c = o_dot_o - 2.0 * (ox * cx + oy * cy + oz * cz) + ccmr
            disc = b_half * b_half - (c if unit_d else a * c)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            if unit_d:
                t_near = -b_half - sq
                t_far = sq - b_half
            else:
                t_near = (-b_half - sq) * inv_a
                t_far = (-b_half + sq) * inv_a
            # first-forward param: t_near if >=0 else t_far if >=0 else miss
            t = jnp.where(t_near >= 0.0, t_near, t_far)
            return upd_if(best, t, (disc >= 0.0) & (t >= 0.0), p)

        def tab_id(j):
            """Shortlisted sphere id j from the SMEM pair-packed id table
            (word 0 = count, then two 16-bit ids per word, low half first)."""
            word = tab_ref[tab_row, 1 + j // 2]
            return (word >> (16 * (j % 2))) & 0xFFFF

        if first and dyn_short:
            # per-tile compact shortlist: a dynamic-trip-count loop over
            # only the spheres whose cone test passed host-side. Exact
            # culling (a rejected sphere cannot be hit by any tile ray), so
            # the winner is identical to the full scan.
            best = jax.lax.fori_loop(
                0, tab_ref[tab_row, 0], lambda j, b: sph_body(tab_id(j), b), best)
        elif short:
            # bitmask culling: a Python-unrolled loop with STATIC row
            # indices, where each candidate's ~30 vector ops hide behind a
            # scalar branch on its per-block cone-test bit (SMEM). Culled
            # spheres cost one branch instead of a full quadratic test.
            for p in range(n_sph):
                bit = (sid_ref[blk, p // 32] >> (p % 32)) & 1
                best = jax.lax.cond(
                    bit > 0, lambda b, p=p: sph_body(p, b),
                    lambda b: b, best)
        else:
            best = jax.lax.fori_loop(0, n_sph, sph_body, best,
                                     unroll=_unroll(n_sph))

        # box rows: cx cy cz hx hy hz | r g b mode  (10 blocks)
        def box_body(p, best):
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
            t = jnp.where(t_enter >= 0.0, t_enter, t_exit)
            return upd_if(best, t, (t_enter <= t_exit) & (t >= 0.0),
                          p + n_sph)

        best = jax.lax.fori_loop(0, n_box, box_body, best, unroll=_unroll(n_box))

        # tri rows: v0(3) v1(3) v2(3) gn(3) | r g b mode  (16 blocks)
        def tri_body(p, best):
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
            return upd_if(best, t, ok, p + n_sph + n_box)

        best = jax.lax.fori_loop(0, n_tri, tri_body, best, unroll=_unroll(n_tri))

        t_best, pid = best

        # ---- phase 2: winner attribute extraction by pid match. One
        # lane-replicated row select cascade per primitive, then ONE
        # normal recompute per class per bounce (instead of per candidate).
        one = jnp.ones(shape, jnp.float32)
        wr, wg, wb = one, one, one
        # response mode: 2 = emissive, 1 = mirror continuation, 0 = keep
        # (one row instead of separate light/cont rows: one fewer pick
        # select per candidate per bounce)
        w_mode = zero
        # sphere winner params
        s_cx, s_cy, s_cz, s_ir = zero, zero, zero, zero
        # box winner params
        b_cx, b_cy, b_cz = zero, zero, zero
        b_hx, b_hy, b_hz = zero, zero, zero
        # triangle winner normal
        t_nx, t_ny, t_nz = zero, zero, zero

        # winner roughness rides the pick carries only for rough scenes
        w_rough = zero

        def sph_pick(p, acc):
            wr, wg, wb, wm, cx, cy, cz, ir = acc[:8]
            m = pid == p
            out = (jnp.where(m, _row(sph_ref, 5 * s_pad, p), wr),
                   jnp.where(m, _row(sph_ref, 6 * s_pad, p), wg),
                   jnp.where(m, _row(sph_ref, 7 * s_pad, p), wb),
                   jnp.where(m, _row(sph_ref, 8 * s_pad, p), wm),
                   jnp.where(m, _row(sph_ref, 0, p), cx),
                   jnp.where(m, _row(sph_ref, s_pad, p), cy),
                   jnp.where(m, _row(sph_ref, 2 * s_pad, p), cz),
                   jnp.where(m, _row(sph_ref, 4 * s_pad, p), ir))
            if has_rough:
                out += (jnp.where(
                    m, _row(sph_ref, rows_ix.s_rough * s_pad, p), acc[8]),)
            return out

        sph_pick_acc = (wr, wg, wb, w_mode, s_cx, s_cy, s_cz, s_ir)
        if has_rough:
            sph_pick_acc += (w_rough,)
        if first and dyn_short:
            # the phase-1 winner is always shortlist-included, so the pick
            # scan may run over the same compact id list
            sph_pick_acc = jax.lax.fori_loop(
                0, tab_ref[tab_row, 0],
                lambda j, acc: sph_pick(tab_id(j), acc), sph_pick_acc)
        elif short:
            # the phase-1 winner is always mask-included, so the pick scan
            # may skip culled spheres the same way
            for p in range(n_sph):
                bit = (sid_ref[blk, p // 32] >> (p % 32)) & 1
                sph_pick_acc = jax.lax.cond(
                    bit > 0, lambda acc, p=p: sph_pick(p, acc),
                    lambda acc: acc, sph_pick_acc)
        else:
            sph_pick_acc = jax.lax.fori_loop(0, n_sph, sph_pick,
                                             sph_pick_acc,
                                             unroll=_unroll(n_sph))
        (wr, wg, wb, w_mode, s_cx, s_cy, s_cz, s_ir) = sph_pick_acc[:8]
        if has_rough:
            w_rough = sph_pick_acc[8]

        def box_pick(p, acc):
            wr, wg, wb, wm, cx, cy, cz, hx, hy, hz = acc[:10]
            m = pid == p + n_sph
            out = (jnp.where(m, _row(box_ref, 6 * b_pad, p), wr),
                   jnp.where(m, _row(box_ref, 7 * b_pad, p), wg),
                   jnp.where(m, _row(box_ref, 8 * b_pad, p), wb),
                   jnp.where(m, _row(box_ref, 9 * b_pad, p), wm),
                   jnp.where(m, _row(box_ref, 0, p), cx),
                   jnp.where(m, _row(box_ref, b_pad, p), cy),
                   jnp.where(m, _row(box_ref, 2 * b_pad, p), cz),
                   jnp.where(m, _row(box_ref, 3 * b_pad, p), hx),
                   jnp.where(m, _row(box_ref, 4 * b_pad, p), hy),
                   jnp.where(m, _row(box_ref, 5 * b_pad, p), hz))
            if has_rough:
                out += (jnp.where(
                    m, _row(box_ref, rows_ix.b_rough * b_pad, p), acc[10]),)
            return out

        box_pick_acc = (wr, wg, wb, w_mode, b_cx, b_cy, b_cz,
                        b_hx, b_hy, b_hz)
        if has_rough:
            box_pick_acc += (w_rough,)
        box_pick_acc = jax.lax.fori_loop(0, n_box, box_pick, box_pick_acc,
                                         unroll=_unroll(n_box))
        (wr, wg, wb, w_mode, b_cx, b_cy, b_cz, b_hx, b_hy, b_hz
         ) = box_pick_acc[:10]
        if has_rough:
            w_rough = box_pick_acc[10]

        def tri_pick(p, acc):
            wr, wg, wb, wm, gx, gy, gz = acc[:7]
            m = pid == p + n_sph + n_box
            out = (jnp.where(m, _row(tri_ref, 12 * r_pad, p), wr),
                   jnp.where(m, _row(tri_ref, 13 * r_pad, p), wg),
                   jnp.where(m, _row(tri_ref, 14 * r_pad, p), wb),
                   jnp.where(m, _row(tri_ref, 15 * r_pad, p), wm),
                   jnp.where(m, _row(tri_ref, 9 * r_pad, p), gx),
                   jnp.where(m, _row(tri_ref, 10 * r_pad, p), gy),
                   jnp.where(m, _row(tri_ref, 11 * r_pad, p), gz))
            if has_rough:
                out += (jnp.where(
                    m, _row(tri_ref, rows_ix.t_rough * r_pad, p), acc[7]),)
            return out

        tri_pick_acc = (wr, wg, wb, w_mode, t_nx, t_ny, t_nz)
        if has_rough:
            tri_pick_acc += (w_rough,)
        tri_pick_acc = jax.lax.fori_loop(0, n_tri, tri_pick, tri_pick_acc,
                                         unroll=_unroll(n_tri))
        (wr, wg, wb, w_mode, t_nx, t_ny, t_nz) = tri_pick_acc[:7]
        if has_rough:
            w_rough = tri_pick_acc[7]

        # ---- winner normal, once per bounce --------------------------------
        is_sph = (pid >= 0) & (pid < n_sph)
        is_box = (pid >= n_sph) & (pid < n_sph + n_box)
        is_tri = pid >= n_sph + n_box
        t_fin = jnp.where(t_best < _INF, t_best, 0.0)
        hx_ = ox + t_fin * dx
        hy_ = oy + t_fin * dy
        hz_ = oz + t_fin * dz
        # sphere: (hit - c) / r, flipped against the incoming direction
        nx = (hx_ - s_cx) * s_ir
        ny = (hy_ - s_cy) * s_ir
        nz = (hz_ - s_cz) * s_ir
        if n_box:
            # box: recompute the slab test for the single winner
            tax = (b_cx - b_hx - ox) * ix
            tbx = (b_cx + b_hx - ox) * ix
            tay = (b_cy - b_hy - oy) * iy
            tby = (b_cy + b_hy - oy) * iy
            taz = (b_cz - b_hz - oz) * iz
            tbz = (b_cz + b_hz - oz) * iz
            t0x, t1x = jnp.minimum(tax, tbx), jnp.maximum(tax, tbx)
            t0y, t1y = jnp.minimum(tay, tby), jnp.maximum(tay, tby)
            t0z, t1z = jnp.minimum(taz, tbz), jnp.maximum(taz, tbz)
            t_enter = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
            t_exit = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
            # winning slab axis -> face normal -sign(d_axis) e_axis with
            # x > y > z tie order (ops/intersect.box_surface argmax/argmin)
            # boolean logic only: Mosaic cannot select between i1 vectors
            entering = t_enter >= 0.0
            wx = ((entering & (t0x == t_enter))
                  | (~entering & (t1x == t_exit)))
            wy = ((entering & (t0y == t_enter))
                  | (~entering & (t1y == t_exit))) & ~wx
            wz = ~wx & ~wy
            sx = jnp.where(dx < 0.0, 1.0, -1.0)
            sy = jnp.where(dy < 0.0, 1.0, -1.0)
            sz = jnp.where(dz < 0.0, 1.0, -1.0)
            nx = jnp.where(is_box, jnp.where(wx, sx, 0.0), nx)
            ny = jnp.where(is_box, jnp.where(wy, sy, 0.0), ny)
            nz = jnp.where(is_box, jnp.where(wz, sz, 0.0), nz)
        if n_tri:
            nx = jnp.where(is_tri, t_nx, nx)
            ny = jnp.where(is_tri, t_ny, ny)
            nz = jnp.where(is_tri, t_nz, nz)
        # flip toward the incoming ray (sphere inside view / tri winding);
        # box normals already face against the ray by construction.
        do_flip = is_sph | is_tri
        flip = jnp.where(do_flip & (dx * nx + dy * ny + dz * nz > 0.0),
                         -1.0, 1.0)
        nx, ny, nz = nx * flip, ny * flip, nz * flip
        # normalize: (hit - c) * inv_r inherits hit-t rounding amplified by
        # 1/r; unnormalized normals drift reflected |d| (~1e-4 on small
        # spheres), breaking the unit_d quadratic at grazing incidence
        n_inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                           1e-20))
        nx, ny, nz = nx * n_inv, ny * n_inv, nz * n_inv
        hit = alive & (pid >= 0)
        # mode decode: 0 keep, 1 mirror continuation, 2 emissive,
        # 3 transmission continuation (mutually exclusive by packing)
        lit = hit & (w_mode > 1.5) & (w_mode < 2.5)
        cont_m = hit & (w_mode > 0.5) & (w_mode < 1.5)
        cont_t = hit & (w_mode > 2.5) if has_trans else jnp.zeros(shape, bool)
        keep = hit & ~lit & ~cont_m & ~cont_t
        miss = alive & (pid < 0)

        col_r = jnp.where(hit, col_r * wr,
                          jnp.where(miss, col_r * sky_r, col_r))
        col_g = jnp.where(hit, col_g * wg,
                          jnp.where(miss, col_g * sky_g, col_g))
        col_b = jnp.where(hit, col_b * wb,
                          jnp.where(miss, col_b * sky_b, col_b))
        path = jnp.where(hit, path + t_best, path)
        status = jnp.where(lit, _LIGHT,
                           jnp.where(keep, _KEEP,
                                     jnp.where(miss, _MISS, status)))

        # mirror continuation: reflect + eps-advance (raytracer.ts:231-236);
        # the pure reflection is kept for the TIR fallback before any
        # roughness scatter is applied (refract's TIR branch reflects the
        # UNscattered direction, ops/vecmath.refract / raytracer.ts:147-149)
        d_dot_n = dx * nx + dy * ny + dz * nz
        rdx = dx - 2.0 * d_dot_n * nx
        rdy = dy - 2.0 * d_dot_n * ny
        rdz = dz - 2.0 * d_dot_n * nz
        if has_rough:
            # same draw coordinates and formulas as the XLA wavefront path
            # (ops/sampling counter hash) — parity at fused tolerance
            sdx, sdy, sdz = sampling.scatter_direction_xyz(
                seed, rid, b_idx, rdx, rdy, rdz, nx, ny, nz, w_rough)
        else:
            sdx, sdy, sdz = rdx, rdy, rdz

        if has_trans:
            # eps-advance along the OLD direction (raytracer.ts:240-241),
            # then the entity_at_pos innermost-containment scan for the
            # refraction target substance (ops/trace.substance_refr_at)
            ax_ = hx_ + EPS_ADVANCE * dx
            ay_ = hy_ + EPS_ADVANCE * dy
            az_ = hz_ + EPS_ADVANCE * dz
            a_dot_a = ax_ * ax_ + ay_ * ay_ + az_ * az_
            inf_t = jnp.full(shape, _INF, jnp.float32)
            any_in = jnp.zeros(shape, bool)

            def sub_sph(p, acc):
                vol_min, refr_sel, any_in = acc
                cx = _row(sph_ref, 0, p)
                cy = _row(sph_ref, s_pad, p)
                cz = _row(sph_ref, 2 * s_pad, p)
                ccmr = _row(sph_ref, 3 * s_pad, p)
                # |a-c|^2 <= r^2  <=>  a.a - 2 a.c + (c.c - r^2) <= 0
                q = a_dot_a - 2.0 * (ax_ * cx + ay_ * cy + az_ * cz) + ccmr
                inside = q <= 0.0
                vol = _row(sph_ref, rows_ix.s_vol * s_pad, p)
                # strict < keeps the FIRST prim on volume ties, matching
                # the XLA path's argmin-first semantics
                u = inside & (vol < vol_min)
                rf = _row(sph_ref, rows_ix.s_refr * s_pad, p)
                return (jnp.where(u, vol, vol_min),
                        jnp.where(u, rf, refr_sel),
                        any_in | inside)

            def sub_box(p, acc):
                vol_min, refr_sel, any_in = acc
                cx = _row(box_ref, 0, p)
                cy = _row(box_ref, b_pad, p)
                cz = _row(box_ref, 2 * b_pad, p)
                hx = _row(box_ref, 3 * b_pad, p)
                hy = _row(box_ref, 4 * b_pad, p)
                hz = _row(box_ref, 5 * b_pad, p)
                inside = ((jnp.abs(ax_ - cx) <= hx)
                          & (jnp.abs(ay_ - cy) <= hy)
                          & (jnp.abs(az_ - cz) <= hz))
                vol = _row(box_ref, rows_ix.b_vol * b_pad, p)
                u = inside & (vol < vol_min)
                rf = _row(box_ref, rows_ix.b_refr * b_pad, p)
                return (jnp.where(u, vol, vol_min),
                        jnp.where(u, rf, refr_sel),
                        any_in | inside)

            acc = (inf_t, zero, any_in)
            acc = jax.lax.fori_loop(0, n_sph, sub_sph, acc,
                                    unroll=_unroll(n_sph))
            acc = jax.lax.fori_loop(0, n_box, sub_box, acc,
                                    unroll=_unroll(n_box))
            _vol, refr_sel, any_in = acc
            # innermost defined substance -> its index; undefined -> keep
            # current, no refraction; none containing -> scene default
            defined = refr_sel >= 0.0
            target = jnp.where(any_in, jnp.where(defined, refr_sel, refr),
                               jnp.broadcast_to(refr_def, shape))
            do_refract = (~any_in) | defined
            eta = refr / jnp.maximum(target, 1e-6)
            # Snell + TIR (ops/vecmath.refract, term-for-term)
            c1 = -(dx * nx + dy * ny + dz * nz)
            s2 = eta * eta * (1.0 - c1 * c1)
            inside_ = jnp.maximum(1.0 - s2, 0.0)
            pos = inside_ > 0.0
            c2 = jnp.sqrt(jnp.where(pos, inside_, 1.0)) * pos
            k = eta * c1 - c2
            tir = s2 > 1.0
            fdx = jnp.where(tir, rdx, eta * dx + k * nx)
            fdy = jnp.where(tir, rdy, eta * dy + k * ny)
            fdz = jnp.where(tir, rdz, eta * dz + k * nz)
            tdx = jnp.where(do_refract, fdx, dx)
            tdy = jnp.where(do_refract, fdy, dy)
            tdz = jnp.where(do_refract, fdz, dz)
            new_refr = jnp.where(do_refract, target, refr)
            ox = jnp.where(cont_t, ax_, ox)
            oy = jnp.where(cont_t, ay_, oy)
            oz = jnp.where(cont_t, az_, oz)
            dx_t, dy_t, dz_t = tdx, tdy, tdz
            refr = jnp.where(cont_t, new_refr, refr)
        else:
            dx_t, dy_t, dz_t = dx, dy, dz

        # hit point (hx_, hy_, hz_) was computed with the normals above
        ox = jnp.where(cont_m, hx_ + EPS_ADVANCE * sdx, ox)
        oy = jnp.where(cont_m, hy_ + EPS_ADVANCE * sdy, oy)
        oz = jnp.where(cont_m, hz_ + EPS_ADVANCE * sdz, oz)
        dx = jnp.where(cont_t, dx_t, jnp.where(cont_m, sdx, dx))
        dy = jnp.where(cont_t, dy_t, jnp.where(cont_m, sdy, dy))
        dz = jnp.where(cont_t, dz_t, jnp.where(cont_m, sdz, dz))
        out = (ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path, status)
        return out + ((refr,) if has_trans else ())

    state = (ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path, status)
    if has_trans:
        state = state + (refr,)
    for _bounce in range(refmax):
        if _bounce == 0:
            # bounce 0 of a shared-origin wavefront only needs the spheres
            # whose bounding cone test passed host-side (frustum culling);
            # later bounces have divergent origins -> full scan.
            state = _one_bounce(state, use_short, True, 0)
        else:
            # whole-tile early-out: spheres are localized in the image, so
            # after bounce 0 many ray tiles have zero continuing rays — skip
            # the entire candidate scan for those (the reference's per-ray
            # termination check, raytracer.ts:168, at tile granularity).
            any_alive = jnp.any(state[10] == _ALIVE)
            state = jax.lax.cond(
                any_alive,
                lambda s, b=_bounce: _one_bounce(s, False, False, b),
                lambda s: s, state)
    (ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path,
     status) = state[:11]

    # refmax exhaustion -> black (raytracer.ts:256-263)
    exhausted = status == _ALIVE
    col_r = jnp.where(exhausted, 0.0, col_r)
    col_g = jnp.where(exhausted, 0.0, col_g)
    col_b = jnp.where(exhausted, 0.0, col_b)
    status = jnp.where(exhausted, _EXHAUST, status)

    # ISL for light hits (raytracer.ts:273-275)
    isl = 1.0 / (JS_EPSILON + (path * atten) ** 2)
    lit = status == _LIGHT
    col_r = jnp.where(lit, col_r * isl, col_r)
    col_g = jnp.where(lit, col_g * isl, col_g)
    col_b = jnp.where(lit, col_b * isl, col_b)

    cr_ref[:, :] = col_r
    cg_ref[:, :] = col_g
    cb_ref[:, :] = col_b
    st_ref[:, :] = status


def _trace_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                  rid_ref, sph_ref, box_ref, tri_ref, sky_ref, sid_ref,
                  aux_i_ref, aux_f_ref,
                  cr_ref, cg_ref, cb_ref, st_ref,
                  *, n_sph, n_box, n_tri, s_pad, b_pad, r_pad,
                  refmax, atten, use_short, ext):
    """Wavefront entry: per-ray origins/directions from HBM columns.

    ``rid_ref`` carries the caller's global ray ids (the RNG stream
    coordinate); ``aux_i_ref``/``aux_f_ref`` are SMEM scalar rows
    ([seed] / [refr0, refr_def]) the extended class needs (_trace_core).
    """
    has_rough, has_trans = ext[0], ext[1]
    seed = aux_i_ref[0, 0].astype(jnp.uint32) if has_rough else None
    if has_trans:
        refr0 = aux_f_ref[0, 0]
        refr_def = aux_f_ref[0, 1]
    else:
        refr0 = refr_def = None
    _trace_core(ox_ref[:], oy_ref[:], oz_ref[:],
                dx_ref[:], dy_ref[:], dz_ref[:],
                sph_ref, box_ref, tri_ref, sky_ref, sid_ref,
                cr_ref, cg_ref, cb_ref, st_ref,
                n_sph=n_sph, n_box=n_box, n_tri=n_tri,
                s_pad=s_pad, b_pad=b_pad, r_pad=r_pad,
                refmax=refmax, atten=atten, use_short=use_short,
                unit_d=False, has_c0=False,
                ext=ext, rid=rid_ref[:] if has_rough else None,
                seed=seed, refr0=refr0, refr_def=refr_def)


# SMEM camera layout for the frame kernel (all f32):
# 0-2 pos, 3-5 front, 6-8 left, 9-11 up,
# 12 step_h (fov_h/w), 13 step_v (fov_v/h), 14 off_h (w//2), 15 off_v (h//2),
# 16 refr0 (camera-substance refractive index), 17 default_refr
_CAM_SLOTS = 18

#: sphere count at which the per-tile shortlist engages in the frame kernel
#: (below it the fully-unrolled static scan is cheaper than a dynamic loop)
FRAME_SHORT_MIN = int(os.environ.get("RT_FRAME_SHORT_MIN", "12"))


def _trace_frame_kernel(cam_ref, sph_ref, box_ref, tri_ref, sky_ref, tab_ref,
                        aux_ref,
                        cr_ref, cg_ref, cb_ref, st_ref,
                        *, n_sph, n_box, n_tri, s_pad, b_pad, r_pad,
                        refmax, atten, dyn_short, ext):
    """Frame entry: rays generated in-register from the camera pose.

    The grid is 2-D over (row-tile, column-tile) of the image: program
    (by, bx) renders pixels y in [by*FUSE_SUB, ...), x in [bx*128, ...).
    2-D tiles (vs. consecutive-index strips) give each program a narrow
    direction cone, which is what makes the per-tile sphere shortlist
    (``dyn_short``) and the bounce>=1 dead-tile skip effective. The
    direction is the closed-form equiangular map of
    models/camera.pixel_rays, term-for-term.
    """
    by = pl.program_id(0)
    bx = pl.program_id(1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (FUSE_SUB, SP_LANE), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (FUSE_SUB, SP_LANE), 1)
    xi = bx * SP_LANE + lane
    yi = by * FUSE_SUB + sub
    x = xi.astype(jnp.float32)
    y = yi.astype(jnp.float32)
    th_h = (x - cam_ref[0, 14]) * cam_ref[0, 12]
    th_v = (y - cam_ref[0, 15]) * cam_ref[0, 13]
    ch, sh = jnp.cos(th_h), jnp.sin(th_h)
    cv, sv = jnp.cos(th_v), jnp.sin(th_v)
    a1, a2 = ch * cv, ch * sv
    dx = a1 * cam_ref[0, 3] + a2 * cam_ref[0, 9] + sh * cam_ref[0, 6]
    dy = a1 * cam_ref[0, 4] + a2 * cam_ref[0, 10] + sh * cam_ref[0, 7]
    dz = a1 * cam_ref[0, 5] + a2 * cam_ref[0, 11] + sh * cam_ref[0, 8]
    has_rough, has_trans = ext[0], ext[1]
    if has_rough:
        # RNG stream coordinate = (pixel id) * spp + sample, identical to
        # render.render_rays' sid derivation for the XLA path
        seed = aux_ref[0, 0].astype(jnp.uint32)
        rid = (yi * aux_ref[0, 1] + xi) * aux_ref[0, 2] + aux_ref[0, 3]
    else:
        seed = rid = None
    _trace_core(cam_ref[0, 0], cam_ref[0, 1], cam_ref[0, 2], dx, dy, dz,
                sph_ref, box_ref, tri_ref, sky_ref, None,
                cr_ref, cg_ref, cb_ref, st_ref,
                n_sph=n_sph, n_box=n_box, n_tri=n_tri,
                s_pad=s_pad, b_pad=b_pad, r_pad=r_pad,
                refmax=refmax, atten=atten, use_short=False,
                unit_d=True, has_c0=True,
                tab_ref=tab_ref, dyn_short=dyn_short,
                tab_row=by * pl.num_programs(1) + bx,
                ext=ext, rid=rid, seed=seed,
                refr0=cam_ref[0, 16] if has_trans else None,
                refr_def=cam_ref[0, 17] if has_trans else None)


@functools.partial(jax.jit,
                   static_argnames=("meta", "refmax", "atten", "use_short",
                                    "ext", "interpret"))
def _trace_call(cols, rid, sph, box, tri, sky, sid, aux_i, aux_f, meta,
                refmax, atten, use_short, ext, interpret=False):
    n_sph, n_box, n_tri, s_pad, b_pad, r_pad = meta
    rows = cols[0].shape[0]
    grid = (rows // FUSE_SUB,)
    kern = functools.partial(_trace_kernel, n_sph=n_sph, n_box=n_box,
                             n_tri=n_tri, s_pad=s_pad, b_pad=b_pad,
                             r_pad=r_pad, refmax=refmax, atten=atten,
                             use_short=use_short, ext=ext)
    ray_spec = pl.BlockSpec((FUSE_SUB, SP_LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    # SMEM blocks must match full array dims; programs index rows by
    # pl.program_id instead of a blocked index_map
    smem = lambda arr: pl.BlockSpec(arr.shape, lambda i: (0, 0),
                                    memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[ray_spec] * 7 + [full(sph), full(box), full(tri),
                                   full(sky), smem(sid), smem(aux_i),
                                   smem(aux_f)],
        out_specs=[ray_spec, ray_spec, ray_spec, ray_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, SP_LANE), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((rows, SP_LANE), jnp.int32)],
        interpret=interpret,
    )(*cols, rid, sph, box, tri, sky, sid, aux_i, aux_f)


@functools.partial(jax.jit,
                   static_argnames=("meta", "refmax", "atten", "nby", "nbx",
                                    "dyn_short", "ext", "interpret"))
def _trace_frame_call(cam, sph, box, tri, sky, tab, aux, meta, refmax, atten,
                      nby, nbx, dyn_short, ext, interpret=False):
    n_sph, n_box, n_tri, s_pad, b_pad, r_pad = meta
    kern = functools.partial(_trace_frame_kernel, n_sph=n_sph, n_box=n_box,
                             n_tri=n_tri, s_pad=s_pad, b_pad=b_pad,
                             r_pad=r_pad, refmax=refmax, atten=atten,
                             dyn_short=dyn_short, ext=ext)
    tile_spec = pl.BlockSpec((FUSE_SUB, SP_LANE), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(arr.shape, lambda i, j: (0, 0),
                                    memory_space=pltpu.VMEM)
    cam_spec = pl.BlockSpec(cam.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    # per-tile shortlist rows (row-major over (by, bx)): the WHOLE table as
    # one SMEM block — TPU lowering rejects (1, W) row blocks (sublane dim
    # must be a multiple of 8 or full), so each program scalar-indexes its
    # own row instead
    tab_spec = pl.BlockSpec(tab.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    aux_spec = pl.BlockSpec(aux.shape, lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)
    h_pad, w_pad = nby * FUSE_SUB, nbx * SP_LANE
    return pl.pallas_call(
        kern,
        grid=(nby, nbx),
        in_specs=[cam_spec, full(sph), full(box), full(tri), full(sky),
                  tab_spec, aux_spec],
        out_specs=[tile_spec, tile_spec, tile_spec, tile_spec],
        out_shape=[jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32)] * 3
        + [jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32)],
        interpret=interpret,
    )(cam, sph, box, tri, sky, tab, aux)


#: sphere count at which bounce-0 frustum shortlists engage. Measured on a
#: v5e: at <=50 spheres the per-frame XLA cone build + dynamic-index reads
#: cost more than the culled candidates save (4.50 vs 3.85 ms sustained), so
#: the default keeps the fully-unrolled scan; set RT_SHORTLIST_MIN to opt in
#: for sphere-heavy scenes.
SHORTLIST_MIN_SPHERES = int(os.environ.get("RT_SHORTLIST_MIN", "4096"))


def _sphere_shortlists(org: Array, dir: Array, centers: Array, radii: Array,
                       nblk: int, s_pad: int) -> Tuple[Array, Array]:
    """Conservative per-ray-block sphere include masks, bit-packed ->
    (words [nblk, ceil(s_pad/32)] int32, counts [nblk, 1] int32).

    Each grid program traces a block of consecutive rays; bound the block by
    a direction cone (axis = mean dir, half-angle theta from the worst ray)
    around an origin ball (center o0, radius ro), then keep sphere ``s`` iff
    the ball-inflated sphere intersects the cone:

        dist <= r + ro                    (origin ball inside the sphere), or
        cos(beta) >= cos(alpha + theta)   (angular overlap test)

    with sin(alpha) = (r+ro)/dist, beta = angle(center - o0, axis). Blocks
    whose direction spread is too wide for the cone identity (cos theta
    small) conservatively keep every sphere. This is exact culling — a
    rejected sphere provably cannot be hit by any ray of the block — so the
    fused kernel stays bit-identical to the full scan.
    """
    dn = dir / jnp.maximum(
        jnp.linalg.norm(dir, axis=-1, keepdims=True), 1e-20)
    db = dn.reshape(nblk, -1, 3)
    ob = org.reshape(nblk, -1, 3)
    axis = jnp.mean(db, axis=1)
    axis = axis / jnp.maximum(
        jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-20)
    cos_t = jnp.min(jnp.einsum("brk,bk->br", db, axis,
                               precision=jax.lax.Precision.HIGHEST), axis=1)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    o0 = jnp.mean(ob, axis=1)                                    # [nblk, 3]
    ro = jnp.max(jnp.linalg.norm(ob - o0[:, None], axis=-1), axis=1)
    v = centers[None, :, :] - o0[:, None, :]                     # [nblk, S, 3]
    dist = jnp.linalg.norm(v, axis=-1)
    rr = radii[None, :] + ro[:, None]
    inside = dist <= rr * (1.0 + 1e-5) + 1e-7
    sin_a = jnp.clip(rr / jnp.maximum(dist, 1e-20), 0.0, 1.0)
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
    cos_b = jnp.einsum("bsk,bk->bs", v, axis,
                       precision=jax.lax.Precision.HIGHEST
                       ) / jnp.maximum(dist, 1e-20)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    cos_at = cos_a * cos_t[:, None] - sin_a * sin_t[:, None]
    include = inside | (cos_b >= cos_at - 1e-5)
    # wide direction spread: cone test unreliable -> keep all
    include = include | (cos_t[:, None] < 0.25)
    counts = jnp.sum(include, axis=1).astype(jnp.int32)[:, None]
    # bit-pack: word w of block b holds spheres 32w..32w+31
    n_words = -(-s_pad // 32)
    inc = jnp.zeros((nblk, n_words * 32), bool)
    inc = inc.at[:, : include.shape[1]].set(include)
    bits = inc.reshape(nblk, n_words, 32).astype(jnp.int32)
    words = jnp.sum(bits << jnp.arange(32, dtype=jnp.int32), axis=-1,
                    dtype=jnp.int32)
    return words, counts


def _pack_prims(scene: Scene, cam_pos: Array | None = None):
    """Lane-replicated primitive tables -> (sph, box, tri, sky, meta, ext).

    When ``cam_pos`` is given the sphere table gets a 10th row block (index
    9) with the bounce-0 quadratic constant c0 = o.o - 2 o.c + (c.c - r^2)
    folded in (the frame kernel's ``has_c0`` path).

    Extended-class rows are APPENDED after the base layout so the
    restricted-class row indices never move: per-class material roughness
    (``has_rough``), and for transmission the per-prim substance refractive
    index (-1.0 = undefined substance, raytracer.ts:243-248) plus the
    enclosed volume for the innermost-containment rule (spheres and boxes
    only — triangles have no interior). ``ext`` is the static
    ``(has_rough, has_trans, ExtRows)`` descriptor for ``_trace_core``.
    """
    def pad8(x):
        return -(-max(x, 1) // 8) * 8

    s_pad, b_pad, r_pad = (pad8(scene.n_spheres), pad8(scene.n_boxes),
                           pad8(scene.n_tris))

    # per-prim shading attributes in global prim order; response mode packs
    # the emissive/continuation flags into one row (2 = light, 1 = mirror
    # REFLECTION continuation, 3 = transmission continuation, 0 = keep —
    # mutually exclusive: light wins, and a material has ONE response type)
    prim_rgb = scene.textures.solid_rgb[scene.prim_texture]      # [P, 3]
    mat = scene.materials
    not_light = mat.light[scene.prim_material] == False  # noqa: E712
    m_light = mat.light[scene.prim_material].astype(jnp.float32)
    m_cont = (mat.mirror[scene.prim_material]
              & (mat.response[scene.prim_material]
                 == int(ResponseType.REFLECTION))
              & not_light).astype(jnp.float32)
    m_trans = ((mat.response[scene.prim_material]
                == int(ResponseType.TRANSMISSION))
               & not_light).astype(jnp.float32)
    m_mode = 2.0 * m_light + m_cont
    if scene.has_transmission:
        m_mode = m_mode + 3.0 * m_trans

    def attr_slice(lo, hi):
        return (prim_rgb[lo:hi, 0], prim_rgb[lo:hi, 1], prim_rgb[lo:hi, 2],
                m_mode[lo:hi])

    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes

    c_dot_c = jnp.sum(scene.sphere_center ** 2, axis=-1)
    ccmr = c_dot_c - scene.sphere_radius ** 2
    inv_r = 1.0 / jnp.maximum(scene.sphere_radius, 1e-20)
    sph_cols = [scene.sphere_center[:, 0], scene.sphere_center[:, 1],
                scene.sphere_center[:, 2], ccmr, inv_r, *attr_slice(0, s_end)]
    if cam_pos is not None:
        o = cam_pos
        o_dot_o = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]
        c0 = o_dot_o - 2.0 * (scene.sphere_center[:, 0] * o[0]
                              + scene.sphere_center[:, 1] * o[1]
                              + scene.sphere_center[:, 2] * o[2]) + ccmr
        sph_cols.append(c0)
    box_cols = [scene.box_center[:, 0], scene.box_center[:, 1],
                scene.box_center[:, 2], scene.box_half[:, 0],
                scene.box_half[:, 1], scene.box_half[:, 2],
                *attr_slice(s_end, b_end)]
    e1 = scene.tri_v1 - scene.tri_v0
    e2 = scene.tri_v2 - scene.tri_v0
    gn = jnp.cross(e1, e2)
    gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    tri_cols = [scene.tri_v0[:, 0], scene.tri_v0[:, 1], scene.tri_v0[:, 2],
                scene.tri_v1[:, 0], scene.tri_v1[:, 1], scene.tri_v1[:, 2],
                scene.tri_v2[:, 0], scene.tri_v2[:, 1], scene.tri_v2[:, 2],
                gn[:, 0], gn[:, 1], gn[:, 2],
                *attr_slice(b_end, scene.n_prims)]

    rows = {}
    if scene.has_rough:
        rough = mat.roughness[scene.prim_material]
        rows["s_rough"] = len(sph_cols)
        sph_cols.append(rough[0:s_end])
        rows["b_rough"] = len(box_cols)
        box_cols.append(rough[s_end:b_end])
        rows["t_rough"] = len(tri_cols)
        tri_cols.append(rough[b_end:scene.n_prims])
    if scene.has_transmission:
        sub_id = scene.prim_substance
        sub_refr = jnp.where(
            sub_id >= 0,
            scene.sub_refr[jnp.clip(sub_id, 0, scene.sub_refr.shape[0] - 1)],
            -1.0)
        s_vol = (4.0 / 3.0) * jnp.pi * scene.sphere_radius ** 3
        b_vol = jnp.prod(2.0 * scene.box_half, axis=-1)
        rows["s_refr"] = len(sph_cols)
        sph_cols.append(sub_refr[0:s_end])
        rows["s_vol"] = len(sph_cols)
        sph_cols.append(s_vol)
        rows["b_refr"] = len(box_cols)
        box_cols.append(sub_refr[s_end:b_end])
        rows["b_vol"] = len(box_cols)
        box_cols.append(b_vol)

    sph = pack_replicated(sph_cols, s_pad)
    box = pack_replicated(box_cols, b_pad)
    tri = pack_replicated(tri_cols, r_pad)
    sky_rgb = scene.textures.solid_rgb[scene.sky_tex]
    sky = pack_replicated([sky_rgb[0:1], sky_rgb[1:2], sky_rgb[2:3]], 1)
    meta = (scene.n_spheres, scene.n_boxes, scene.n_tris,
            s_pad, b_pad, r_pad)
    ext = (bool(scene.has_rough), bool(scene.has_transmission),
           ExtRows(**rows))
    return sph, box, tri, sky, meta, ext


def trace_rays_fused(scene: Scene, cfg: RenderConfig, org: Array, dir: Array,
                     key: Array | None = None, ray_id: Array | None = None,
                     start_refr: Array | None = None,
                     interpret: bool | None = None
                     ) -> Tuple[Array, Array]:
    """Fused trace -> (color [N, 3], status [N]).

    ``key``/``ray_id`` seed the in-kernel counter RNG for rough scenes
    (identical streams to the XLA path); ``start_refr`` is the camera
    substance scalar for transmission scenes (defaults to the scene
    default — callers should pass render.start_substance's result).

    Caller must check :func:`supports`. Matches ops/trace.trace_rays colors
    and statuses exactly for the restricted class.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = org.shape[0]
    quant = FUSE_SUB * SP_LANE
    n_pad = -(-n // quant) * quant
    if ray_id is None:
        ray_id = jnp.arange(n, dtype=jnp.int32)
    if n_pad != n:
        # edge-replicate (not constant-pad) so padded rays stay inside the
        # per-block culling cones; their outputs are sliced off below
        rep = (n_pad - n,)
        org = jnp.concatenate(
            [org, jnp.broadcast_to(org[-1], rep + (3,))], axis=0)
        dir = jnp.concatenate(
            [dir, jnp.broadcast_to(dir[-1], rep + (3,))], axis=0)
        ray_id = jnp.concatenate(
            [ray_id, jnp.broadcast_to(ray_id[-1], rep)], axis=0)
    cols = _ray_cols(org, dir, n_pad)
    rid = ray_id.reshape(-1, SP_LANE)

    sph, box, tri, sky, meta, ext = _pack_prims(scene)
    s_pad = meta[3]
    seed = (sampling.seed_from_key(
        key if key is not None else jax.random.key(0)).astype(jnp.int32)
        if ext[0] else jnp.int32(0))
    aux_i = jnp.broadcast_to(seed, (1, 8)).astype(jnp.int32)
    refr0 = (jnp.asarray(start_refr, jnp.float32)
             if start_refr is not None else scene.default_refr)
    aux_f = jnp.stack([refr0, scene.default_refr,
                       *([jnp.float32(0.0)] * 6)]).reshape(1, 8)

    nblk = n_pad // quant
    use_short = (scene.n_spheres >= SHORTLIST_MIN_SPHERES
                 and not os.environ.get("RT_NO_SHORTLIST"))
    if use_short:
        sid, _counts = _sphere_shortlists(
            org, dir, scene.sphere_center, scene.sphere_radius, nblk, s_pad)
    else:
        # dummy (never read in-kernel); keep it tiny — a [nblk, ...] zero
        # table would eat SMEM for nothing at small FUSE_SUB
        sid = jnp.zeros((1, 8), jnp.int32)
    cr, cg, cb, st = _trace_call(
        cols, rid, sph, box, tri, sky, sid, aux_i, aux_f, meta,
        int(cfg.refmax), float(cfg.distance_attenuation_factor), use_short,
        ext, interpret=interpret)
    color = jnp.stack([cr.reshape(-1)[:n], cg.reshape(-1)[:n],
                       cb.reshape(-1)[:n]], axis=-1)
    return color, st.reshape(-1)[:n]


def supports_frame(scene: Scene) -> bool:
    """Frame-kernel eligibility: fused class, and the host-side frustum
    shortlist (which needs materialized rays) not engaged."""
    return (supports(scene)
            and not (scene.n_spheres >= SHORTLIST_MIN_SPHERES
                     and not os.environ.get("RT_NO_SHORTLIST"))
            and not os.environ.get("RT_NO_FRAME_KERNEL"))


def _tile_shortlists(cam, nby: int, nbx: int, centers: Array,
                     radii: Array) -> Array:
    """Per-tile compact sphere id lists -> i32 [nby*nbx, 1 + ceil(S/2)].

    Row layout: word 0 = count, then ids ascending, two 16-bit ids per word
    (low half first). Entirely analytic — no per-ray tensors: tile (by, bx)
    covers th_h/th_v bands of one equiangular step per pixel, so every tile
    direction is within theta = half_h + half_v of the tile-center direction
    (each equiangular parameter step is a rotation by at most the step
    angle, so angular distance <= |dth_h| + |dth_v|). The band is clamped to
    the image's VALID pixel range: padding rays (x >= w or y >= h of a
    partial edge tile) may consult a shortlist that excludes spheres they
    would hit, but their outputs are sliced off by trace_frame_fused.
    Sphere s is kept iff the cone from the camera position with half-angle
    theta intersects it — exact culling: a rejected sphere cannot be hit by
    any forward ray of the tile's valid pixels, so the frame winner is
    unchanged.
    """
    step_h = cam.fov_h / cam.w
    step_v = cam.fov_v / cam.h
    x_lo = np.arange(nbx) * SP_LANE
    x_hi = np.minimum(cam.w - 1, x_lo + SP_LANE - 1)
    y_lo = np.arange(nby) * FUSE_SUB
    y_hi = np.minimum(cam.h - 1, y_lo + FUSE_SUB - 1)
    thc_h = jnp.asarray(((x_lo + x_hi) / 2 - (cam.w // 2)) * step_h,
                        jnp.float32)                             # [nbx]
    thc_v = jnp.asarray(((y_lo + y_hi) / 2 - (cam.h // 2)) * step_v,
                        jnp.float32)                             # [nby]
    ch, sh = jnp.cos(thc_h)[None, :], jnp.sin(thc_h)[None, :]   # [1, nbx]
    cv, sv = jnp.cos(thc_v)[:, None], jnp.sin(thc_v)[:, None]   # [nby, 1]
    axis = ((ch * cv)[..., None] * cam.front
            + (ch * sv)[..., None] * cam.up
            + jnp.broadcast_to(sh[..., None] * cam.left, (nby, nbx, 3)))
    axis = axis.reshape(-1, 3)                                   # [B, 3]
    theta = ((x_hi - x_lo)[None, :] / 2 * step_h
             + (y_hi - y_lo)[:, None] / 2 * step_v + 1e-4)       # [nby, nbx]
    cos_t = jnp.asarray(np.cos(theta).reshape(-1, 1), jnp.float32)
    sin_t = jnp.asarray(np.sin(theta).reshape(-1, 1), jnp.float32)

    v = centers[None, :, :] - cam.pos[None, None, :]             # [B, S, 3]
    dist = jnp.linalg.norm(v, axis=-1)
    inside = dist <= radii[None, :] * (1.0 + 1e-5) + 1e-7
    sin_a = jnp.clip(radii[None, :] / jnp.maximum(dist, 1e-20), 0.0, 1.0)
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
    cos_b = jnp.einsum("bsk,bk->bs", v, axis,
                       precision=jax.lax.Precision.HIGHEST
                       ) / jnp.maximum(dist, 1e-20)
    include = inside | (cos_b >= cos_a * cos_t - sin_a * sin_t - 1e-5)

    s = centers.shape[0]
    cnt = jnp.sum(include, axis=1).astype(jnp.int32)[:, None]    # [B, 1]
    # ascending included ids first, then a sentinel tail (never read)
    key = jnp.where(include, jnp.arange(s, dtype=jnp.int32)[None, :],
                    jnp.int32(1 << 20))
    ids = jnp.sort(key, axis=1) & 0xFFFF
    if s % 2:
        ids = jnp.concatenate(
            [ids, jnp.zeros((ids.shape[0], 1), jnp.int32)], axis=1)
    pairs = ids.reshape(ids.shape[0], -1, 2)
    words = pairs[:, :, 0] | (pairs[:, :, 1] << 16)
    return jnp.concatenate([cnt, words], axis=1)


def trace_frame_fused(scene: Scene, cfg: RenderConfig, cam,
                      key: Array | None = None, sample: Array | int = 0,
                      start_refr: Array | None = None,
                      interpret: bool | None = None) -> Array:
    """Whole-frame fused trace with in-kernel ray generation -> [h, w, 3].

    Caller must check :func:`supports_frame`. Rays never exist in HBM: the
    camera pose rides in as 18 SMEM scalars and each (row-tile, col-tile)
    program derives its pixel directions from iota (models/camera.pixel_rays
    closed form), consults its per-tile sphere shortlist for bounce 0, and
    writes its FUSE_SUB x 128 pixel tile of the output image directly.
    Matches the wavefront path to f32 ULP noise (unit-|d| specialization
    changes the rounding of the sphere quadratic), not bitwise.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nbx = -(-cam.w // SP_LANE)
    nby = -(-cam.h // FUSE_SUB)

    sph, box, tri, sky, meta, ext = _pack_prims(scene, cam_pos=cam.pos)
    refr0 = (jnp.asarray(start_refr, jnp.float32)
             if start_refr is not None else scene.default_refr)
    cam_arr = jnp.concatenate([
        cam.pos.astype(jnp.float32),
        cam.front.astype(jnp.float32),
        cam.left.astype(jnp.float32),
        cam.up.astype(jnp.float32),
        jnp.array([cam.fov_h / cam.w, cam.fov_v / cam.h,
                   float(cam.w // 2), float(cam.h // 2)], jnp.float32),
        refr0.reshape(1), scene.default_refr.reshape(1),
    ]).reshape(1, _CAM_SLOTS)
    seed = (sampling.seed_from_key(
        key if key is not None else jax.random.key(0)).astype(jnp.int32)
        if ext[0] else jnp.int32(0))
    aux = jnp.stack([seed, jnp.int32(cam.w), jnp.int32(cfg.spp),
                     jnp.asarray(sample, jnp.int32),
                     *([jnp.int32(0)] * 4)]).reshape(1, 8)
    dyn_short = (scene.n_spheres >= FRAME_SHORT_MIN
                 and not os.environ.get("RT_NO_FRAME_SHORT"))
    if dyn_short:
        tab = _tile_shortlists(cam, nby, nbx, scene.sphere_center,
                               scene.sphere_radius)
    else:
        tab = jnp.zeros((nby * nbx, 2), jnp.int32)
    cr, cg, cb, _st = _trace_frame_call(
        cam_arr, sph, box, tri, sky, tab, aux, meta, int(cfg.refmax),
        float(cfg.distance_attenuation_factor), nby, nbx, dyn_short,
        ext, interpret=interpret)
    img = jnp.stack([cr, cg, cb], axis=-1)
    if img.shape[0] != cam.h or img.shape[1] != cam.w:
        img = img[:cam.h, :cam.w]
    return img
