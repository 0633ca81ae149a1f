"""Fused path-replay forward + backward Pallas kernels.

The inverse-rendering steady state differentiates the search-free REPLAY
trace (ops/trace.trace_rays with ``pid_seq``): per bounce, one row gather +
analytic surface recompute + color product, whose cotangent is closed-form
(VERDICT r4 #1 — "Forward AND backward run as Pallas kernels"). The XLA
replay graph spends most of its time on HBM round trips between the one-hot
gather matmuls and the elementwise shading/VJP stages (measured r5:
forward-only 5.25 ms of the 14.4 ms value_and_grad at 1080p x 50 prims —
tools/bench_results_r5/exp_backward.jsonl). These kernels keep the whole
bounce chain AND its hand-derived reverse sweep in VMEM:

* :func:`_fwd_kernel` — the replay forward (colors out), the custom_vjp
  primal. Mirrors ops/trace._bounce term-for-term for the restricted class
  (solid textures/sky, REFLECTION-only, no roughness/transmission — the
  FUSED class minus the search).
* :func:`_bwd_kernel` — re-runs the forward sweep (registers, no residual
  traffic), then walks the bounce chain in reverse applying the analytic
  VJPs of sphere_surface / box_surface / reflect / color products / ISL
  (ops/intersect docstrings are the contract; the discrete selects
  — clamps, flips, slab argmax — contribute no cotangent, exactly as in
  the XLA path where they are piecewise-constant). Per-primitive cotangents
  (center, radius/half, rgb) accumulate via masked tile reductions into a
  revisited [P, 128] output block; ray cotangents (origin, direction)
  stream out per tile — they carry the camera-pose gradient.

Gradient semantics are identical to jax.value_and_grad over the XLA replay
(tests/test_replay_grad.py asserts allclose on every leaf): the nearest-hit
winners are SUPPLIED (pid_seq), and the search result is stop_gradient'ed
in the XLA path anyway (raytracer.ts:166-277 via the scalar oracle).

shard_map note: a custom_vjp has no varying-axes rule, so the automatic
psum for replicated-table cotangents cannot fire THROUGH it inside
shard_map (the r4 finding that rejected a custom_vjp for ops/gather), and
the kernel-internal jaxpr trips the vma checker in interpret mode.
Sharded callers therefore run the replay step under
``shard_map(..., check_vma=False)`` and psum the per-shard gradients
EXPLICITLY — the total is bitwise the same as the implicit psum of the
XLA path (optim/fit wires this; tests assert sharded == unsharded
losses across fit steps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EPS_ADVANCE, JS_EPSILON, RayStatus, RenderConfig, ResponseType
from ..models.scene import Scene
from .nearest_hit import SP_LANE, _ray_cols, _row, pack_replicated

Array = jnp.ndarray

#: ray-tile sublanes (rays per program = RG_SUB * 128)
RG_SUB = 32
#: primitive-count ceiling for the in-kernel pick/scatter scans; above it
#: the per-ray P-scan loses to the XLA one-hot MXU path (callers fall back)
SCAN_MAX_PRIMS = 192
#: sphere-count ceiling for the LISTED mode (per-tile compact id lists —
#: the cotangent accumulator block is [s_pad, 128] f32 resident VMEM)
LISTED_MAX_SPHERES = 16384
#: worst-tile distinct-sphere ceiling for the listed scans; lists longer
#: than this mean the tile pick degenerates toward the full-P scan
LISTED_MAX_LEN = 2048

_INF = float(np.inf)
_SLAB_EPS = 1e-12           # ops/intersect.SLAB_DIR_EPS
_ALIVE = int(RayStatus.ALIVE)
_LIGHT = int(RayStatus.LIGHT)
_KEEP = int(RayStatus.KEEP)
_MISS = int(RayStatus.MISS)

# sphere table rows: cx cy cz r | tr tg tb | mode
_SR = 8
# box table rows: cx cy cz hx hy hz | tr tg tb | mode
_BR = 10


def supports(scene: Scene, cfg: RenderConfig) -> bool:
    """Static eligibility: the FUSED restricted class (solid textures, solid
    sky, REFLECTION-only responses), sphere/box geometry, a prim count the
    pick/scatter scans can afford, and an unrollable bounce budget."""
    return (not scene.textures.has_images and scene.sky_box is None
            and not scene.has_rough and not scene.has_transmission
            and scene.n_tris == 0 and 0 < scene.n_prims <= SCAN_MAX_PRIMS
            and cfg.refmax <= 4 and cfg.spp == 1)


def _safe_inv(d):
    tiny = jnp.abs(d) < _SLAB_EPS
    d_safe = jnp.where(tiny, jnp.where(d < 0, -_SLAB_EPS, _SLAB_EPS), d)
    return 1.0 / d_safe


def _pick_rows(sph_ref, box_ref, pidc, n_sph, n_box, s_pad, b_pad, shape,
               tab_ref=None, trow=0):
    """Per-ray unified row by pid-match scan (the trace_fused winner-pick
    idiom): ga(3) = center, gb(3) = (radius,0,0)|half, rgb(3), mode.

    With ``tab_ref`` (LISTED mode) the sphere scan runs over this tile's
    compact id list (SMEM window row ``trow``: word 0 = count, then global
    sphere ids) instead of all ``n_sph`` — every pid recorded for a tile
    ray is in the list by construction, so the pick is exact."""
    zero = jnp.zeros(shape, jnp.float32)
    acc = (zero,) * 10

    def sph_pick(p, acc):
        m = pidc == p
        ax, ay, az, bx, by, bz, tr, tg, tb, mo = acc
        return (jnp.where(m, _row(sph_ref, 0, p), ax),
                jnp.where(m, _row(sph_ref, s_pad, p), ay),
                jnp.where(m, _row(sph_ref, 2 * s_pad, p), az),
                jnp.where(m, _row(sph_ref, 3 * s_pad, p), bx),
                by, bz,
                jnp.where(m, _row(sph_ref, 4 * s_pad, p), tr),
                jnp.where(m, _row(sph_ref, 5 * s_pad, p), tg),
                jnp.where(m, _row(sph_ref, 6 * s_pad, p), tb),
                jnp.where(m, _row(sph_ref, 7 * s_pad, p), mo))

    def box_pick(p, acc):
        m = pidc == p + n_sph
        ax, ay, az, bx, by, bz, tr, tg, tb, mo = acc
        return (jnp.where(m, _row(box_ref, 0, p), ax),
                jnp.where(m, _row(box_ref, b_pad, p), ay),
                jnp.where(m, _row(box_ref, 2 * b_pad, p), az),
                jnp.where(m, _row(box_ref, 3 * b_pad, p), bx),
                jnp.where(m, _row(box_ref, 4 * b_pad, p), by),
                jnp.where(m, _row(box_ref, 5 * b_pad, p), bz),
                jnp.where(m, _row(box_ref, 6 * b_pad, p), tr),
                jnp.where(m, _row(box_ref, 7 * b_pad, p), tg),
                jnp.where(m, _row(box_ref, 8 * b_pad, p), tb),
                jnp.where(m, _row(box_ref, 9 * b_pad, p), mo))

    if tab_ref is not None:
        acc = jax.lax.fori_loop(
            0, tab_ref[trow, 0],
            lambda j, a: sph_pick(tab_ref[trow, 1 + j], a), acc)
    else:
        acc = jax.lax.fori_loop(0, n_sph, sph_pick, acc,
                                unroll=n_sph if n_sph <= 128 else 1)
    acc = jax.lax.fori_loop(0, n_box, box_pick, acc,
                            unroll=n_box if n_box <= 128 else 1)
    return acc


def _sphere_fwd(ox, oy, oz, dx, dy, dz, cx, cy, cz, r):
    """ops/intersect.sphere_surface, term-for-term (plane form). Returns
    every intermediate the reverse sweep reuses."""
    ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
    bh = ocx * dx + ocy * dy + ocz * dz
    a = dx * dx + dy * dy + dz * dz
    c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
    disc = bh * bh - a * c
    pos = disc > 0.0
    sq_inner = jnp.sqrt(jnp.where(pos, disc, 1.0))
    sq = sq_inner * jnp.where(pos, 1.0, 0.0)
    inv_a = 1.0 / a
    t_near = (-bh - sq) * inv_a
    t_far = (-bh + sq) * inv_a
    near_fwd = t_near >= 0.0
    t = jnp.where(near_fwd, t_near, t_far)
    px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz
    r_guard = jnp.abs(r) < 1e-12
    r_safe = jnp.where(r_guard, 1e-12, r)
    inv_rs = 1.0 / r_safe
    n0x, n0y, n0z = (px - cx) * inv_rs, (py - cy) * inv_rs, (pz - cz) * inv_rs
    flip = dx * n0x + dy * n0y + dz * n0z > 0.0
    fs = jnp.where(flip, -1.0, 1.0)
    return dict(ocx=ocx, ocy=ocy, ocz=ocz, bh=bh, a=a, c=c, pos=pos,
                sq_inner=sq_inner, inv_a=inv_a, t_near=t_near, t_far=t_far,
                near_fwd=near_fwd, t=t, px=px, py=py, pz=pz,
                r_guard=r_guard, inv_rs=inv_rs, fs=fs,
                nx=n0x * fs, ny=n0y * fs, nz=n0z * fs)


def _box_fwd(ox, oy, oz, dx, dy, dz, cx, cy, cz, hx, hy, hz):
    """ops/intersect.box_surface slab test (plane form), with the selection
    masks the reverse sweep routes through. Normal matches box_surface's
    copysign convention (exactly-zero d component -> positive sign)."""
    ivx, ivy, ivz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    tax, tbx = (cx - hx - ox) * ivx, (cx + hx - ox) * ivx
    tay, tby = (cy - hy - oy) * ivy, (cy + hy - oy) * ivy
    taz, tbz = (cz - hz - oz) * ivz, (cz + hz - oz) * ivz
    # min/max with explicit lo-on-tie select (ties are measure-zero; the
    # XLA min/max VJP splits them — documented divergence at exact ties)
    lo_x, lo_y, lo_z = tax <= tbx, tay <= tby, taz <= tbz
    t0x = jnp.where(lo_x, tax, tbx)
    t0y = jnp.where(lo_y, tay, tby)
    t0z = jnp.where(lo_z, taz, tbz)
    t1x = jnp.where(lo_x, tbx, tax)
    t1y = jnp.where(lo_y, tby, tay)
    t1z = jnp.where(lo_z, tbz, taz)
    t_enter = jnp.maximum(jnp.maximum(t0x, t0y), t0z)
    t_exit = jnp.minimum(jnp.minimum(t1x, t1y), t1z)
    entering = t_enter >= 0.0
    t = jnp.where(entering, t_enter, t_exit)
    # winning axis, x > y > z tie order (argmax/argmin semantics).
    # Boolean logic only — Mosaic cannot lower selects BETWEEN i1 vectors
    ne = ~entering
    wex = t0x == t_enter
    wey = (t0y == t_enter) & ~wex
    wxx = t1x == t_exit
    wxy = (t1y == t_exit) & ~wxx
    wx = (entering & wex) | (ne & wxx)
    wy = (entering & wey) | (ne & wxy)
    wz = ~wx & ~wy
    # on the winning axis: did the value come from the lo slab (ta)?
    # entering -> min picked ta iff ta <= tb; exiting -> max picked ta iff
    # ta > tb (the tb-on-tie complement of the min select)
    from_lo_x = (entering & lo_x) | (ne & ~lo_x)
    from_lo_y = (entering & lo_y) | (ne & ~lo_y)
    from_lo_z = (entering & lo_z) | (ne & ~lo_z)
    sx = jnp.where(dx < 0.0, 1.0, -1.0)
    sy = jnp.where(dy < 0.0, 1.0, -1.0)
    sz = jnp.where(dz < 0.0, 1.0, -1.0)
    wxf = jnp.where(wx, 1.0, 0.0)
    wyf = jnp.where(wy, 1.0, 0.0)
    wzf = jnp.where(wz, 1.0, 0.0)
    return dict(ivx=ivx, ivy=ivy, ivz=ivz, t=t,
                wxf=wxf, wyf=wyf, wzf=wzf,
                from_lo_x=from_lo_x, from_lo_y=from_lo_y,
                from_lo_z=from_lo_z,
                dok_x=jnp.abs(dx) >= _SLAB_EPS,
                dok_y=jnp.abs(dy) >= _SLAB_EPS,
                dok_z=jnp.abs(dz) >= _SLAB_EPS,
                nx=wxf * sx, ny=wyf * sy, nz=wzf * sz)


def _fwd_sweep(ox, oy, oz, dx, dy, dz, pids, sph_ref, box_ref, sky_ref,
               n_sph, n_box, s_pad, b_pad, refmax, atten,
               tab_ref=None, trow=0):
    """The replay forward bounce chain; returns (color, saves-per-bounce,
    final scalars) — every per-bounce intermediate the reverse sweep needs
    stays in registers."""
    shape = dx.shape
    col_r = jnp.ones(shape, jnp.float32)
    col_g = jnp.ones(shape, jnp.float32)
    col_b = jnp.ones(shape, jnp.float32)
    path = jnp.zeros(shape, jnp.float32)
    status = jnp.full(shape, _ALIVE, jnp.int32)
    sky_r = sky_ref[0:1, :]
    sky_g = sky_ref[1:2, :]
    sky_b = sky_ref[2:3, :]

    saves = []
    for b in range(refmax):
        pid = pids[b]
        alive = status == _ALIVE
        hit = alive & (pid >= 0)
        miss = alive & (pid < 0)
        pidc = jnp.clip(pid, 0, n_sph + n_box - 1)
        is_s = pidc < n_sph
        (ax, ay, az, bx, by, bz, tr, tg, tb, mode) = _pick_rows(
            sph_ref, box_ref, pidc, n_sph, n_box, s_pad, b_pad, shape,
            tab_ref=tab_ref, trow=trow)
        sf = _sphere_fwd(ox, oy, oz, dx, dy, dz, ax, ay, az, bx)
        bf = _box_fwd(ox, oy, oz, dx, dy, dz, ax, ay, az, bx, by, bz)
        t = jnp.where(is_s, sf["t"], bf["t"])
        nx = jnp.where(is_s, sf["nx"], bf["nx"])
        ny = jnp.where(is_s, sf["ny"], bf["ny"])
        nz = jnp.where(is_s, sf["nz"], bf["nz"])
        px, py, pz = ox + t * dx, oy + t * dy, oz + t * dz

        lit = hit & (mode > 1.5)
        cont = hit & (mode > 0.5) & (mode < 1.5)
        keep = hit & ~lit & ~cont

        ncol_r = jnp.where(hit, col_r * tr,
                           jnp.where(miss, col_r * sky_r, col_r))
        ncol_g = jnp.where(hit, col_g * tg,
                           jnp.where(miss, col_g * sky_g, col_g))
        ncol_b = jnp.where(hit, col_b * tb,
                           jnp.where(miss, col_b * sky_b, col_b))
        npath = jnp.where(hit, path + t, path)
        nstatus = jnp.where(lit, _LIGHT,
                            jnp.where(keep, _KEEP,
                                      jnp.where(miss, _MISS, status)))

        d_dot_n = dx * nx + dy * ny + dz * nz
        rdx = dx - 2.0 * d_dot_n * nx
        rdy = dy - 2.0 * d_dot_n * ny
        rdz = dz - 2.0 * d_dot_n * nz

        nox = jnp.where(cont, px + EPS_ADVANCE * rdx, ox)
        noy = jnp.where(cont, py + EPS_ADVANCE * rdy, oy)
        noz = jnp.where(cont, pz + EPS_ADVANCE * rdz, oz)
        ndx = jnp.where(cont, rdx, dx)
        ndy = jnp.where(cont, rdy, dy)
        ndz = jnp.where(cont, rdz, dz)

        saves.append(dict(
            ox=ox, oy=oy, oz=oz, dx=dx, dy=dy, dz=dz,
            col_r=col_r, col_g=col_g, col_b=col_b,
            hit=hit, miss=miss, cont=cont, is_s=is_s, pidc=pidc,
            t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
            d_dot_n=d_dot_n, rdx=rdx, rdy=rdy, rdz=rdz,
            ax=ax, ay=ay, az=az, bx=bx, tr=tr, tg=tg, tb=tb,
            sf=sf, bf=bf,
            mcol_r=jnp.where(hit, col_r * tr, col_r),
            mcol_g=jnp.where(hit, col_g * tg, col_g),
            mcol_b=jnp.where(hit, col_b * tb, col_b)))
        ox, oy, oz, dx, dy, dz = nox, noy, noz, ndx, ndy, ndz
        col_r, col_g, col_b = ncol_r, ncol_g, ncol_b
        path, status = npath, nstatus

    exhausted = status == _ALIVE
    pre_r = jnp.where(exhausted, 0.0, col_r)
    pre_g = jnp.where(exhausted, 0.0, col_g)
    pre_b = jnp.where(exhausted, 0.0, col_b)
    isl = 1.0 / (JS_EPSILON + (path * atten) ** 2)
    lit_fin = status == _LIGHT
    out_r = jnp.where(lit_fin, pre_r * isl, pre_r)
    out_g = jnp.where(lit_fin, pre_g * isl, pre_g)
    out_b = jnp.where(lit_fin, pre_b * isl, pre_b)
    fin = dict(exhausted=exhausted, lit_fin=lit_fin, isl=isl, path=path,
               pre_r=pre_r, pre_g=pre_g, pre_b=pre_b)
    return (out_r, out_g, out_b), saves, fin


def _fwd_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                *rest, n_sph, n_box, s_pad, b_pad, refmax, atten,
                listed):
    pid_refs = rest[:refmax]
    rest = rest[refmax:]
    tab_ref = None
    if listed:
        tab_ref, rest = rest[0], rest[1:]
    sph_ref, box_ref, sky_ref, cr_ref, cg_ref, cb_ref = rest
    pids = [p[:] for p in pid_refs]
    (cr, cg, cb), _, _ = _fwd_sweep(
        ox_ref[:], oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
        pids, sph_ref, box_ref, sky_ref, n_sph, n_box, s_pad, b_pad,
        refmax, atten, tab_ref=tab_ref, trow=pl.program_id(0) % 8)
    cr_ref[:, :] = cr
    cg_ref[:, :] = cg
    cb_ref[:, :] = cb


def _lane_row(vals):
    """Build a [1, 128] row holding scalars ``vals`` in lanes 0..len-1."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SP_LANE), 1)
    row = jnp.zeros((1, SP_LANE), jnp.float32)
    for q, v in enumerate(vals):
        row = row + jnp.where(lane == q, v, 0.0)
    return row


def _bwd_kernel(ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                *rest, n_sph, n_box, s_pad, b_pad, refmax, atten,
                listed):
    pid_refs = rest[:refmax]
    rest = rest[refmax:]
    tab_ref = None
    if listed:
        tab_ref, rest = rest[0], rest[1:]
    trow = pl.program_id(0) % 8
    (sph_ref, box_ref, sky_ref, gr_ref, gg_ref, gb_ref,
     gox_ref, goy_ref, goz_ref, gdx_ref, gdy_ref, gdz_ref,
     gsph_ref, gbox_ref, gsky_ref) = rest

    # zero the accumulated table outputs on the first program (sequential
    # single-core grid; the block is revisited by every program)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        gsph_ref[:, :] = jnp.zeros(gsph_ref.shape, jnp.float32)
        gbox_ref[:, :] = jnp.zeros(gbox_ref.shape, jnp.float32)
        gsky_ref[:, :] = jnp.zeros(gsky_ref.shape, jnp.float32)

    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    pids = [p[:] for p in pid_refs]
    _, saves, fin = _fwd_sweep(ox, oy, oz, dx, dy, dz, pids, sph_ref,
                               box_ref, sky_ref, n_sph, n_box, s_pad,
                               b_pad, refmax, atten,
                               tab_ref=tab_ref, trow=trow)
    sky_r = sky_ref[0:1, :]
    sky_g = sky_ref[1:2, :]
    sky_b = sky_ref[2:3, :]

    # ---- loss-side epilogue reversed -----------------------------------
    g_out_r, g_out_g, g_out_b = gr_ref[:], gg_ref[:], gb_ref[:]
    isl = fin["isl"]
    lit_fin = fin["lit_fin"]
    # out = lit ? pre * isl : pre ; pre = exhausted ? 0 : col
    g_pre_r = jnp.where(lit_fin, g_out_r * isl, g_out_r)
    g_pre_g = jnp.where(lit_fin, g_out_g * isl, g_out_g)
    g_pre_b = jnp.where(lit_fin, g_out_b * isl, g_out_b)
    pre_dot_g = (fin["pre_r"] * g_out_r + fin["pre_g"] * g_out_g
                 + fin["pre_b"] * g_out_b)
    # d isl / d path = -2 path atten^2 isl^2
    path = fin["path"]
    disl = -2.0 * path * (atten * atten) * isl * isl
    g_path = jnp.where(lit_fin, pre_dot_g * disl, 0.0)
    zero = jnp.zeros_like(g_out_r)
    g_cr = jnp.where(fin["exhausted"], 0.0, g_pre_r)
    g_cg = jnp.where(fin["exhausted"], 0.0, g_pre_g)
    g_cb = jnp.where(fin["exhausted"], 0.0, g_pre_b)
    g_ox, g_oy, g_oz = zero, zero, zero
    g_dx, g_dy, g_dz = zero, zero, zero
    gsky_acc = [jnp.zeros((), jnp.float32)] * 3

    # ---- reverse bounce sweep ------------------------------------------
    for b in range(refmax - 1, -1, -1):
        s = saves[b]
        hit, miss, cont, is_s = s["hit"], s["miss"], s["cont"], s["is_s"]
        hitf = jnp.where(hit, 1.0, 0.0)
        contf = jnp.where(cont, 1.0, 0.0)
        missf = jnp.where(miss, 1.0, 0.0)
        # new_org = cont ? point + EPS*refl : org
        g_px = contf * g_ox
        g_py = contf * g_oy
        g_pz = contf * g_oz
        g_rdx = contf * (EPS_ADVANCE * g_ox + g_dx)
        g_rdy = contf * (EPS_ADVANCE * g_oy + g_dy)
        g_rdz = contf * (EPS_ADVANCE * g_oz + g_dz)
        ncontf = 1.0 - contf
        g_ox = ncontf * g_ox
        g_oy = ncontf * g_oy
        g_oz = ncontf * g_oz
        g_dx = ncontf * g_dx
        g_dy = ncontf * g_dy
        g_dz = ncontf * g_dz

        # color_out = miss ? mcol * sky : mcol ; mcol = hit ? col*rgb : col
        g_sky_ray_r = missf * g_cr * s["mcol_r"]
        g_sky_ray_g = missf * g_cg * s["mcol_g"]
        g_sky_ray_b = missf * g_cb * s["mcol_b"]
        gsky_acc[0] = gsky_acc[0] + jnp.sum(g_sky_ray_r)
        gsky_acc[1] = gsky_acc[1] + jnp.sum(g_sky_ray_g)
        gsky_acc[2] = gsky_acc[2] + jnp.sum(g_sky_ray_b)
        g_mcol_r = jnp.where(miss, g_cr * sky_r, g_cr)
        g_mcol_g = jnp.where(miss, g_cg * sky_g, g_cg)
        g_mcol_b = jnp.where(miss, g_cb * sky_b, g_cb)
        g_rgb_r = hitf * g_mcol_r * s["col_r"]
        g_rgb_g = hitf * g_mcol_g * s["col_g"]
        g_rgb_b = hitf * g_mcol_b * s["col_b"]
        g_cr = jnp.where(hit, g_mcol_r * s["tr"], g_mcol_r)
        g_cg = jnp.where(hit, g_mcol_g * s["tg"], g_mcol_g)
        g_cb = jnp.where(hit, g_mcol_b * s["tb"], g_mcol_b)

        # path_out = hit ? path + t : path
        g_t = hitf * g_path

        # refl = d - 2 (d.n) n
        dxb, dyb, dzb = s["dx"], s["dy"], s["dz"]
        nx, ny, nz = s["nx"], s["ny"], s["nz"]
        n_dot_gr = nx * g_rdx + ny * g_rdy + nz * g_rdz
        g_dx = g_dx + g_rdx - 2.0 * nx * n_dot_gr
        g_dy = g_dy + g_rdy - 2.0 * ny * n_dot_gr
        g_dz = g_dz + g_rdz - 2.0 * nz * n_dot_gr
        ddn = s["d_dot_n"]
        g_nx = -2.0 * (ddn * g_rdx + n_dot_gr * dxb)
        g_ny = -2.0 * (ddn * g_rdy + n_dot_gr * dyb)
        g_nz = -2.0 * (ddn * g_rdz + n_dot_gr * dzb)

        # point = o + t d (shared by both classes)
        g_ox = g_ox + g_px
        g_oy = g_oy + g_py
        g_oz = g_oz + g_pz
        t = s["t"]
        g_dx = g_dx + t * g_px
        g_dy = g_dy + t * g_py
        g_dz = g_dz + t * g_pz
        g_t = g_t + g_px * dxb + g_py * dyb + g_pz * dzb

        # ---- sphere surface reverse (masked to sphere-hit lanes) -------
        ms = jnp.where(hit & is_s, 1.0, 0.0)
        sf = s["sf"]
        g_ts = ms * g_t
        g_nsx = ms * g_nx
        g_nsy = ms * g_ny
        g_nsz = ms * g_nz
        # n = fs * n0 ; n0 = (p - c) * inv_rs
        fs = sf["fs"]
        g_n0x = fs * g_nsx
        g_n0y = fs * g_nsy
        g_n0z = fs * g_nsz
        inv_rs = sf["inv_rs"]
        g_psx = g_n0x * inv_rs
        g_psy = g_n0y * inv_rs
        g_psz = g_n0z * inv_rs
        g_scx = -g_psx
        g_scy = -g_psy
        g_scz = -g_psz
        # d n0 / d r = -(p - c) / r_safe^2 (zero in the |r|<1e-12 guard)
        pmcx = s["px"] - s["ax"]
        pmcy = s["py"] - s["ay"]
        pmcz = s["pz"] - s["az"]
        g_sr = jnp.where(
            sf["r_guard"], 0.0,
            -(g_n0x * pmcx + g_n0y * pmcy + g_n0z * pmcz)
            * inv_rs * inv_rs)
        # p = o + t d
        g_ox = g_ox + g_psx
        g_oy = g_oy + g_psy
        g_oz = g_oz + g_psz
        g_dx = g_dx + t * g_psx
        g_dy = g_dy + t * g_psy
        g_dz = g_dz + t * g_psz
        g_ts = g_ts + g_psx * dxb + g_psy * dyb + g_psz * dzb
        # t select near/far
        nf = jnp.where(sf["near_fwd"], 1.0, 0.0)
        g_tn = nf * g_ts
        g_tf = (1.0 - nf) * g_ts
        inv_a = sf["inv_a"]
        g_bh = -(g_tn + g_tf) * inv_a
        g_sq = (g_tf - g_tn) * inv_a
        g_a = -(sf["t_near"] * g_tn + sf["t_far"] * g_tf) * inv_a
        # sq = sqrt(pos ? disc : 1) * pos
        posf = jnp.where(sf["pos"], 1.0, 0.0)
        g_disc = posf * g_sq * 0.5 / sf["sq_inner"]
        # disc = bh^2 - a c
        bh = sf["bh"]
        g_bh = g_bh + 2.0 * bh * g_disc
        g_a = g_a - sf["c"] * g_disc
        g_cq = -sf["a"] * g_disc
        # c = oc.oc - r^2
        g_ocx = 2.0 * g_cq * sf["ocx"]
        g_ocy = 2.0 * g_cq * sf["ocy"]
        g_ocz = 2.0 * g_cq * sf["ocz"]
        g_sr = g_sr - 2.0 * s["bx"] * g_cq
        # a = d.d
        g_dx = g_dx + 2.0 * g_a * dxb
        g_dy = g_dy + 2.0 * g_a * dyb
        g_dz = g_dz + 2.0 * g_a * dzb
        # bh = oc.d
        g_ocx = g_ocx + g_bh * dxb
        g_ocy = g_ocy + g_bh * dyb
        g_ocz = g_ocz + g_bh * dzb
        g_dx = g_dx + g_bh * sf["ocx"]
        g_dy = g_dy + g_bh * sf["ocy"]
        g_dz = g_dz + g_bh * sf["ocz"]
        # oc = o - c
        g_ox = g_ox + g_ocx
        g_oy = g_oy + g_ocy
        g_oz = g_oz + g_ocz
        g_scx = g_scx - g_ocx
        g_scy = g_scy - g_ocy
        g_scz = g_scz - g_ocz

        # ---- box surface reverse (normal is piecewise constant) --------
        mb = jnp.where(hit & ~is_s, 1.0, 0.0)
        bfv = s["bf"]
        g_tb_ = mb * g_t
        # t came from ((C +- H) - o_k) * inv_k on the winning axis
        wxf, wyf, wzf = bfv["wxf"], bfv["wyf"], bfv["wzf"]
        gw_x = g_tb_ * wxf
        gw_y = g_tb_ * wyf
        gw_z = g_tb_ * wzf
        ivx, ivy, ivz = bfv["ivx"], bfv["ivy"], bfv["ivz"]
        g_bcx = gw_x * ivx
        g_bcy = gw_y * ivy
        g_bcz = gw_z * ivz
        sgn_x = jnp.where(bfv["from_lo_x"], -1.0, 1.0)
        sgn_y = jnp.where(bfv["from_lo_y"], -1.0, 1.0)
        sgn_z = jnp.where(bfv["from_lo_z"], -1.0, 1.0)
        g_bhx = gw_x * ivx * sgn_x
        g_bhy = gw_y * ivy * sgn_y
        g_bhz = gw_z * ivz * sgn_z
        g_ox = g_ox - gw_x * ivx
        g_oy = g_oy - gw_y * ivy
        g_oz = g_oz - gw_z * ivz
        tb_t = bfv["t"]
        g_dx = g_dx - jnp.where(bfv["dok_x"], gw_x * ivx * tb_t, 0.0)
        g_dy = g_dy - jnp.where(bfv["dok_y"], gw_y * ivy * tb_t, 0.0)
        g_dz = g_dz - jnp.where(bfv["dok_z"], gw_z * ivz * tb_t, 0.0)

        # ---- per-primitive scatter (masked tile reductions) ------------
        pidc = s["pidc"]

        def sph_scatter(p, _):
            m = (pidc == p) & hit

            @pl.when(jnp.any(m))
            def _():
                mf = jnp.where(m, 1.0, 0.0)
                row = _lane_row([
                    jnp.sum(mf * g_scx), jnp.sum(mf * g_scy),
                    jnp.sum(mf * g_scz), jnp.sum(mf * g_sr),
                    jnp.sum(mf * g_rgb_r), jnp.sum(mf * g_rgb_g),
                    jnp.sum(mf * g_rgb_b)])
                cur = gsph_ref[pl.ds(p, 1), :]
                gsph_ref[pl.ds(p, 1), :] = cur + row
            return 0

        def box_scatter(p, _):
            m = (pidc == p + n_sph) & hit

            @pl.when(jnp.any(m))
            def _():
                mf = jnp.where(m, 1.0, 0.0)
                # box rows route the unified-ga cotangent (sphere-center
                # slots) PLUS the slab-t center cotangent; ga also fed the
                # sphere kernel on these lanes but its outputs were
                # deselected (zero cotangent) — g_scx etc. are
                # sphere-masked so they contribute nothing here
                row = _lane_row([
                    jnp.sum(mf * g_bcx), jnp.sum(mf * g_bcy),
                    jnp.sum(mf * g_bcz), jnp.sum(mf * g_bhx),
                    jnp.sum(mf * g_bhy), jnp.sum(mf * g_bhz),
                    jnp.sum(mf * g_rgb_r), jnp.sum(mf * g_rgb_g),
                    jnp.sum(mf * g_rgb_b)])
                cur = gbox_ref[pl.ds(p, 1), :]
                gbox_ref[pl.ds(p, 1), :] = cur + row
            return 0

        if listed:
            jax.lax.fori_loop(
                0, tab_ref[trow, 0],
                lambda j, c: sph_scatter(tab_ref[trow, 1 + j], c), 0)
        else:
            jax.lax.fori_loop(0, n_sph, sph_scatter, 0,
                              unroll=n_sph if n_sph <= 128 else 1)
        jax.lax.fori_loop(0, n_box, box_scatter, 0,
                          unroll=n_box if n_box <= 128 else 1)

        # propagate path cotangent unchanged (path_in pass-through)
        # g_path already equals g_path_in here

    gox_ref[:, :] = g_ox
    goy_ref[:, :] = g_oy
    goz_ref[:, :] = g_oz
    gdx_ref[:, :] = g_dx
    gdy_ref[:, :] = g_dy
    gdz_ref[:, :] = g_dz
    cur = gsky_ref[pl.ds(0, 1), :]
    gsky_ref[pl.ds(0, 1), :] = cur + _lane_row(gsky_acc)


def _pack_tables(sph_c, sph_r, sph_rgb, mode_s, box_c, box_h, box_rgb,
                 mode_b, sky_rgb):
    def pad8(x):
        return -(-max(x, 1) // 8) * 8

    s_pad = pad8(sph_c.shape[0])
    b_pad = pad8(box_c.shape[0])
    sph = pack_replicated(
        [sph_c[:, 0], sph_c[:, 1], sph_c[:, 2], sph_r,
         sph_rgb[:, 0], sph_rgb[:, 1], sph_rgb[:, 2], mode_s], s_pad)
    box = pack_replicated(
        [box_c[:, 0], box_c[:, 1], box_c[:, 2],
         box_h[:, 0], box_h[:, 1], box_h[:, 2],
         box_rgb[:, 0], box_rgb[:, 1], box_rgb[:, 2], mode_b], b_pad)
    sky = pack_replicated([sky_rgb[0:1], sky_rgb[1:2], sky_rgb[2:3]], 1)
    return sph, box, sky, s_pad, b_pad


def _sds(shape, dtype, vma):
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "vma"))
def _fwd_call(cols, pid_planes, sph, box, sky, meta, tab=None,
              interpret=False, vma=None):
    n_sph, n_box, s_pad, b_pad, refmax, atten = meta
    listed = tab is not None
    rows = cols[0].shape[0]
    grid = (rows // RG_SUB,)
    kern = functools.partial(_fwd_kernel, n_sph=n_sph, n_box=n_box,
                             s_pad=s_pad, b_pad=b_pad, refmax=refmax,
                             atten=atten, listed=listed)
    ray = pl.BlockSpec((RG_SUB, SP_LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    # per-tile id lists ride 8-row SMEM windows (Mosaic requires block
    # sublane dims divisible by 8); program i reads row i % 8
    tab_spec = ([pl.BlockSpec((8, tab.shape[1]), lambda i: (i // 8, 0),
                              memory_space=pltpu.SMEM)] if listed else [])
    tab_arg = (tab,) if listed else ()
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[ray] * (6 + refmax) + tab_spec
        + [full(sph), full(box), full(sky)],
        out_specs=[ray] * 3,
        out_shape=[_sds((rows, SP_LANE), jnp.float32, vma)] * 3,
        interpret=interpret,
    )(*cols, *pid_planes, *tab_arg, sph, box, sky)


@functools.partial(jax.jit, static_argnames=("meta", "interpret", "vma"))
def _bwd_call(cols, pid_planes, sph, box, sky, gcol, meta, tab=None,
              interpret=False, vma=None):
    n_sph, n_box, s_pad, b_pad, refmax, atten = meta
    listed = tab is not None
    rows = cols[0].shape[0]
    grid = (rows // RG_SUB,)
    kern = functools.partial(_bwd_kernel, n_sph=n_sph, n_box=n_box,
                             s_pad=s_pad, b_pad=b_pad, refmax=refmax,
                             atten=atten, listed=listed)
    ray = pl.BlockSpec((RG_SUB, SP_LANE), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
    acc = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)
    tab_spec = ([pl.BlockSpec((8, tab.shape[1]), lambda i: (i // 8, 0),
                              memory_space=pltpu.SMEM)] if listed else [])
    tab_arg = (tab,) if listed else ()
    f32 = jnp.float32
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[ray] * (6 + refmax) + tab_spec
        + [full(sph), full(box), full(sky)] + [ray] * 3,
        out_specs=[ray] * 6 + [acc((s_pad, SP_LANE)), acc((b_pad, SP_LANE)),
                               acc((8, SP_LANE))],
        out_shape=[_sds((rows, SP_LANE), f32, vma)] * 6
        + [_sds((s_pad, SP_LANE), f32, vma),
           _sds((b_pad, SP_LANE), f32, vma),
           _sds((8, SP_LANE), f32, vma)],
        interpret=interpret,
    )(*cols, *pid_planes, *tab_arg, sph, box, sky, *gcol)


def _prep(org, dir, pid_seq, refmax):
    """Pad the wavefront to a tile multiple and split into planes."""
    n = org.shape[0]
    quant = RG_SUB * SP_LANE
    n_pad = -(-n // quant) * quant
    if n_pad != n:
        rep = (n_pad - n,)
        org = jnp.concatenate(
            [org, jnp.broadcast_to(org[-1], rep + (3,))], axis=0)
        dir = jnp.concatenate(
            [dir, jnp.broadcast_to(dir[-1], rep + (3,))], axis=0)
        pid_seq = jnp.concatenate(
            [pid_seq, jnp.full(rep + (pid_seq.shape[1],), -1.0,
                               pid_seq.dtype)], axis=0)
    cols = _ray_cols(org, dir, n_pad)
    pid_planes = tuple(
        pid_seq[:, b].astype(jnp.int32).reshape(-1, SP_LANE)
        for b in range(refmax))
    return cols, pid_planes, n, n_pad


def _make_replay_fn(refmax: int, atten: float, interpret: bool,
                    vma: tuple | None, listed: bool):
    """custom_vjp'd replay-color function for a static (refmax, atten).

    All array arguments are f32 (pid_seq/modes/tile_tab ride as exact f32
    so the cotangent structure stays float-only); returns [N, 3] colors.
    ``tile_tab`` is the per-tile compact sphere-id table of
    :func:`build_tile_lists` (a dummy when ``listed`` is False).
    """

    @jax.custom_vjp
    def replay(sph_c, sph_r, sph_rgb, box_c, box_h, box_rgb, sky_rgb,
               mode_s, mode_b, org, dir, pid_seq, tile_tab):
        out, _ = _fwd(sph_c, sph_r, sph_rgb, box_c, box_h, box_rgb,
                      sky_rgb, mode_s, mode_b, org, dir, pid_seq,
                      tile_tab)
        return out

    def _fwd(sph_c, sph_r, sph_rgb, box_c, box_h, box_rgb, sky_rgb,
             mode_s, mode_b, org, dir, pid_seq, tile_tab):
        sph, box, sky, s_pad, b_pad = _pack_tables(
            sph_c, sph_r, sph_rgb, mode_s, box_c, box_h, box_rgb, mode_b,
            sky_rgb)
        cols, pid_planes, n, _ = _prep(org, dir, pid_seq, refmax)
        meta = (sph_c.shape[0], box_c.shape[0], s_pad, b_pad, refmax,
                atten)
        tab = tile_tab.astype(jnp.int32) if listed else None
        cr, cg, cb = _fwd_call(cols, pid_planes, sph, box, sky, meta,
                               tab=tab, interpret=interpret, vma=vma)
        color = jnp.stack([cr.reshape(-1)[:n], cg.reshape(-1)[:n],
                           cb.reshape(-1)[:n]], axis=-1)
        res = (sph_c, sph_r, sph_rgb, box_c, box_h, box_rgb, sky_rgb,
               mode_s, mode_b, org, dir, pid_seq, tile_tab)
        return color, res

    def _bwd(res, gcol):
        (sph_c, sph_r, sph_rgb, box_c, box_h, box_rgb, sky_rgb,
         mode_s, mode_b, org, dir, pid_seq, tile_tab) = res
        sph, box, sky, s_pad, b_pad = _pack_tables(
            sph_c, sph_r, sph_rgb, mode_s, box_c, box_h, box_rgb, mode_b,
            sky_rgb)
        cols, pid_planes, n, n_pad = _prep(org, dir, pid_seq, refmax)
        g = jnp.zeros((n_pad, 3), jnp.float32)
        g = jax.lax.dynamic_update_slice(g, gcol.astype(jnp.float32),
                                         (0, 0))
        gplanes = tuple(g[:, i].reshape(-1, SP_LANE) for i in range(3))
        meta = (sph_c.shape[0], box_c.shape[0], s_pad, b_pad, refmax,
                atten)
        tab = tile_tab.astype(jnp.int32) if listed else None
        outs = _bwd_call(cols, pid_planes, sph, box, sky, gplanes, meta,
                         tab=tab, interpret=interpret, vma=vma)
        gox, goy, goz, gdx, gdy, gdz, gsph, gbox, gsky = outs
        n_s, n_b = sph_c.shape[0], box_c.shape[0]
        g_org = jnp.stack([gox.reshape(-1)[:n], goy.reshape(-1)[:n],
                           goz.reshape(-1)[:n]], axis=-1)
        g_dir = jnp.stack([gdx.reshape(-1)[:n], gdy.reshape(-1)[:n],
                           gdz.reshape(-1)[:n]], axis=-1)
        g_sph_c = gsph[:n_s, 0:3]
        g_sph_r = gsph[:n_s, 3]
        g_sph_rgb = gsph[:n_s, 4:7]
        g_box_c = gbox[:n_b, 0:3]
        g_box_h = gbox[:n_b, 3:6]
        g_box_rgb = gbox[:n_b, 6:9]
        g_sky = gsky[0, 0:3]
        zs = jnp.zeros_like(mode_s)
        zb = jnp.zeros_like(mode_b)
        zp = jnp.zeros_like(pid_seq)
        return (g_sph_c, g_sph_r, g_sph_rgb, g_box_c, g_box_h, g_box_rgb,
                g_sky, zs, zb, g_org, g_dir, zp,
                jnp.zeros_like(tile_tab))

    replay.defvjp(_fwd, _bwd)
    return replay


@functools.lru_cache(maxsize=16)
def _cached_replay_fn(refmax: int, atten: float, interpret: bool,
                      vma: tuple | None, listed: bool):
    return _make_replay_fn(refmax, atten, interpret, vma, listed)


def supports_listed(scene: Scene, cfg: RenderConfig) -> bool:
    """Eligibility for the LISTED kernels: same restricted class, but the
    prim count is bounded by what the [s_pad, 128] cotangent accumulator
    and the per-tile lists afford instead of the full-P scan."""
    return (not scene.textures.has_images and scene.sky_box is None
            and not scene.has_rough and not scene.has_transmission
            and scene.n_tris == 0 and 0 < scene.n_prims
            and scene.n_spheres <= LISTED_MAX_SPHERES
            and scene.n_boxes <= SCAN_MAX_PRIMS
            and cfg.refmax <= 4 and cfg.spp == 1)


def build_tile_lists(pid_seq, n_sph: int) -> np.ndarray | None:
    """Per-ray-tile compact sphere-id lists from a CONCRETE recording ->
    i32 [T_pad8, 1 + L_pad] (word 0 = count, then ascending global sphere
    ids), or None when some tile's distinct-id count exceeds
    LISTED_MAX_LEN (the listed scan would degenerate — fall back).

    Host-side numpy (runs once per recording, on materialized pid_seq):
    spatially coherent ray tiles touch only a handful of distinct
    primitives even in large scenes, so the in-kernel pick/scatter scans
    cost O(distinct-per-tile), independent of the table size. ``L_pad``
    rounds up to a power of two so the jit/kernel cache survives small
    recording-to-recording fluctuations."""
    pid = np.asarray(pid_seq)
    if pid.dtype != np.int32:
        pid = pid.astype(np.int64)
    n, r = pid.shape
    quant = RG_SUB * SP_LANE
    n_pad = -(-n // quant) * quant
    if n_pad != n:
        pid = np.concatenate(
            [pid, np.full((n_pad - n, r), -1, pid.dtype)], axis=0)
    t = n_pad // quant
    flat = pid.reshape(t, quant * r).astype(np.int64)
    flat = np.where((flat >= 0) & (flat < n_sph), flat, -1)
    srt = np.sort(flat, axis=1)
    prev = np.concatenate([np.full((t, 1), -2, srt.dtype), srt[:, :-1]],
                          axis=1)
    uniq = (srt >= 0) & (srt != prev)
    cnt = uniq.sum(axis=1)
    l_max = int(cnt.max()) if t else 0
    if l_max > LISTED_MAX_LEN:
        return None
    l_pad = 1
    while l_pad < max(l_max, 8):
        l_pad *= 2
    t_pad = -(-t // 8) * 8
    tab = np.zeros((t_pad, 1 + l_pad), np.int32)
    tab[:t, 0] = cnt
    rows, cols = np.nonzero(uniq)
    pos = (uniq.cumsum(axis=1) - 1)[rows, cols]
    tab[rows, 1 + pos] = srt[rows, cols]
    return tab


def replay_colors(scene: Scene, cfg: RenderConfig, org: Array, dir: Array,
                  pid_seq: Array, interpret: bool | None = None,
                  vma: tuple | None = None,
                  tile_lists: np.ndarray | None = None) -> Array:
    """Differentiable replay-trace colors [N, 3] via the fused Pallas
    forward/backward kernels.

    Drop-in for ``trace_rays(..., pid_seq=...).color`` on the supported
    class (caller must check :func:`supports`); gradients to every Scene
    float leaf and to org/dir (camera pose) match the XLA replay path.
    Inside shard_map, use ``check_vma=False`` on the shard_map and psum
    the returned per-shard gradients EXPLICITLY (see module docstring;
    optim/fit wires this). ``vma`` tags the kernel outputs when a caller
    runs under a vma-checked shard_map instead.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from ..ops.gather import gather_rows

    mat = scene.materials
    light = mat.light[scene.prim_material]
    cont = (mat.mirror[scene.prim_material]
            & (mat.response[scene.prim_material]
               == int(ResponseType.REFLECTION))
            & ~light)
    mode = (2.0 * light.astype(jnp.float32)
            + cont.astype(jnp.float32))                       # [P]
    prim_rgb = gather_rows(scene.textures.solid_rgb, scene.prim_texture)
    s_end = scene.n_spheres
    sky_rgb = scene.textures.solid_rgb[scene.sky_tex]
    listed = tile_lists is not None
    fn = _cached_replay_fn(int(cfg.refmax),
                           float(cfg.distance_attenuation_factor),
                           bool(interpret),
                           tuple(vma) if vma else None, listed)
    tab = (jnp.asarray(tile_lists, jnp.float32) if listed
           else jnp.zeros((8, 2), jnp.float32))
    return fn(scene.sphere_center, scene.sphere_radius, prim_rgb[:s_end],
              scene.box_center, scene.box_half, prim_rgb[s_end:],
              sky_rgb, mode[:s_end], mode[s_end:],
              org, dir, pid_seq.astype(jnp.float32), tab)
