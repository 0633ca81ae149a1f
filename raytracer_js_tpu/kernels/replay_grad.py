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


def _zero_saves(shape):
    """Structure-matched dummy save dict for liveness-skipped bounces.

    All masks are 0.0 (the reverse then passes cotangents through
    untouched and contributes nothing to any table), and every saved
    divisor-like value is 1.0 so the masked reverse arithmetic stays
    NaN-free (0 * (x / 0) would poison the lane otherwise)."""
    z = jnp.zeros(shape, jnp.float32)
    o = jnp.ones(shape, jnp.float32)
    zi = jnp.zeros(shape, jnp.int32)
    sf = dict(ocx=z, ocy=z, ocz=z, bh=z, a=o, c=z, posf=z, sq_inner=o,
              inv_a=o, t_near=z, t_far=z, nf=z, t=z, px=z, py=z, pz=z,
              r_okf=z, inv_rs=o, fs=o, nx=z, ny=z, nz=z)
    bf = dict(ivx=z, ivy=z, ivz=z, t=z, wxf=z, wyf=z, wzf=z,
              sgn_x=o, sgn_y=o, sgn_z=o, dokf_x=z, dokf_y=z, dokf_z=z,
              nx=z, ny=z, nz=z)
    return dict(dx=z, dy=z, dz=z,
                col_r=z, col_g=z, col_b=z,
                hitf=z, missf=z, contf=z, issf=z, pidc=zi,
                t=z, px=z, py=z, pz=z, nx=z, ny=z, nz=z,
                d_dot_n=z, ax=z, ay=z, az=z, bx=z, tr=z, tg=z, tb=z,
                sf=sf, bf=bf, mcol_r=z, mcol_g=z, mcol_b=z)


def _fwd_sweep(ox, oy, oz, dx, dy, dz, pids, sph_ref, box_ref, sky_ref,
               n_sph, n_box, s_pad, b_pad, refmax, atten,
               tab_ref=None, trow=0, need_saves=True):
    """The replay forward bounce chain; returns ((r, g, b), saves, alives,
    fin) — every per-bounce intermediate the reverse sweep needs stays in
    registers. Bounces >= 1 run under a whole-tile liveness cond (the
    trace_fused dead-tile skip): after bounce 0 most tiles have no
    continuing rays, and a skipped bounce records zeroed saves whose
    reverse is a pass-through. All saved masks are f32 (0/1) — i1 vectors
    cannot cross a Mosaic cond boundary. ``need_saves=False`` (the primal
    kernel) carries only the 11 state planes through the conds."""
    shape = dx.shape
    col_r = jnp.ones(shape, jnp.float32)
    col_g = jnp.ones(shape, jnp.float32)
    col_b = jnp.ones(shape, jnp.float32)
    path = jnp.zeros(shape, jnp.float32)
    status = jnp.full(shape, _ALIVE, jnp.int32)
    sky_r = sky_ref[0:1, :]
    sky_g = sky_ref[1:2, :]
    sky_b = sky_ref[2:3, :]

    def one_bounce(pid, state):
        ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path, status = state
        alive = status == _ALIVE
        hit = alive & (pid >= 0)
        miss = alive & (pid < 0)
        hitf = jnp.where(hit, 1.0, 0.0)
        missf = jnp.where(miss, 1.0, 0.0)
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

        mcol_r = jnp.where(hit, col_r * tr, col_r)
        mcol_g = jnp.where(hit, col_g * tg, col_g)
        mcol_b = jnp.where(hit, col_b * tb, col_b)
        ncol_r = jnp.where(miss, mcol_r * sky_r, mcol_r)
        ncol_g = jnp.where(miss, mcol_g * sky_g, mcol_g)
        ncol_b = jnp.where(miss, mcol_b * sky_b, mcol_b)
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

        nstate = (nox, noy, noz, ndx, ndy, ndz, ncol_r, ncol_g, ncol_b,
                  npath, nstatus)
        if not need_saves:
            return None, nstate
        sfs = dict(ocx=sf["ocx"], ocy=sf["ocy"], ocz=sf["ocz"],
                   bh=sf["bh"], a=sf["a"], c=sf["c"],
                   posf=jnp.where(sf["pos"], 1.0, 0.0),
                   sq_inner=sf["sq_inner"], inv_a=sf["inv_a"],
                   t_near=sf["t_near"], t_far=sf["t_far"],
                   nf=jnp.where(sf["near_fwd"], 1.0, 0.0),
                   t=sf["t"], px=sf["px"], py=sf["py"], pz=sf["pz"],
                   r_okf=jnp.where(sf["r_guard"], 0.0, 1.0),
                   inv_rs=sf["inv_rs"], fs=sf["fs"],
                   nx=sf["nx"], ny=sf["ny"], nz=sf["nz"])
        bfs = dict(ivx=bf["ivx"], ivy=bf["ivy"], ivz=bf["ivz"],
                   t=bf["t"], wxf=bf["wxf"], wyf=bf["wyf"], wzf=bf["wzf"],
                   sgn_x=jnp.where(bf["from_lo_x"], -1.0, 1.0),
                   sgn_y=jnp.where(bf["from_lo_y"], -1.0, 1.0),
                   sgn_z=jnp.where(bf["from_lo_z"], -1.0, 1.0),
                   dokf_x=jnp.where(bf["dok_x"], 1.0, 0.0),
                   dokf_y=jnp.where(bf["dok_y"], 1.0, 0.0),
                   dokf_z=jnp.where(bf["dok_z"], 1.0, 0.0),
                   nx=bf["nx"], ny=bf["ny"], nz=bf["nz"])
        saves = dict(
            dx=dx, dy=dy, dz=dz,
            col_r=col_r, col_g=col_g, col_b=col_b,
            hitf=hitf, missf=missf,
            contf=jnp.where(cont, 1.0, 0.0),
            issf=jnp.where(is_s, 1.0, 0.0), pidc=pidc,
            t=t, px=px, py=py, pz=pz, nx=nx, ny=ny, nz=nz,
            d_dot_n=d_dot_n, ax=ax, ay=ay, az=az, bx=bx,
            tr=tr, tg=tg, tb=tb, sf=sfs, bf=bfs,
            mcol_r=mcol_r, mcol_g=mcol_g, mcol_b=mcol_b)
        return saves, nstate

    state = (ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path, status)
    saves = []
    alives = []
    for b in range(refmax):
        if b == 0:
            alives.append(jnp.float32(1.0))
            sv, state = one_bounce(pids[b], state)
            saves.append(sv)
        else:
            alive_f = jnp.where(jnp.any(state[10] == _ALIVE), 1.0, 0.0)
            alives.append(alive_f)
            if need_saves:
                sv, state = jax.lax.cond(
                    alive_f > 0.0,
                    lambda st, pb=pids[b]: one_bounce(pb, st),
                    lambda st: (_zero_saves(shape), st), state)
                saves.append(sv)
            else:
                _, state = jax.lax.cond(
                    alive_f > 0.0,
                    lambda st, pb=pids[b]: one_bounce(pb, st),
                    lambda st: (None, st), state)
                saves.append(None)
    (ox, oy, oz, dx, dy, dz, col_r, col_g, col_b, path, status) = state

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
    return (out_r, out_g, out_b), saves, alives, fin


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
    (cr, cg, cb), _, _, _ = _fwd_sweep(
        ox_ref[:], oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:], dz_ref[:],
        pids, sph_ref, box_ref, sky_ref, n_sph, n_box, s_pad, b_pad,
        refmax, atten, tab_ref=tab_ref, trow=pl.program_id(0) % 8,
        need_saves=False)
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


def _reverse_bounce(s, sky, g):
    """Hand-derived VJP of one replay bounce (pure part — the per-prim
    scatter is separate). ``g`` = (g_o(3), g_d(3), g_c(3), g_path);
    returns the pre-bounce cotangents plus the per-ray scatter rows
    (g_center(3), g_radius, g_box_c(3), g_box_h(3), g_rgb(3)) and the
    per-ray sky cotangent (3)."""
    (g_ox, g_oy, g_oz, g_dx, g_dy, g_dz, g_cr, g_cg, g_cb, g_path) = g
    sky_r, sky_g, sky_b = sky
    hitf, missf, contf = s["hitf"], s["missf"], s["contf"]
    # new_org = cont ? point + EPS*refl : org ; new_dir = cont ? refl : dir
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
    g_sky_r = missf * g_cr * s["mcol_r"]
    g_sky_g = missf * g_cg * s["mcol_g"]
    g_sky_b = missf * g_cb * s["mcol_b"]
    nmissf = 1.0 - missf
    g_mcol_r = missf * g_cr * sky_r + nmissf * g_cr
    g_mcol_g = missf * g_cg * sky_g + nmissf * g_cg
    g_mcol_b = missf * g_cb * sky_b + nmissf * g_cb
    g_rgb_r = hitf * g_mcol_r * s["col_r"]
    g_rgb_g = hitf * g_mcol_g * s["col_g"]
    g_rgb_b = hitf * g_mcol_b * s["col_b"]
    nhitf = 1.0 - hitf
    g_cr = hitf * g_mcol_r * s["tr"] + nhitf * g_mcol_r
    g_cg = hitf * g_mcol_g * s["tg"] + nhitf * g_mcol_g
    g_cb = hitf * g_mcol_b * s["tb"] + nhitf * g_mcol_b

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

    # point = o + t d (shared by both classes; t is the selected t)
    g_ox = g_ox + g_px
    g_oy = g_oy + g_py
    g_oz = g_oz + g_pz
    t = s["t"]
    g_dx = g_dx + t * g_px
    g_dy = g_dy + t * g_py
    g_dz = g_dz + t * g_pz
    g_t = g_t + g_px * dxb + g_py * dyb + g_pz * dzb

    # ---- sphere surface reverse (masked to sphere-hit lanes) ------------
    msf = hitf * s["issf"]
    sf = s["sf"]
    g_ts = msf * g_t
    g_nsx = msf * g_nx
    g_nsy = msf * g_ny
    g_nsz = msf * g_nz
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
    pmcx = s["px"] - s["ax"]
    pmcy = s["py"] - s["ay"]
    pmcz = s["pz"] - s["az"]
    g_sr = (-sf["r_okf"] * (g_n0x * pmcx + g_n0y * pmcy + g_n0z * pmcz)
            * inv_rs * inv_rs)
    g_ox = g_ox + g_psx
    g_oy = g_oy + g_psy
    g_oz = g_oz + g_psz
    g_dx = g_dx + t * g_psx
    g_dy = g_dy + t * g_psy
    g_dz = g_dz + t * g_psz
    g_ts = g_ts + g_psx * dxb + g_psy * dyb + g_psz * dzb
    nf = sf["nf"]
    g_tn = nf * g_ts
    g_tf = (1.0 - nf) * g_ts
    inv_a = sf["inv_a"]
    g_bh = -(g_tn + g_tf) * inv_a
    g_sq = (g_tf - g_tn) * inv_a
    g_a = -(sf["t_near"] * g_tn + sf["t_far"] * g_tf) * inv_a
    g_disc = sf["posf"] * g_sq * 0.5 / sf["sq_inner"]
    bh = sf["bh"]
    g_bh = g_bh + 2.0 * bh * g_disc
    g_a = g_a - sf["c"] * g_disc
    g_cq = -sf["a"] * g_disc
    g_ocx = 2.0 * g_cq * sf["ocx"]
    g_ocy = 2.0 * g_cq * sf["ocy"]
    g_ocz = 2.0 * g_cq * sf["ocz"]
    g_sr = g_sr - 2.0 * s["bx"] * g_cq
    g_dx = g_dx + 2.0 * g_a * dxb
    g_dy = g_dy + 2.0 * g_a * dyb
    g_dz = g_dz + 2.0 * g_a * dzb
    g_ocx = g_ocx + g_bh * dxb
    g_ocy = g_ocy + g_bh * dyb
    g_ocz = g_ocz + g_bh * dzb
    g_dx = g_dx + g_bh * sf["ocx"]
    g_dy = g_dy + g_bh * sf["ocy"]
    g_dz = g_dz + g_bh * sf["ocz"]
    g_ox = g_ox + g_ocx
    g_oy = g_oy + g_ocy
    g_oz = g_oz + g_ocz
    g_scx = g_scx - g_ocx
    g_scy = g_scy - g_ocy
    g_scz = g_scz - g_ocz

    # ---- box surface reverse (normal is piecewise constant) -------------
    mbf = hitf * (1.0 - s["issf"])
    bfv = s["bf"]
    g_tb_ = mbf * g_t
    gw_x = g_tb_ * bfv["wxf"]
    gw_y = g_tb_ * bfv["wyf"]
    gw_z = g_tb_ * bfv["wzf"]
    ivx, ivy, ivz = bfv["ivx"], bfv["ivy"], bfv["ivz"]
    g_bcx = gw_x * ivx
    g_bcy = gw_y * ivy
    g_bcz = gw_z * ivz
    g_bhx = gw_x * ivx * bfv["sgn_x"]
    g_bhy = gw_y * ivy * bfv["sgn_y"]
    g_bhz = gw_z * ivz * bfv["sgn_z"]
    g_ox = g_ox - gw_x * ivx
    g_oy = g_oy - gw_y * ivy
    g_oz = g_oz - gw_z * ivz
    tb_t = bfv["t"]
    g_dx = g_dx - bfv["dokf_x"] * gw_x * ivx * tb_t
    g_dy = g_dy - bfv["dokf_y"] * gw_y * ivy * tb_t
    g_dz = g_dz - bfv["dokf_z"] * gw_z * ivz * tb_t

    g_out = (g_ox, g_oy, g_oz, g_dx, g_dy, g_dz, g_cr, g_cg, g_cb, g_path)
    rows = dict(g_scx=g_scx, g_scy=g_scy, g_scz=g_scz, g_sr=g_sr,
                g_bcx=g_bcx, g_bcy=g_bcy, g_bcz=g_bcz,
                g_bhx=g_bhx, g_bhy=g_bhy, g_bhz=g_bhz,
                g_rgb_r=g_rgb_r, g_rgb_g=g_rgb_g, g_rgb_b=g_rgb_b)
    return g_out, rows, (g_sky_r, g_sky_g, g_sky_b)


def _zero_rows(shape):
    z = jnp.zeros(shape, jnp.float32)
    return dict(g_scx=z, g_scy=z, g_scz=z, g_sr=z, g_bcx=z, g_bcy=z,
                g_bcz=z, g_bhx=z, g_bhy=z, g_bhz=z, g_rgb_r=z,
                g_rgb_g=z, g_rgb_b=z)


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
    _, saves, alives, fin = _fwd_sweep(
        ox, oy, oz, dx, dy, dz, pids, sph_ref, box_ref, sky_ref, n_sph,
        n_box, s_pad, b_pad, refmax, atten, tab_ref=tab_ref, trow=trow)
    sky = (sky_ref[0:1, :], sky_ref[1:2, :], sky_ref[2:3, :])

    # ---- loss-side epilogue reversed ------------------------------------
    g_out_r, g_out_g, g_out_b = gr_ref[:], gg_ref[:], gb_ref[:]
    isl = fin["isl"]
    lit_fin = fin["lit_fin"]
    g_pre_r = jnp.where(lit_fin, g_out_r * isl, g_out_r)
    g_pre_g = jnp.where(lit_fin, g_out_g * isl, g_out_g)
    g_pre_b = jnp.where(lit_fin, g_out_b * isl, g_out_b)
    pre_dot_g = (fin["pre_r"] * g_out_r + fin["pre_g"] * g_out_g
                 + fin["pre_b"] * g_out_b)
    path = fin["path"]
    disl = -2.0 * path * (atten * atten) * isl * isl
    g_path = jnp.where(lit_fin, pre_dot_g * disl, 0.0)
    zero = jnp.zeros_like(g_out_r)
    g = (zero, zero, zero, zero, zero, zero,
         jnp.where(fin["exhausted"], 0.0, g_pre_r),
         jnp.where(fin["exhausted"], 0.0, g_pre_g),
         jnp.where(fin["exhausted"], 0.0, g_pre_b),
         g_path)
    # lane-partial sky accumulators (1, 128): cross-lane reduction is the
    # expensive VPU operation — defer it to XLA (measured r5: the scalar
    # full-tile reduces made the scatter ~8 of the 9.3 ms step)
    gsky_acc = (jnp.zeros((1, SP_LANE), jnp.float32),) * 3

    # ---- reverse bounce sweep -------------------------------------------
    shape = dx.shape
    for b in range(refmax - 1, -1, -1):
        s = saves[b]
        if b == 0:
            g, rows, g_sky_ray = _reverse_bounce(s, sky, g)
        else:
            # liveness skip mirrors the forward cond: a dead bounce's
            # reverse is the identity with no scatter contributions
            g, rows, g_sky_ray = jax.lax.cond(
                alives[b] > 0.0,
                lambda g, s=s: _reverse_bounce(s, sky, g),
                lambda g: (g, _zero_rows(shape),
                           (jnp.zeros(shape, jnp.float32),) * 3), g)
        gsky_acc = tuple(a + jnp.sum(r, axis=0, keepdims=True)
                         for a, r in zip(gsky_acc, g_sky_ray))

        # ---- per-primitive scatter (masked tile reductions) -------------
        pidc = s["pidc"]
        hitf = s["hitf"]

        def part(mf, q, rows=rows):
            # sublane-only masked reduction -> (1, 128) lane partials
            return jnp.sum(mf * rows[q], axis=0, keepdims=True)

        def sph_scatter(p, _, rows=rows, pidc=pidc, hitf=hitf):
            mf = jnp.where(pidc == p, hitf, 0.0)
            row = jnp.concatenate(
                [part(mf, "g_scx"), part(mf, "g_scy"), part(mf, "g_scz"),
                 part(mf, "g_sr"), part(mf, "g_rgb_r"),
                 part(mf, "g_rgb_g"), part(mf, "g_rgb_b")], axis=1)
            cur = gsph_ref[pl.ds(p, 1), :]
            gsph_ref[pl.ds(p, 1), :] = cur + row
            return 0

        def box_scatter(p, _, rows=rows, pidc=pidc, hitf=hitf):
            # box rows take the slab-t center/half cotangents plus rgb;
            # the sphere-masked g_sc* contribute nothing on box lanes
            mf = jnp.where(pidc == p + n_sph, hitf, 0.0)
            row = jnp.concatenate(
                [part(mf, "g_bcx"), part(mf, "g_bcy"), part(mf, "g_bcz"),
                 part(mf, "g_bhx"), part(mf, "g_bhy"), part(mf, "g_bhz"),
                 part(mf, "g_rgb_r"), part(mf, "g_rgb_g"),
                 part(mf, "g_rgb_b")], axis=1)
            cur = gbox_ref[pl.ds(p, 1), :]
            gbox_ref[pl.ds(p, 1), :] = cur + row
            return 0

        @pl.when(alives[b] > 0.0)
        def _scatter():
            if listed:
                # the tile list IS the presence filter — no per-prim skip
                jax.lax.fori_loop(
                    0, tab_ref[trow, 0],
                    lambda j, c: sph_scatter(tab_ref[trow, 1 + j], c), 0)
            else:
                jax.lax.fori_loop(0, n_sph, sph_scatter, 0,
                                  unroll=n_sph if n_sph <= 128 else 1)
            jax.lax.fori_loop(0, n_box, box_scatter, 0,
                              unroll=n_box if n_box <= 128 else 1)

    (g_ox, g_oy, g_oz, g_dx, g_dy, g_dz, _, _, _, _) = g
    gox_ref[:, :] = g_ox
    goy_ref[:, :] = g_oy
    goz_ref[:, :] = g_oz
    gdx_ref[:, :] = g_dx
    gdy_ref[:, :] = g_dy
    gdz_ref[:, :] = g_dz
    cur = gsky_ref[pl.ds(0, 1), :]
    gsky_ref[pl.ds(0, 1), :] = cur + jnp.concatenate(list(gsky_acc),
                                                     axis=1)


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
        out_specs=[ray] * 6 + [acc((s_pad, 7 * SP_LANE)),
                               acc((b_pad, 9 * SP_LANE)),
                               acc((8, 3 * SP_LANE))],
        out_shape=[_sds((rows, SP_LANE), f32, vma)] * 6
        + [_sds((s_pad, 7 * SP_LANE), f32, vma),
           _sds((b_pad, 9 * SP_LANE), f32, vma),
           _sds((8, 3 * SP_LANE), f32, vma)],
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
        # lane-sum the (prim, quantity, 128) partial accumulators
        gsph = gsph.reshape(gsph.shape[0], 7, SP_LANE).sum(-1)
        gbox = gbox.reshape(gbox.shape[0], 9, SP_LANE).sum(-1)
        g_sph_c = gsph[:n_s, 0:3]
        g_sph_r = gsph[:n_s, 3]
        g_sph_rgb = gsph[:n_s, 4:7]
        g_box_c = gbox[:n_b, 0:3]
        g_box_h = gbox[:n_b, 3:6]
        g_box_rgb = gbox[:n_b, 6:9]
        g_sky = gsky[0].reshape(3, SP_LANE).sum(-1)
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
