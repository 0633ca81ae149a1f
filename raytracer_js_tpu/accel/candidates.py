"""Per-tile candidate lists for the big-scene tiled trace kernel.

The fused whole-trace kernel (kernels/trace_fused) streams EVERY primitive
past every ray tile — perfect at <=100 prims, hopeless at 100k. This module
builds, per ray tile, the compact list of primitives that could possibly be
the nearest hit for any ray of the tile, type-segregated and sorted by a
conservative entry distance ``t_lo`` so the kernel can stop scanning once
every ray's current best hit precedes every remaining candidate.

It is the TPU re-expression of what the reference octree walker achieves
per ray (near-to-far enumeration with early termination,
octree_space.ts:316-361) at *tile* granularity: one shared candidate stream
per coherent ray packet instead of a pointer walk per ray.

Geometry: every primitive is bounded by a sphere (center [P,3], radius [P]);
a tile is bounded by a cone (apex ball o0/ro, axis, half-angle theta). A
primitive is included iff its bounding sphere intersects the ball-inflated
cone — conservative, so culling is EXACT: a rejected primitive cannot be hit
by any forward ray of the tile. ``t_lo = max(0, |c - o0| - r - ro)``
lower-bounds the hit param of any tile ray against it (unit directions).

Build paths:
* :func:`frame_candidates` — host-side NumPy for the frame entry (camera
  known at dispatch; amortized across frames for a static camera).
* :func:`packet_candidates` — traced XLA for divergent-bounce ray packets
  (origins/directions only known mid-trace).

Packed table layout (dense f32 ``[C, N_ATTR]`` per tile, scalar-read by the
kernel; column meaning depends on the type segment):

====  =======================  =======================  ====================
col   sphere                   box                      triangle
====  =======================  =======================  ====================
0     t_lo (sorted asc.)       t_lo                     t_lo
1     global pid               global pid               global pid
2-4   center                   center                   v0
5     c.c - r^2                hx                       e1x
6     1/r                      hy                       e1y
7     --                       hz                       e1z
8-10  --                       --                       e2
11-13 --                       --                       unit geometric normal
14-17 rgb, mode (2=light, 1=mirror-continue, 0=keep)    same
====  =======================  =======================  ====================
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ResponseType
from ..models import textures as tex_mod
from ..models.scene import Scene

Array = jnp.ndarray

N_ATTR = 20

#: kernel scan-chunk size; every type segment in a packed table starts at a
#: SEG_ALIGN-multiple row so the kernel's [SEG_ALIGN, N_ATTR] vector block
#: loads stay aligned (kernels/trace_tiled.CHUNK aliases this)
import os

SEG_ALIGN = int(os.environ.get("RT_TILE_CHUNK", "16"))


def _pad_align(x: int) -> int:
    return -(-x // SEG_ALIGN) * SEG_ALIGN


def bounding_spheres_np(scene: Scene) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side bounding sphere per primitive (global prim order)."""
    parts_c, parts_r = [], []
    if scene.n_spheres:
        parts_c.append(np.asarray(scene.sphere_center, np.float64))
        parts_r.append(np.asarray(scene.sphere_radius, np.float64))
    if scene.n_boxes:
        parts_c.append(np.asarray(scene.box_center, np.float64))
        parts_r.append(np.linalg.norm(
            np.asarray(scene.box_half, np.float64), axis=-1))
    if scene.n_tris:
        v0 = np.asarray(scene.tri_v0, np.float64)
        v1 = np.asarray(scene.tri_v1, np.float64)
        v2 = np.asarray(scene.tri_v2, np.float64)
        c = (v0 + v1 + v2) / 3.0
        r = np.maximum(np.maximum(np.linalg.norm(v0 - c, axis=-1),
                                  np.linalg.norm(v1 - c, axis=-1)),
                       np.linalg.norm(v2 - c, axis=-1))
        parts_c.append(c)
        parts_r.append(r)
    if not parts_c:
        return np.zeros((0, 3)), np.zeros((0,))
    return np.concatenate(parts_c, 0), np.concatenate(parts_r, 0)


def cone_include_np(centers: np.ndarray, radii: np.ndarray, o0: np.ndarray,
                    ro: float, axis: np.ndarray, cos_t: float
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Conservative cone-vs-bounding-sphere test -> (include [P], t_lo [P]).

    Same identity as trace_fused._sphere_shortlists: inflate the sphere by
    the origin-ball radius, then angular overlap
    ``cos(beta) >= cos(alpha + theta)``. cos_t < 0.25 keeps everything
    (cone too wide for the identity to be reliable).
    """
    v = centers - o0
    dist = np.linalg.norm(v, axis=-1)
    rr = radii + ro
    inside = dist <= rr * (1.0 + 1e-5) + 1e-7
    sin_a = np.clip(rr / np.maximum(dist, 1e-20), 0.0, 1.0)
    cos_a = np.sqrt(np.maximum(1.0 - sin_a * sin_a, 0.0))
    cos_b = v @ axis / np.maximum(dist, 1e-20)
    sin_t = np.sqrt(max(1.0 - cos_t * cos_t, 0.0))
    include = inside | (cos_b >= cos_a * cos_t - sin_a * sin_t - 1e-5)
    if cos_t < 0.25:
        include = np.ones_like(include, dtype=bool) | include
    t_lo = np.maximum(dist - rr, 0.0)
    return include, t_lo


def _shade_cols_np(scene: Scene, pid: np.ndarray) -> np.ndarray:
    """rgb + response-mode columns for prim ids -> [n, 4] f32.

    IMAGE-textured prims get rgb = 1 (identity): the kernel multiplies the
    packed rgb in-place and the XLA glue multiplies the sampled atlas color
    afterwards (render_tiled applies it to image-kind winners only).
    """
    safe = np.clip(pid, 0, max(scene.n_prims - 1, 0))
    tex_id = np.asarray(scene.prim_texture)[safe]
    rgb = np.asarray(scene.textures.solid_rgb)[tex_id]
    is_img = np.asarray(tex_mod.is_image_kind(
        jnp.asarray(scene.textures.kind)[jnp.asarray(tex_id)]))
    rgb = np.where(is_img[:, None], 1.0, rgb)
    mat_id = np.asarray(scene.prim_material)[safe]
    mat = scene.materials
    light = np.asarray(mat.light)[mat_id]
    cont = (np.asarray(mat.mirror)[mat_id]
            & (np.asarray(mat.response)[mat_id]
               == int(ResponseType.REFLECTION)) & ~light)
    mode = 2.0 * light + 1.0 * cont
    if scene.has_transmission:
        # 3 = transmission continuation (the glue refracts; the kernel
        # leaves org/dir for it) — mirrors trace_fused._pack_prims
        trans = ((np.asarray(mat.response)[mat_id]
                  == int(ResponseType.TRANSMISSION)) & ~light)
        mode = mode + 3.0 * trans
    return np.concatenate([rgb, mode[:, None]], axis=1).astype(np.float32)


def pack_candidate_attrs_np(scene: Scene, pid: np.ndarray, t_lo: np.ndarray
                            ) -> np.ndarray:
    """Attribute rows (see module docstring) -> [len(pid), N_ATTR] f32.

    ``pid`` -1 entries produce rows with t_lo=+inf and degenerate geometry
    (never tested: the per-segment count stops before padding; inf t_lo also
    trivially satisfies the early-exit check).
    """
    n = pid.shape[0]
    out = np.zeros((n, N_ATTR), np.float32)
    out[:, 0] = np.where(pid >= 0, t_lo, np.inf)
    out[:, 1] = np.maximum(pid, 0).astype(np.float32)
    out[:, 14:18] = _shade_cols_np(scene, pid)
    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes

    is_s = (pid >= 0) & (pid < s_end)
    if is_s.any():
        i = np.clip(pid, 0, max(s_end - 1, 0))
        c = np.asarray(scene.sphere_center)[i]
        r = np.asarray(scene.sphere_radius)[i]
        out[is_s, 2:5] = c[is_s]
        out[is_s, 5] = (np.sum(c * c, -1) - r * r)[is_s]
        out[is_s, 6] = (1.0 / np.maximum(r, 1e-20))[is_s]
    is_b = (pid >= s_end) & (pid < b_end)
    if is_b.any():
        i = np.clip(pid - s_end, 0, max(scene.n_boxes - 1, 0))
        out[is_b, 2:5] = np.asarray(scene.box_center)[i][is_b]
        out[is_b, 5:8] = np.asarray(scene.box_half)[i][is_b]
    is_t = pid >= b_end
    if is_t.any():
        i = np.clip(pid - b_end, 0, max(scene.n_tris - 1, 0))
        v0 = np.asarray(scene.tri_v0)[i]
        e1 = np.asarray(scene.tri_v1)[i] - v0
        e2 = np.asarray(scene.tri_v2)[i] - v0
        gn = np.cross(e1, e2)
        gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
        out[is_t, 2:5] = v0[is_t]
        out[is_t, 5:8] = e1[is_t]
        out[is_t, 8:11] = e2[is_t]
        out[is_t, 11:14] = gn[is_t]
    return out


def _segment_sort_np(scene: Scene, ids: np.ndarray, t_lo: np.ndarray):
    """Type-segregate included prim ids, each segment sorted by t_lo and
    padded to a SEG_ALIGN multiple (pid -1 / t_lo inf padding rows) ->
    (ordered ids, ordered t_lo, (cnt_s, cnt_b, cnt_t) REAL counts)."""
    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes
    segs, tls, cnts = [], [], []
    for lo, hi in ((0, s_end), (s_end, b_end), (b_end, scene.n_prims)):
        m = (ids >= lo) & (ids < hi)
        sid = ids[m]
        stl = t_lo[sid] if sid.size else np.zeros((0,))
        order = np.argsort(stl, kind="stable")
        pad = _pad_align(len(sid)) - len(sid)
        segs.append(np.concatenate(
            [sid[order], np.full(pad, -1, sid.dtype if sid.size else np.int64)]))
        tls.append(np.concatenate([stl[order], np.full(pad, np.inf)]))
        cnts.append(len(sid))
    return (np.concatenate(segs), np.concatenate(tls),
            np.asarray(cnts, np.int32))


def frame_candidates(scene: Scene, cam, sub: int, lane: int,
                     c_max: int | None = None, raw: bool = False):
    """Host-side per-tile candidate tables for the frame entry.

    Tiles are (sub, lane) pixel blocks of the equiangular image (the tiled
    frame kernel's grid). Returns ``(tab [nby*nbx*C, N_ATTR] f32,
    cnts [nby*nbx, 4] i32, c_max)``; candidates are type-segregated
    ([spheres | boxes | tris]) and t_lo-sorted within each segment.
    ``c_max`` defaults to the exact per-scene maximum rounded up to a
    multiple of 8 (no truncation — culling stays exact); passing a smaller
    value raises rather than silently dropping candidates.
    """
    centers, radii = bounding_spheres_np(scene)
    nbx = -(-cam.w // lane)
    nby = -(-cam.h // sub)
    pos = np.asarray(cam.pos, np.float64)
    front = np.asarray(cam.front, np.float64)
    left = np.asarray(cam.left, np.float64)
    up = np.asarray(cam.up, np.float64)
    step_h = cam.fov_h / cam.w
    step_v = cam.fov_v / cam.h

    x_lo = np.arange(nbx) * lane
    x_hi = np.minimum(cam.w - 1, x_lo + lane - 1)
    y_lo = np.arange(nby) * sub
    y_hi = np.minimum(cam.h - 1, y_lo + sub - 1)
    thc_h = ((x_lo + x_hi) / 2 - (cam.w // 2)) * step_h          # [nbx]
    thc_v = ((y_lo + y_hi) / 2 - (cam.h // 2)) * step_v          # [nby]
    th_h = (x_hi - x_lo) / 2 * step_h
    th_v = (y_hi - y_lo) / 2 * step_v

    # VECTORIZED over tiles (r4): with the apex at the camera and ro = 0,
    # every per-prim factor of cone_include_np (dist, inflation, angular
    # radius, t_lo) is TILE-INDEPENDENT — only cos_b = v_hat . axis varies
    # per tile, which is one [P, 3] x [3, T] matmul per view. The per-tile
    # Python loop re-deriving all of it cost ~4 min/view at 1M prims
    # (r4 config-5 setup); this computes identical include sets in seconds.
    cv = np.cos(thc_v)[:, None]                                   # [nby,1]
    sv = np.sin(thc_v)[:, None]
    ch = np.cos(thc_h)[None, :]                                   # [1,nbx]
    sh = np.sin(thc_h)[None, :]
    axes = (ch[..., None] * cv[..., None] * front
            + ch[..., None] * sv[..., None] * up
            + sh[..., None] * np.ones((nby, 1, 1)) * left)        # [nby,nbx,3]
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    theta = (th_h[None, :] + th_v[:, None] + 1e-4).reshape(-1)    # [T]
    axes = axes.reshape(-1, 3)
    cos_t = np.cos(theta)
    sin_t = np.sqrt(np.maximum(1.0 - cos_t * cos_t, 0.0))

    v = centers - pos
    dist = np.linalg.norm(v, axis=-1)
    inside = dist <= radii * (1.0 + 1e-5) + 1e-7
    sin_a = np.clip(radii / np.maximum(dist, 1e-20), 0.0, 1.0)
    cos_a = np.sqrt(np.maximum(1.0 - sin_a * sin_a, 0.0))
    t_lo = np.maximum(dist - radii, 0.0)
    v_n = v / np.maximum(dist, 1e-20)[:, None]

    lists, tlos, cnts = [], [], []
    n_tiles = axes.shape[0]
    chunk = max(1, min(64, int(2e8 // max(len(centers), 1))))
    for c0 in range(0, n_tiles, chunk):
        ax_c = axes[c0:c0 + chunk]                               # [Tc, 3]
        cos_b = v_n @ ax_c.T                                     # [P, Tc]
        inc = (inside[:, None]
               | (cos_b >= cos_a[:, None] * cos_t[None, c0:c0 + chunk]
                  - sin_a[:, None] * sin_t[None, c0:c0 + chunk] - 1e-5)
               | (cos_t[None, c0:c0 + chunk] < 0.25))
        for j in range(ax_c.shape[0]):
            ids, tl, cnt = _segment_sort_np(scene,
                                            np.nonzero(inc[:, j])[0], t_lo)
            lists.append(ids)
            tlos.append(tl)
            cnts.append(cnt)

    maxlen = max((len(l) for l in lists), default=SEG_ALIGN)
    if c_max is None:
        c_max = max(SEG_ALIGN, _pad_align(maxlen))
    elif maxlen > c_max:
        raise ValueError(
            f"tile candidate overflow: {maxlen} > c_max {c_max}; "
            "culling would no longer be exact")
    t = len(lists)
    pid = np.full((t, c_max), -1, np.int64)
    tlo = np.full((t, c_max), np.inf, np.float32)
    for i, (l, tl) in enumerate(zip(lists, tlos)):
        pid[i, :len(l)] = l
        tlo[i, :len(l)] = tl
    cnt8 = np.zeros((t, 8), np.float32)
    cnt8[:, :3] = np.stack(cnts)           # exact below 2^24
    cnt8[:, 3] = np.inf                    # untruncated: always resolved
    cnt8[:, 4:7] = pos                     # centroid = camera (d_c = 0)
    if raw:
        # host-side (pid, t_lo) lists only — 20x smaller than the packed
        # attr table; callers gather the rows ON DEVICE from
        # prim_attr_table_jnp via pack_candidate_attrs_jnp (the r4
        # config-5 fix: shipping 8 x 1.6 GB packed tables through the
        # ~20 MB/s device tunnel dominated setup+record time)
        return (pid.astype(np.int32), tlo, cnt8, c_max)
    tab = pack_candidate_attrs_np(scene, pid.reshape(-1), tlo.reshape(-1))
    return jnp.asarray(tab), jnp.asarray(cnt8), c_max


# ---------------------------------------------------------------------------
# Traced (XLA) packet path — divergent bounces
# ---------------------------------------------------------------------------

def bounding_spheres_jnp(scene: Scene) -> Tuple[Array, Array]:
    """Traced bounding spheres (global prim order)."""
    cs, rs = [], []
    if scene.n_spheres:
        cs.append(scene.sphere_center)
        rs.append(scene.sphere_radius)
    if scene.n_boxes:
        cs.append(scene.box_center)
        rs.append(jnp.linalg.norm(scene.box_half, axis=-1))
    if scene.n_tris:
        c = (scene.tri_v0 + scene.tri_v1 + scene.tri_v2) / 3.0
        r = jnp.maximum(
            jnp.maximum(jnp.linalg.norm(scene.tri_v0 - c, axis=-1),
                        jnp.linalg.norm(scene.tri_v1 - c, axis=-1)),
            jnp.linalg.norm(scene.tri_v2 - c, axis=-1))
        cs.append(c)
        rs.append(r)
    return jnp.concatenate(cs, 0), jnp.concatenate(rs, 0)


def packet_cones(org: Array, dir: Array, alive: Array, packet: int):
    """Bounding cone per packet of ``packet`` consecutive rays.

    Dead lanes are excluded from the bound (their origin/direction are
    stale). Returns (o0 [B,3], ro [B], axis [B,3], cos_t [B]); all-dead
    packets produce cos_t = 2 (empty cone — excludes everything).
    """
    b = org.shape[0] // packet
    o = org.reshape(b, packet, 3)
    d = dir.reshape(b, packet, 3)
    m = alive.reshape(b, packet).astype(org.dtype)[..., None]
    n_live = jnp.maximum(m.sum(axis=1), 1e-20)
    o0 = (o * m).sum(axis=1) / n_live
    ro = jnp.max(jnp.linalg.norm(o - o0[:, None], axis=-1)
                 * m[..., 0], axis=1)
    axis = (d * m).sum(axis=1)
    axis = axis / jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True),
                              1e-20)
    dots = jnp.einsum("bpk,bk->bp", d, axis,
                      precision=jax.lax.Precision.HIGHEST)
    cos_t = jnp.min(jnp.where(m[..., 0] > 0, dots, 1.0), axis=1)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    any_live = m[..., 0].sum(axis=1) > 0
    return o0, ro, axis, jnp.where(any_live, cos_t, 2.0)


def packet_candidates(scene: Scene, org: Array, dir: Array, alive: Array,
                      packet: int, c_max: int, t_done: Array | None = None):
    """Traced per-packet candidate tables -> (tab [B*c_max, N_ATTR] f32,
    cnts [B, 8] f32, t_safe [B] f32).

    Same contract as :func:`frame_candidates` but computed on device for
    mid-trace ray packets. Wide packets (direction spread beyond the cone
    identity) conservatively include everything. When the include count
    exceeds ``c_max`` only the nearest ``c_max`` by t_lo survive per
    segment — EXACTNESS IS PRESERVED via the returned resolution bound
    ``t_safe`` = min t_lo over every dropped candidate (+inf when nothing
    dropped): a hit is final only if it precedes t_safe, a miss only if the
    ray leaves the scene bounds before t_safe; unresolved rays are retried
    with a larger cleared horizon (render_tiled's round loop).

    ``t_done`` [N] is each ray's proven-clear horizon from earlier rounds;
    candidates entirely inside the packet's common cleared ball
    (``dist + rr <= min t_done``) are skipped, so retry rounds make strict
    progress. ``cnts`` packs the three per-type counts as f32 (exact below
    2^24) with t_safe in column 3 — one SMEM row per packet for the kernel.
    """
    centers, radii = bounding_spheres_jnp(scene)
    o0, ro, axis, cos_t = packet_cones(org, dir, alive, packet)
    v = centers[None] - o0[:, None]                               # [B, P, 3]
    dist = jnp.linalg.norm(v, axis=-1)
    rr = radii[None] + ro[:, None]
    inside = dist <= rr * (1.0 + 1e-5) + 1e-7
    sin_a = jnp.clip(rr / jnp.maximum(dist, 1e-20), 0.0, 1.0)
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
    # HIGHEST: the cone test's 1e-5 slack is far below bf16 rounding —
    # a default-precision contraction could wrongly cull (exactness bug)
    cos_b = jnp.einsum("bpk,bk->bp", v, axis,
                       precision=jax.lax.Precision.HIGHEST
                       ) / jnp.maximum(dist, 1e-20)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    include = inside | (cos_b >= cos_a * cos_t[:, None]
                        - sin_a * sin_t[:, None] - 1e-5)
    include = include | (cos_t[:, None] < 0.25)
    include = include & (cos_t[:, None] <= 1.0)    # all-dead packet: none
    # CENTROID-ANCHORED entry bound (no origin-ball inflation): for a ray
    # at distance d from o0, a prim's hit param is >= t_lo - d. The kernel
    # compensates per ray (early exit on t_best + d <= t_lo; resolution
    # radius tau = t_safe - d), so wide packets still produce useful
    # bounds for their central rays instead of collapsing to zero.
    t_lo = jnp.maximum(dist - radii[None], 0.0)
    if t_done is not None:
        b = org.shape[0] // packet
        live = alive.reshape(b, packet)
        d_c = jnp.linalg.norm(org.reshape(b, packet, 3) - o0[:, None],
                              axis=-1)
        # prim provably cleared by EVERY live ray iff
        # dist0 + r <= min_i (t_done_i - d_i)
        floor = jnp.min(jnp.where(live,
                                  t_done.reshape(b, packet) - d_c,
                                  jnp.inf), axis=1)
        floor = jnp.where(jnp.isfinite(floor), floor, -jnp.inf)
        include = include & (dist + radii[None] > floor[:, None])

    # GLOBALLY nearest-first selection (not segment-major): the dropped set
    # must be the genuinely farthest candidates or t_safe collapses — a
    # huge straddler (the ground box, bounding-sphere t_lo = 0) dropped by
    # a per-segment budget would pin t_safe at 0 and stall the rounds.
    c_sel = c_max - 3 * SEG_ALIGN
    assert c_sel > 0, c_max
    p = centers.shape[0]
    c_sel = min(c_sel, p)        # small scenes: keep everything
    b = include.shape[0]
    pid_all = jnp.arange(p, dtype=jnp.int32)
    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes
    big = jnp.float32(1e30)
    key = jnp.where(include, t_lo, big)
    order_full = jnp.argsort(key, axis=1)
    order = order_full[:, :c_sel]                                 # [B, Cs]
    pid = jnp.take_along_axis(
        jnp.broadcast_to(pid_all[None], include.shape), order, axis=1)
    inc_sel = jnp.take_along_axis(include, order, axis=1)
    tlo_sel = jnp.take_along_axis(t_lo, order, axis=1)
    pid = jnp.where(inc_sel, pid, -1)

    # resolution bound: min t_lo over DROPPED included candidates = the
    # (c_sel+1)-th nearest (selection is globally nearest-first)
    if p > c_sel:
        t_safe = jnp.take_along_axis(key, order_full[:, c_sel:c_sel + 1],
                                     axis=1)[:, 0]
        t_safe = jnp.where(t_safe >= big, jnp.inf, t_safe)
    else:
        t_safe = jnp.full((b,), jnp.inf, jnp.float32)

    # segment-major re-sort of the SMALL selected slice (stable in t_lo):
    # spheres | boxes | tris, each nearest-first
    seg_sel = jnp.where(pid < 0, 3,
                        jnp.where(pid < s_end, 0,
                                  jnp.where(pid < b_end, 1, 2)))
    pos = jnp.broadcast_to(jnp.arange(c_sel, dtype=jnp.int32)[None],
                           seg_sel.shape)
    seg_key = seg_sel * (c_sel + 1) + pos
    _, pid, tlo_sel = jax.lax.sort((seg_key, pid, tlo_sel), num_keys=1)
    kept = jnp.stack([jnp.sum(seg_sel == k, axis=1) for k in range(3)],
                     axis=1).astype(jnp.int32)                    # [B, 3]
    # cols: cnt_s, cnt_b, cnt_t, t_safe, o0 xyz, ro — o0/ro let the kernel
    # sharpen the bound PER RAY: a dropped prim's hit param for a ray at
    # distance d from the centroid is >= t_safe + (ro - d), so central rays
    # of a wide packet still resolve (the thin-tail stall fix)
    cnts = jnp.concatenate(
        [kept.astype(jnp.float32), t_safe[:, None], o0,
         ro[:, None]], axis=1)

    # aligned re-layout: segment k starts at row A_k (SEG_ALIGN multiple)
    pad = lambda x: ((x + SEG_ALIGN - 1) // SEG_ALIGN) * SEG_ALIGN
    a1 = pad(kept[:, 0])[:, None]                                 # [B, 1]
    a2 = (a1[:, 0] + pad(kept[:, 1]))[:, None]
    r = jnp.arange(c_max, dtype=jnp.int32)[None, :]               # [1, C]
    seg_r = (r >= a1).astype(jnp.int32) + (r >= a2).astype(jnp.int32)
    a_seg = jnp.where(seg_r == 0, 0, jnp.where(seg_r == 1, a1, a2))
    s_seg = jnp.where(seg_r == 0, 0,
                      jnp.where(seg_r == 1, kept[:, 0:1],
                                (kept[:, 0] + kept[:, 1])[:, None]))
    k_seg = jnp.take_along_axis(
        jnp.concatenate([kept, jnp.zeros((b, 1), kept.dtype)], axis=1),
        jnp.minimum(seg_r, 3), axis=1)
    off = r - a_seg
    valid = off < k_seg
    src = jnp.clip(s_seg + off, 0, c_sel - 1)
    pid_out = jnp.where(valid, jnp.take_along_axis(pid, src, axis=1), -1)
    tlo_out = jnp.where(valid, jnp.take_along_axis(tlo_sel, src, axis=1),
                        jnp.inf)

    tab = pack_candidate_attrs_jnp(scene, pid_out.reshape(-1),
                                   tlo_out.reshape(-1))
    return tab, cnts, t_safe


def prim_attr_table_jnp(scene: Scene) -> Array:
    """Per-primitive packed attribute rows -> [P, N_ATTR] f32 (traced).

    Cols 0/1 (t_lo, pid) are filled per candidate by the caller; geometry
    and shading cols are built once from the scene arrays with NO gathers
    (pure concatenation in global prim order), so packing a candidate list
    becomes a single row-gather from this table. XLA CSEs it across the
    round loop of one jitted frame.
    """
    rgb_all = scene.textures.solid_rgb[scene.prim_texture]
    is_img = tex_mod.is_image_kind(scene.textures.kind[scene.prim_texture])
    rgb_all = jnp.where(is_img[:, None], 1.0, rgb_all)  # glue samples atlas
    mat = scene.materials
    mid = scene.prim_material
    light = mat.light[mid]
    cont = (mat.mirror[mid]
            & (mat.response[mid] == int(ResponseType.REFLECTION)) & ~light)
    mode = 2.0 * light + 1.0 * cont
    if scene.has_transmission:
        trans = ((mat.response[mid] == int(ResponseType.TRANSMISSION))
                 & ~light)
        mode = mode + 3.0 * trans
    mode = mode[:, None]

    geos = []
    if scene.n_spheres:
        c = scene.sphere_center
        r = scene.sphere_radius
        geos.append(jnp.concatenate(
            [c, (jnp.sum(c * c, -1) - r * r)[:, None],
             (1.0 / jnp.maximum(r, 1e-20))[:, None],
             jnp.zeros((scene.n_spheres, 7), jnp.float32)], axis=1))
    if scene.n_boxes:
        geos.append(jnp.concatenate(
            [scene.box_center, scene.box_half,
             jnp.zeros((scene.n_boxes, 6), jnp.float32)], axis=1))
    if scene.n_tris:
        v0 = scene.tri_v0
        e1 = scene.tri_v1 - v0
        e2 = scene.tri_v2 - v0
        gn = jnp.cross(e1, e2)
        gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True),
                              1e-20)
        geos.append(jnp.concatenate([v0, e1, e2, gn], axis=1))
    geo = (jnp.concatenate(geos, axis=0) if geos
           else jnp.zeros((1, 12), jnp.float32))
    n_rows = geo.shape[0]
    zeros2 = jnp.zeros((n_rows, 2), jnp.float32)
    pad_tail = jnp.zeros((n_rows, N_ATTR - 18), jnp.float32)
    if not geos:
        rgb_all = jnp.ones((1, 3), jnp.float32)
        mode = jnp.zeros((1, 1), jnp.float32)
    return jnp.concatenate([zeros2, geo, rgb_all, mode, pad_tail], axis=1)


def pack_candidate_attrs_jnp(scene: Scene, pid: Array, t_lo: Array,
                             table: Array | None = None) -> Array:
    """Traced candidate packing: ONE row-gather from the per-prim table
    (was ~8 independent gathers per call — the dominant packet-prep cost
    after the sorts)."""
    if table is None:
        table = prim_attr_table_jnp(scene)
    safe = jnp.clip(pid, 0, max(scene.n_prims - 1, 0))
    out = table[safe]
    # write cols 0/1 via fused broadcast-wheres, NOT .at[:, c].set — the
    # scatter materializes an [n, 1] temp whose T(8,128) layout pads the
    # minor dim 128x (11.9 GB at config-5's 25M candidate rows, measured
    # HBM OOM)
    col = jax.lax.iota(jnp.int32, N_ATTR)[None, :]
    t_col = jnp.where(pid >= 0, t_lo, jnp.inf)
    p_col = jnp.maximum(pid, 0).astype(jnp.float32)
    return jnp.where(col == 0, t_col[:, None],
                     jnp.where(col == 1, p_col[:, None], out))


# ---------------------------------------------------------------------------
# Cell-grid candidate selection — the sort-free packet path
# ---------------------------------------------------------------------------
#
# The [B, P] rowwise selection above pays, per live segment, ~21 ms for the
# argsort, ~16 ms for its take_alongs and ~15-20 ms for the per-packet
# type-segmentation sort (measured r3, tools/exp_c4_split). This path
# replaces ALL of that with [B, G]-cell arithmetic over a uniform grid
# (G = g^3): per packet, cells are visited in a HOST-PRECOMPUTED
# center-distance order (one row gather), budget-cut by a cumulative
# count, and expanded into candidate rows straight from per-type CSR
# lists — no sorts anywhere. The visit order is an approximation (anchored
# at the packet's cell center, not its exact centroid); EXACTNESS is
# unaffected: the resolution bound t_safe is the exact masked min of t_lo
# over every kept-but-unselected cell, and each row's col-0 carries the
# per-segment SUFFIX MIN of t_lo so the kernel's near-to-far early exit
# reads a true lower bound under the (only approximately sorted) order.

import dataclasses as _dc


@_dc.dataclass(frozen=True)
class CellGrid:
    """Uniform-cell CSR over the robust extent (host-built, device-read).

    ``order[c]`` lists all G cells by center distance from cell c.
    ``bound[c]`` is a conservative radius such that every listed prim's
    surface lies within ``bound`` of the cell center (prims are listed in
    every cell their bounding AABB overlaps). Only prims whose bounding
    AABB lies FULLY inside the grid extent enter the cell CSRs — a hit on
    such a prim always lands in a covered cell. Everything else (clamped
    straddlers: a ground slab, an out-of-field light) goes to the
    per-type ``glob`` lists, which every packet includes verbatim with
    exact per-packet t_lo — without this split one huge clamped prim
    poisons the boundary cells' ``bound`` and pins t_safe at 0 scene-wide.
    ``off``/``ids`` are per-type (sphere, box, tri) CSRs of GLOBAL prim
    ids; ``cnt`` per-cell counts as f32. Static ``budget``/``base``/
    ``c_max`` fix the packed layout.
    """
    g: int
    centers: Array        # [G, 3]
    bound: Array          # [G]
    order: Array          # [G, G] i32
    off_s: Array          # [G+1] i32
    off_b: Array
    off_t: Array
    cnt_s: Array          # [G] f32
    cnt_b: Array
    cnt_t: Array
    ids_s: Array          # [Ks] i32
    ids_b: Array
    ids_t: Array
    glob_s: Array         # [n_gs] i32 out-of-grid prim ids (may be empty)
    glob_b: Array
    glob_t: Array
    lo: Array             # [3]
    inv_h: Array          # [3]
    budget: Tuple[int, int, int]
    base: Tuple[int, int, int]
    c_max: int


jax.tree_util.register_dataclass(
    CellGrid,
    data_fields=["centers", "bound", "order", "off_s", "off_b", "off_t",
                 "cnt_s", "cnt_b", "cnt_t", "ids_s", "ids_b", "ids_t",
                 "glob_s", "glob_b", "glob_t", "lo", "inv_h"],
    meta_fields=["g", "budget", "base", "c_max"])


def build_cell_grid(scene: Scene, g: int = 16,
                    c_sel: int = 4096) -> "CellGrid":
    """Host-side uniform-grid CSR build + distance-order table.

    Prims are listed (by global id, type-segregated) in every cell their
    bounding AABB overlaps — straddlers like a ground box simply occupy
    many cells. The grid spans the SMALL-prim robust extent (outliers
    clamp into boundary cells), mirroring render_tiled._robust_extent.
    ``c_sel`` sizes the static per-type row budgets (split by CSR mass).
    """
    centers, radii = bounding_spheres_np(scene)
    p = centers.shape[0]
    if p == 0:
        raise ValueError("empty scene has no candidate grid")
    med = np.median(radii) if p else 1.0
    small = radii <= 8.0 * med + 1e-12
    if not small.any():
        small = np.ones_like(small)
    lo = (centers - radii[:, None])[small].min(0) - 1e-3
    hi = (centers + radii[:, None])[small].max(0) + 1e-3
    h = np.maximum((hi - lo) / g, 1e-6)
    G = g ** 3

    # prims whose AABB pokes outside the extent go to the global lists:
    # their surface can lie where no cell exists, and their (possibly
    # huge) radius must not inflate any cell's bound
    in_grid = (((centers - radii[:, None]) >= lo - 1e-6).all(1)
               & ((centers + radii[:, None]) <= hi + 1e-6).all(1))

    clo = np.clip(np.floor((centers - radii[:, None] - lo) / h), 0,
                  g - 1).astype(np.int64)
    chi = np.clip(np.floor((centers + radii[:, None] - lo) / h), 0,
                  g - 1).astype(np.int64)
    span = chi - clo + 1
    # fast path: prims spanning <= 2 cells/axis are covered by their 8
    # AABB corner cells; the (few) larger straddlers get a python loop
    fast = (span <= 2).all(axis=1) & in_grid
    cell_lists = []   # (cell_lin, pid) pairs
    idx_fast = np.nonzero(fast)[0]
    if idx_fast.size:
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    cx = np.minimum(clo[idx_fast, 0] + dx, chi[idx_fast, 0])
                    cy = np.minimum(clo[idx_fast, 1] + dy, chi[idx_fast, 1])
                    cz = np.minimum(clo[idx_fast, 2] + dz, chi[idx_fast, 2])
                    cell_lists.append(((cx * g + cy) * g + cz, idx_fast))
    for i in np.nonzero(~fast & in_grid)[0]:
        xs = np.arange(clo[i, 0], chi[i, 0] + 1)
        ys = np.arange(clo[i, 1], chi[i, 1] + 1)
        zs = np.arange(clo[i, 2], chi[i, 2] + 1)
        cc = ((xs[:, None, None] * g + ys[None, :, None]) * g
              + zs[None, None, :]).ravel()
        cell_lists.append((cc, np.full(cc.shape, i, np.int64)))
    cell_lin = np.concatenate([c for c, _ in cell_lists])
    pid_lin = np.concatenate([pp for _, pp in cell_lists])
    # dedupe (corner cells coincide when span == 1)
    key = cell_lin * p + pid_lin
    key = np.unique(key)
    cell_lin = key // p
    pid_lin = key % p

    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes
    halfdiag = float(np.linalg.norm(h) / 2.0)
    offs, cnts, idss, globs = [], [], [], []
    bound = np.full(G, halfdiag, np.float64)
    for t_lo_, t_hi_ in ((0, s_end), (s_end, b_end), (b_end, p)):
        gm = ~in_grid & (np.arange(p) >= t_lo_) & (np.arange(p) < t_hi_)
        globs.append(np.nonzero(gm)[0].astype(np.int32))
        m = (pid_lin >= t_lo_) & (pid_lin < t_hi_)
        cl, pi = cell_lin[m], pid_lin[m]
        ordr = np.argsort(cl, kind="stable")
        cl, pi = cl[ordr], pi[ordr]
        cnt = np.bincount(cl, minlength=G)
        off = np.concatenate([[0], np.cumsum(cnt)]).astype(np.int64)
        offs.append(off)
        cnts.append(cnt.astype(np.float32))
        idss.append(pi.astype(np.int32) if pi.size
                    else np.zeros((1,), np.int32))
        if pi.size:
            # exact enclosing radius of listed prim surfaces per cell:
            # max over listed prims of |prim_center - cell_center| + r.
            # (The generic halfdiag + (sqrt(3)+1)*r_max bound is ~20% fatter
            # and directly shrinks every packet's resolution radius.)
            cell_c = lo + (np.stack([cl // (g * g), (cl // g) % g, cl % g],
                                    axis=1) + 0.5) * h
            reach = np.linalg.norm(centers[pi] - cell_c, axis=1) + radii[pi]
            rmax = np.zeros(G)
            np.maximum.at(rmax, cl, reach)
            bound = np.maximum(bound, rmax)

    gi = np.arange(g)
    ccenters = lo + (np.stack(np.meshgrid(gi, gi, gi, indexing="ij"),
                              axis=-1).reshape(-1, 3) + 0.5) * h
    d2 = ((ccenters[:, None, :] - ccenters[None, :, :]) ** 2).sum(-1)
    order = np.argsort(d2, axis=1, kind="stable").astype(np.int32)

    mass = np.array([max(int(c.sum()), 0) for c in cnts], np.float64)
    tot = max(mass.sum(), 1.0)
    budget, base = [], []
    a = 0
    for k in range(3):
        bk = 0
        if mass[k] > 0:
            bk = int(max(2 * SEG_ALIGN,
                         min(_pad_align(int(c_sel * mass[k] / tot)),
                             _pad_align(int(mass[k])))))
        base.append(a)
        budget.append(bk)
        # segment capacity: globals prefix + cell rows, CHUNK-aligned
        a += _pad_align(len(globs[k]) + bk) if (bk or len(globs[k])) else 0
    gnp = [gl if gl.size else np.zeros((0,), np.int32) for gl in globs]
    return CellGrid(
        g=g, centers=jnp.asarray(ccenters, jnp.float32),
        bound=jnp.asarray(bound, jnp.float32),
        order=jnp.asarray(order),
        off_s=jnp.asarray(offs[0]), off_b=jnp.asarray(offs[1]),
        off_t=jnp.asarray(offs[2]),
        cnt_s=jnp.asarray(cnts[0]), cnt_b=jnp.asarray(cnts[1]),
        cnt_t=jnp.asarray(cnts[2]),
        ids_s=jnp.asarray(idss[0]), ids_b=jnp.asarray(idss[1]),
        ids_t=jnp.asarray(idss[2]),
        glob_s=jnp.asarray(gnp[0]), glob_b=jnp.asarray(gnp[1]),
        glob_t=jnp.asarray(gnp[2]),
        lo=jnp.asarray(lo, jnp.float32),
        inv_h=jnp.asarray(1.0 / h, jnp.float32),
        budget=tuple(budget), base=tuple(base),
        c_max=max(a, SEG_ALIGN))


def packet_candidates_grid(scene: Scene, grid: "CellGrid", org: Array,
                           dir: Array, alive: Array, packet: int,
                           t_done: Array | None = None,
                           table: Array | None = None):
    """Sort-free traced candidate tables from the cell grid.

    Same contract as :func:`packet_candidates` — returns
    ``(tab [B*c_max, N_ATTR], cnts [B, 8], t_safe [B])`` with col 0 of
    ``tab`` holding the per-segment SUFFIX MIN of the cell t_lo bounds
    (see module note) — plus the STATIC segment bases the kernel needs
    (`grid.base`), since the cell path lays types out at fixed offsets.
    """
    b = org.shape[0] // packet
    G = grid.centers.shape[0]
    o0, ro, axis, cos_t = packet_cones(org, dir, alive, packet)
    v = grid.centers[None] - o0[:, None]                       # [B, G, 3]
    cdist = jnp.linalg.norm(v, axis=-1)
    t_lo_c = jnp.maximum(cdist - grid.bound[None], 0.0)
    rr = grid.bound[None] + ro[:, None]
    inside = cdist <= rr * (1.0 + 1e-5) + 1e-7
    sin_a = jnp.clip(rr / jnp.maximum(cdist, 1e-20), 0.0, 1.0)
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
    cos_b = jnp.einsum("bgk,bk->bg", v, axis,
                       precision=jax.lax.Precision.HIGHEST
                       ) / jnp.maximum(cdist, 1e-20)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    keep = inside | (cos_b >= cos_a * cos_t[:, None]
                     - sin_a * sin_t[:, None] - 1e-5)
    keep = keep | (cos_t[:, None] < 0.25)
    keep = keep & (cos_t[:, None] <= 1.0)          # all-dead packet: none
    if t_done is not None:
        live = alive.reshape(b, packet)
        d_c = jnp.linalg.norm(org.reshape(b, packet, 3) - o0[:, None],
                              axis=-1)
        floor = jnp.min(jnp.where(live,
                                  t_done.reshape(b, packet) - d_c,
                                  jnp.inf), axis=1)
        floor = jnp.where(jnp.isfinite(floor), floor, -jnp.inf)
        keep = keep & (cdist + grid.bound[None] > floor[:, None])

    # visit order anchored at the packet's own cell
    q = jnp.clip(((o0 - grid.lo[None]) * grid.inv_h[None]).astype(jnp.int32),
                 0, grid.g - 1)
    c0 = (q[:, 0] * grid.g + q[:, 1]) * grid.g + q[:, 2]       # [B]
    order = grid.order[c0]                                     # [B, G]
    keep_o = jnp.take_along_axis(keep, order, axis=1)
    tlo_o = jnp.take_along_axis(t_lo_c, order, axis=1)

    centers_all, radii_all = bounding_spheres_jnp(scene)
    pid_rows, tlo_rows, counts, safes = [], [], [], []
    for cnt_c, off_c, ids_c, glob, budget in (
            (grid.cnt_s, grid.off_s, grid.ids_s, grid.glob_s,
             grid.budget[0]),
            (grid.cnt_b, grid.off_b, grid.ids_b, grid.glob_b,
             grid.budget[1]),
            (grid.cnt_t, grid.off_t, grid.ids_t, grid.glob_t,
             grid.budget[2])):
        n_g = int(glob.shape[0])
        if budget == 0 and n_g == 0:
            counts.append(jnp.zeros((b,), jnp.float32))
            safes.append(jnp.full((b,), jnp.inf, jnp.float32))
            continue
        # out-of-grid prims: always included, exact per-packet t_lo
        if n_g:
            gc = centers_all[glob]                             # [n_g, 3]
            gr = radii_all[glob]
            gdist = jnp.linalg.norm(gc[None] - o0[:, None], axis=-1)
            g_tlo = jnp.maximum(gdist - gr[None], 0.0)         # [B, n_g]
            g_pid = jnp.broadcast_to(glob[None], (b, n_g))
        if budget:
            cnt_o = jnp.take_along_axis(
                jnp.broadcast_to(cnt_c[None], (b, G)), order, axis=1)
            cnt_o = jnp.where(keep_o, cnt_o, 0.0)
            cum = jnp.cumsum(cnt_o, axis=1)                    # [B, G] f32
            sel = cum <= float(budget)                         # whole cells
            n_rows = jnp.max(jnp.where(sel, cum, 0.0), axis=1)  # [B]
            t_safe_t = jnp.min(jnp.where(keep_o & ~sel, tlo_o, jnp.inf),
                               axis=1)
            jq = jnp.arange(budget, dtype=jnp.float32)[None]   # [1, Q]
            rj = jax.vmap(
                lambda c, q_: jnp.searchsorted(c, q_, side="right"))(
                    cum, jnp.broadcast_to(jq, (b, budget)))    # [B, Q]
            rj = jnp.minimum(rj, G - 1)
            valid = jq < n_rows[:, None]
            cell_j = jnp.take_along_axis(order, rj, axis=1)
            prev = jnp.where(rj > 0,
                             jnp.take_along_axis(cum,
                                                 jnp.maximum(rj - 1, 0),
                                                 axis=1), 0.0)
            base_j = off_c[cell_j]
            local = (jq - prev).astype(jnp.int32)
            idx = jnp.clip(base_j + local, 0, ids_c.shape[0] - 1)
            pid = jnp.where(valid, ids_c[idx], -1)
            tlo_row = jnp.where(valid,
                                jnp.take_along_axis(tlo_o, rj, axis=1),
                                jnp.inf)
        else:
            n_rows = jnp.zeros((b,), jnp.float32)
            t_safe_t = jnp.full((b,), jnp.inf, jnp.float32)
            pid = jnp.full((b, 0), -1, jnp.int32)
            tlo_row = jnp.full((b, 0), jnp.inf, jnp.float32)
        if n_g:
            # globals prefix: valid rows must stay contiguous, so the
            # (always-valid) globals go first, cell rows after
            pid = jnp.concatenate([g_pid, pid], axis=1)
            tlo_row = jnp.concatenate([g_tlo, tlo_row], axis=1)
            n_rows = n_rows + n_g
        # per-segment suffix min -> a true lower bound for the kernel's
        # early exit under the approximate visit order
        tlo_row = jnp.flip(
            jax.lax.cummin(jnp.flip(tlo_row, axis=1), axis=1), axis=1)
        width = n_g + budget
        pad = _pad_align(width) - width
        if pad:
            pid = jnp.pad(pid, ((0, 0), (0, pad)), constant_values=-1)
            tlo_row = jnp.pad(tlo_row, ((0, 0), (0, pad)),
                              constant_values=jnp.inf)
        pid_rows.append(pid)
        tlo_rows.append(tlo_row)
        counts.append(n_rows)
        safes.append(t_safe_t)

    pid_all = (jnp.concatenate(pid_rows, axis=1) if pid_rows
               else jnp.full((b, SEG_ALIGN), -1, jnp.int32))
    tlo_all = (jnp.concatenate(tlo_rows, axis=1) if tlo_rows
               else jnp.full((b, SEG_ALIGN), jnp.inf))
    t_safe = jnp.minimum(jnp.minimum(safes[0], safes[1]), safes[2])
    cnts = jnp.concatenate(
        [jnp.stack(counts, axis=1), t_safe[:, None], o0, ro[:, None]],
        axis=1)
    tab = pack_candidate_attrs_jnp(scene, pid_all.reshape(-1),
                                   tlo_all.reshape(-1), table=table)
    return tab, cnts, t_safe
