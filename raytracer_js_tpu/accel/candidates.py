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
from ..models.scene import Scene

Array = jnp.ndarray

N_ATTR = 20


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
    from ..config import TextureKind

    safe = np.clip(pid, 0, max(scene.n_prims - 1, 0))
    tex_id = np.asarray(scene.prim_texture)[safe]
    rgb = np.asarray(scene.textures.solid_rgb)[tex_id]
    is_img = (np.asarray(scene.textures.kind)[tex_id]
              == int(TextureKind.IMAGE))
    rgb = np.where(is_img[:, None], 1.0, rgb)
    mat_id = np.asarray(scene.prim_material)[safe]
    mat = scene.materials
    light = np.asarray(mat.light)[mat_id]
    cont = (np.asarray(mat.mirror)[mat_id]
            & (np.asarray(mat.response)[mat_id]
               == int(ResponseType.REFLECTION)) & ~light)
    return np.concatenate(
        [rgb, (2.0 * light + 1.0 * cont)[:, None]], axis=1).astype(np.float32)


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
    """Type-segregate included prim ids, each segment sorted by t_lo ->
    (ordered ids, ordered t_lo, (cnt_s, cnt_b, cnt_t))."""
    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes
    segs, tls, cnts = [], [], []
    for lo, hi in ((0, s_end), (s_end, b_end), (b_end, scene.n_prims)):
        m = (ids >= lo) & (ids < hi)
        sid = ids[m]
        stl = t_lo[sid] if sid.size else np.zeros((0,))
        order = np.argsort(stl, kind="stable")
        segs.append(sid[order])
        tls.append(stl[order])
        cnts.append(len(sid))
    return (np.concatenate(segs), np.concatenate(tls),
            np.asarray(cnts, np.int32))


def frame_candidates(scene: Scene, cam, sub: int, lane: int,
                     c_max: int | None = None):
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

    lists, tlos, cnts = [], [], []
    for by in range(nby):
        cv, sv = np.cos(thc_v[by]), np.sin(thc_v[by])
        for bx in range(nbx):
            ch, sh = np.cos(thc_h[bx]), np.sin(thc_h[bx])
            axis = ch * cv * front + ch * sv * up + sh * left
            axis /= np.linalg.norm(axis)
            theta = th_h[bx] + th_v[by] + 1e-4
            inc, t_lo = cone_include_np(centers, radii, pos, 0.0,
                                        axis, np.cos(theta))
            ids, tl, cnt = _segment_sort_np(scene, np.nonzero(inc)[0], t_lo)
            lists.append(ids)
            tlos.append(tl)
            cnts.append(cnt)

    maxlen = max((len(l) for l in lists), default=1)
    if c_max is None:
        c_max = max(8, -(-maxlen // 8) * 8)
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
    tab = pack_candidate_attrs_np(scene, pid.reshape(-1), tlo.reshape(-1))
    cnt4 = np.zeros((t, 4), np.int32)
    cnt4[:, :3] = np.stack(cnts)
    return jnp.asarray(tab), jnp.asarray(cnt4), c_max


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
    dots = jnp.einsum("bpk,bk->bp", d, axis)
    cos_t = jnp.min(jnp.where(m[..., 0] > 0, dots, 1.0), axis=1)
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    any_live = m[..., 0].sum(axis=1) > 0
    return o0, ro, axis, jnp.where(any_live, cos_t, 2.0)


def packet_candidates(scene: Scene, org: Array, dir: Array, alive: Array,
                      packet: int, c_max: int):
    """Traced per-packet candidate tables -> (tab [B*c_max, N_ATTR] f32,
    cnts [B, 4] i32, overflow [B] bool).

    Same contract as :func:`frame_candidates` but computed on device for
    mid-trace ray packets. Wide packets (direction spread beyond the cone
    identity) conservatively include everything. Packets whose include
    count exceeds ``c_max`` keep only the nearest ``c_max`` by t_lo and are
    flagged in ``overflow`` — the caller decides how to resolve them
    (render_tiled re-traces overflow packets against the full scene).
    """
    centers, radii = bounding_spheres_jnp(scene)
    o0, ro, axis, cos_t = packet_cones(org, dir, alive, packet)
    v = centers[None] - o0[:, None]                               # [B, P, 3]
    dist = jnp.linalg.norm(v, axis=-1)
    rr = radii[None] + ro[:, None]
    inside = dist <= rr * (1.0 + 1e-5) + 1e-7
    sin_a = jnp.clip(rr / jnp.maximum(dist, 1e-20), 0.0, 1.0)
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a * sin_a, 0.0))
    cos_b = jnp.einsum("bpk,bk->bp", v, axis) / jnp.maximum(dist, 1e-20)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    include = inside | (cos_b >= cos_a * cos_t[:, None]
                        - sin_a * sin_t[:, None] - 1e-5)
    include = include | (cos_t[:, None] < 0.25)
    include = include & (cos_t[:, None] <= 1.0)    # all-dead packet: none
    t_lo = jnp.maximum(dist - rr, 0.0)

    # type-segregated sort key: (type segment, excluded, t_lo) ascending
    p = centers.shape[0]
    pid_all = jnp.arange(p, dtype=jnp.int32)
    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes
    seg = jnp.where(pid_all < s_end, 0, jnp.where(pid_all < b_end, 1, 2))
    big = jnp.float32(1e30)
    key = (seg[None].astype(jnp.float32) * 4e30
           + jnp.where(include, t_lo, big))
    order = jnp.argsort(key, axis=1)[:, :c_max]                   # [B, C]
    pid = jnp.take_along_axis(
        jnp.broadcast_to(pid_all[None], include.shape), order, axis=1)
    inc_sel = jnp.take_along_axis(include, order, axis=1)
    tlo_sel = jnp.take_along_axis(t_lo, order, axis=1)
    pid = jnp.where(inc_sel, pid, -1)

    cnt_seg = jnp.stack(
        [jnp.sum(include & (seg[None] == k), axis=1) for k in range(3)],
        axis=1).astype(jnp.int32)                                  # [B, 3]
    # truncation: per segment, how many of the first c_max selected rows
    # belong to it (selection is segment-major, nearest-first)
    csum = jnp.cumsum(cnt_seg, axis=1)
    kept = jnp.minimum(csum, c_max)
    kept = jnp.concatenate([kept[:, :1],
                            kept[:, 1:] - kept[:, :-1]], axis=1)
    overflow = jnp.sum(cnt_seg, axis=1) > c_max
    cnts = jnp.concatenate(
        [kept, jnp.zeros((kept.shape[0], 1), jnp.int32)], axis=1)

    tab = pack_candidate_attrs_jnp(scene, pid.reshape(-1),
                                   tlo_sel.reshape(-1))
    return tab, cnts, overflow


def pack_candidate_attrs_jnp(scene: Scene, pid: Array, t_lo: Array) -> Array:
    """Traced equivalent of :func:`pack_candidate_attrs_np` (gathers)."""
    n = pid.shape[0]
    out = jnp.zeros((n, N_ATTR), jnp.float32)
    out = out.at[:, 0].set(jnp.where(pid >= 0, t_lo, jnp.inf))
    out = out.at[:, 1].set(jnp.maximum(pid, 0).astype(jnp.float32))
    from ..config import TextureKind

    safe = jnp.clip(pid, 0, max(scene.n_prims - 1, 0))
    tex_id = scene.prim_texture[safe]
    rgb = scene.textures.solid_rgb[tex_id]
    is_img = scene.textures.kind[tex_id] == int(TextureKind.IMAGE)
    rgb = jnp.where(is_img[:, None], 1.0, rgb)   # identity: XLA glue samples
    mat_id = scene.prim_material[safe]
    mat = scene.materials
    light = mat.light[mat_id]
    cont = (mat.mirror[mat_id]
            & (mat.response[mat_id] == int(ResponseType.REFLECTION))
            & ~light)
    out = out.at[:, 14:17].set(rgb)
    out = out.at[:, 17].set(2.0 * light + 1.0 * cont)

    s_end = scene.n_spheres
    b_end = s_end + scene.n_boxes
    if scene.n_spheres:
        i = jnp.clip(safe, 0, s_end - 1)
        c = scene.sphere_center[i]
        r = scene.sphere_radius[i]
        m = (pid >= 0) & (pid < s_end)
        geo = jnp.concatenate(
            [c, (jnp.sum(c * c, -1) - r * r)[:, None],
             (1.0 / jnp.maximum(r, 1e-20))[:, None],
             jnp.zeros((n, 7), jnp.float32)], axis=1)
        out = out.at[:, 2:14].set(jnp.where(m[:, None], geo, out[:, 2:14]))
    if scene.n_boxes:
        i = jnp.clip(safe - s_end, 0, scene.n_boxes - 1)
        m = (pid >= s_end) & (pid < b_end)
        geo = jnp.concatenate(
            [scene.box_center[i], scene.box_half[i],
             jnp.zeros((n, 6), jnp.float32)], axis=1)
        out = out.at[:, 2:14].set(jnp.where(m[:, None], geo, out[:, 2:14]))
    if scene.n_tris:
        i = jnp.clip(safe - b_end, 0, scene.n_tris - 1)
        m = pid >= b_end
        v0 = scene.tri_v0[i]
        e1 = scene.tri_v1[i] - v0
        e2 = scene.tri_v2[i] - v0
        gn = jnp.cross(e1, e2)
        gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True),
                              1e-20)
        geo = jnp.concatenate([v0, e1, e2, gn], axis=1)
        out = out.at[:, 2:14].set(jnp.where(m[:, None], geo, out[:, 2:14]))
    return out
