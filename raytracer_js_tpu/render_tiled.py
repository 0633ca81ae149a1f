"""Big-scene frame renderer: tiled candidate-list kernel + packet re-binning.

Drives kernels/trace_tiled across bounces:

* bounce 0 — rays are generated inside the frame kernel; candidates come
  from the camera-frustum tile cones (accel/candidates.frame_candidates,
  host-built once per camera pose and reusable across frames);
* bounces >= 1 — continuing rays have divergent origins/directions, so
  between kernel calls the wavefront is re-sorted into coherent packets
  (position cell x direction bin — SURVEY.md §7 hard part 1's "per-tile ray
  coherence sorting"), per-packet candidate tables are built on device
  (accel/candidates.packet_candidates), and the wavefront kernel advances
  one bounce. Dead rays sort to the end; all-dead packets carry empty
  candidate lists and cost one skipped scan.

The terminal semantics (EXHAUST blackout raytracer.ts:256-263, light-hit
inverse-square attenuation :273-275) are applied in a final fused XLA
epilogue, exactly as ops/trace.trace_rays does.

Shading coverage: the FULL model. Solid-color winners modulate in-kernel;
image textures / image sky sample the atlas in the XLA glue from in-kernel
(u, v); roughness scatters and transmission refracts in the glue with the
same counter-RNG streams and Snell/TIR math as every other backend
(`_respawn_glue`, tests/test_tiled.py:105-232). There is no off-class
fallback for this path — ``supports`` returns True.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .accel import candidates as cand
from .config import (HitBackend, JS_EPSILON, RayStatus, RenderConfig,
                     TextureKind)
from .kernels import trace_tiled as tt
from .models import textures as tex_mod
from .models.scene import Scene

Array = jnp.ndarray

#: packet size — must equal the wavefront kernel's ray tile
PACKET = tt.WAVE_SUB * tt.LANE

#: packets per compaction segment: each round's per-packet work runs under
#: a lax.cond per segment, skipped entirely when the segment has no ALIVE
#: ray (live rays sort to the front, so cost ~ live wavefront size)
SEG_PACKETS = int(__import__("os").environ.get("RT_TILED_SEG", "128"))


def supports(scene: Scene) -> bool:
    """The full shading model: image textures/skies (uv in-kernel, atlas
    sampling in the XLA glue), roughness (counter-RNG scatter in the glue,
    same streams as every other backend) and transmission (grid-accelerated
    substance point query + Snell/TIR in the glue) are all handled."""
    return True


def frame_tables(scene: Scene, cam, packet_c_max: int = 4096):
    """Host-side bounce-0 candidate tables + the packet-round cell grid
    (cache across frames while the camera pose and scene geometry are
    unchanged). Returns ``(tab, cnts, c_max, grid)``."""
    tab, cnts, c_max = cand.frame_candidates(scene, cam, tt.TILE_SUB,
                                             tt.LANE)
    grid = cand.build_cell_grid(scene, c_sel=packet_c_max)
    return tab, cnts, c_max, grid


def _dir_bin(d: Array) -> Array:
    """Coarse direction bin (4 levels/axis, 64 bins) for packet coherence."""
    q = jnp.clip(((d + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    return (q[:, 0] * 4 + q[:, 1]) * 4 + q[:, 2]


def _spread3(x: Array) -> Array:
    """Spread the low 8 bits of x so consecutive bits land 3 apart
    (Part1By2 magic) — uint32 in/out."""
    x = x.astype(jnp.uint32) & jnp.uint32(0xFF)
    x = (x * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    x = (x * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    x = (x * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    x = (x * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return x


def _morton_key(scene: Scene, org: Array, bits: int = 8) -> Array:
    """Fine Morton code of ray positions over the robust extent -> i32.

    Retry rounds bin marching stragglers by (direction bin, this key):
    consecutive rays of one bin+Morton range are spatially compact AND
    direction coherent, so every packet gets a tight centroid ball (small
    d_c — the r2 stall mode was sprawling packets with ro > t_safe) and a
    bounding cone that actually fires (one backward ray in a packet
    collapses cos_t to -1 and turns candidate selection into an isotropic
    ball wave, wasting half the budget on primitives behind the march).
    """
    lo, hi = _robust_extent(scene)
    rel = (org - lo) / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((rel * (1 << bits)).astype(jnp.int32), 0, (1 << bits) - 1)
    code = (_spread3(q[:, 0]) | (_spread3(q[:, 1]) << 1)
            | (_spread3(q[:, 2]) << 2))
    return code.astype(jnp.int32)


def _robust_extent(scene: Scene):
    """(lo, hi) of the SMALL-primitive population (huge straddlers like the
    ground box excluded — they would flatten every quantization)."""
    centers, radii = cand.bounding_spheres_jnp(scene)
    med = jnp.median(radii) if radii.shape[0] else jnp.float32(1.0)
    small = radii <= 8.0 * med + 1e-12
    big = jnp.float32(1e30)
    lo = jnp.min(jnp.where(small[:, None], centers - radii[:, None], big),
                 axis=0)
    hi = jnp.max(jnp.where(small[:, None], centers + radii[:, None], -big),
                 axis=0)
    return lo, hi


def _pos_cell(scene: Scene, org: Array, grid: int = 16) -> Array:
    """Binning cell over the SMALL-primitive population bounds.

    A single huge straddler (the ground box) must not inflate the binning
    box: packets would then mix rays from across the whole scene, their
    origin balls would cover every primitive (t_lo = 0 for everything) and
    the resolution bound would pin at 0 — the octree root build uses the
    same robust-extent heuristic (accel/octree.build_octree).
    """
    lo, hi = _robust_extent(scene)
    rel = (org - lo) / jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((rel * grid).astype(jnp.int32), 0, grid - 1)
    return (q[:, 0] * grid + q[:, 1]) * grid + q[:, 2]


def _apply_images(scene: Scene, colors, dirs, status, prev_alive, pid, u, v):
    """Image-texture + (possibly image) sky modulation for one bounce.

    The kernel multiplies solid colors in-place but leaves image-textured
    winners at identity (their packed rgb is 1) and skips sky modulation
    entirely when the scene has images; this glue samples the atlas for
    image-kind winners and applies the sky to lanes that MISSed this bounce.
    ``colors`` is a [n, 3] array; all masks are [n].
    """
    hit = pid >= 0
    pid_c = jnp.clip(pid, 0, max(scene.n_prims - 1, 0))
    tex_id = scene.prim_texture[pid_c]
    kind = scene.textures.kind[jnp.clip(tex_id, 0,
                                        scene.textures.kind.shape[0] - 1)]
    is_img = hit & tex_mod.is_image_kind(kind)
    smp = tex_mod.sample(scene.textures, tex_id, u, v)
    colors = jnp.where(is_img[:, None], colors * smp, colors)
    newly_miss = prev_alive & (status == int(RayStatus.MISS))
    from .ops.trace import sky_color

    sky = sky_color(scene, dirs)
    return jnp.where(newly_miss[:, None], colors * sky, colors)


def _respawn_glue(scene: Scene, accel, seed, rid, bounce, refr,
                  org, dirs, status, pid, t, nrm):
    """Rough-scatter and transmission continuation fixups for one bounce.

    The tiled kernel respawns mirror continuations in-kernel (pure
    reflection) and leaves transmission continuations (mode 3) completely
    untouched; this glue — mirroring ops/trace._bounce exactly —

    * replaces the reflected direction with the counter-RNG scatter for
      rough mirror winners (same (seed, rid, bounce) streams as the
      XLA/fused paths -> cross-backend parity), re-advancing the origin
      along the scattered direction;
    * advances + refracts transmission winners: eps-advance along the OLD
      direction, innermost-containment substance query at the advanced
      point (octree grid candidates when ``accel`` is given — mandatory at
      large prim counts), Snell + TIR via ops/vecmath.refract.

    ``org``/``dirs`` are the kernel outputs [n, 3]; ``nrm`` is the flipped
    winner normal; ``refr`` the per-ray refractive index. Returns
    ``(org, dirs, refr)``.
    """
    from .config import EPS_ADVANCE, ResponseType
    from .ops import sampling
    from .ops.trace import substance_refr_at
    from .ops.vecmath import refract

    alive = status == int(RayStatus.ALIVE)
    cont = alive & (pid >= 0)
    pid_c = jnp.clip(pid, 0, max(scene.n_prims - 1, 0))
    mat_id = scene.prim_material[pid_c]
    mat = scene.materials
    resp = mat.response[mat_id]
    if scene.has_rough:
        rough = mat.roughness[mat_id]
        m_r = (cont & (resp == int(ResponseType.REFLECTION))
               & mat.mirror[mat_id] & (rough > 0.0))
        # invert the kernel's eps-advance to recover the hit point
        hit = org - EPS_ADVANCE * dirs
        scat = sampling.scatter_direction(seed, rid, bounce, dirs, nrm,
                                          rough)
        dirs = jnp.where(m_r[:, None], scat, dirs)
        org = jnp.where(m_r[:, None], hit + EPS_ADVANCE * scat, org)
    if scene.has_transmission:
        is_t = cont & (resp == int(ResponseType.TRANSMISSION))
        # org/dirs are untouched by the kernel for mode-3 winners
        hit = org + t[:, None] * dirs
        adv = hit + EPS_ADVANCE * dirs
        target, do_refract = substance_refr_at(scene, adv, refr,
                                               accel=accel)
        eta = refr / jnp.maximum(target, 1e-6)
        refr_dir, _tir = refract(dirs, nrm, eta)
        new_dir = jnp.where(do_refract[:, None], refr_dir, dirs)
        new_refr = jnp.where(do_refract, target, refr)
        dirs = jnp.where(is_t[:, None], new_dir, dirs)
        org = jnp.where(is_t[:, None], adv, org)
        refr = jnp.where(is_t, new_refr, refr)
    return org, dirs, refr


#: internal status marking rays at the bounce cap so the kernel ignores
#: them without losing their ALIVE-ness (mapped back after each round)
_CAP = 7

#: opt-in: the sweep kernel's IN-KERNEL block-cone tile cull (a scalar
#: cone predicate per 128-sphere tile). Measured r3 at config 4 and
#: REJECTED as the default: even with (cell, direction)-coherent blocks
#: the per-tile lax.cond chain breaks Mosaic's tile streaming pipeline
#: (0.934 s plain vs 1.151 s culled); kept behind RT_SWEEP_CULL=1
SWEEP_CULL = __import__("os").environ.get("RT_SWEEP_CULL", "0") == "1"

#: r4 default: the LISTED sweep cull — the same conservative block-cone
#: predicate evaluated in XLA over [B blocks x T tiles] (a trivial batched
#: op), emitting per-block tile-id lists the kernel streams WITHOUT any
#: per-tile cond (kernels/nearest_hit tile_ids=). This keeps Mosaic's
#: pipelining (the r3 in-kernel cull's failure mode) while skipping the
#: same tiles. RT_SWEEP_LISTED=0 opts out.
SWEEP_LISTED = __import__("os").environ.get("RT_SWEEP_LISTED", "1") == "1"


#: listed-cull id-table width cap (the [8, T] SMEM window budget); tables
#: denser than LISTED_MAX_TILES 128-prim tiles get a supertile fan
LISTED_MAX_TILES = int(__import__("os").environ.get("RT_LISTED_MAX_TILES",
                                                    "2048"))


def _block_tile_select(org: Array, dirs: Array, working: Array, tb: Array):
    """Per-ray-block conservative sphere-tile selection for the listed
    sweep kernel -> (ids [B, T] i32 in ascending-t_lo order,
    tlo [B, T] f32 with +inf on excluded slots).

    Blocks are consecutive BLOCK_R-ray runs of the (cell, direction)-sorted
    compacted slice; each gets an apex ball (o0, ro) over its WORKING rays
    plus a direction cone (axis = mean dir, cos_t = worst alignment), and a
    Morton sphere tile is included iff the ball-cone can reach its bounding
    sphere — the same conservative identity as accel/candidates
    .cone_include_np, so the cull is EXACT (a prim outside the cone cannot
    be hit by any working ray of the block at any t >= 0). Dead rows are
    excluded from the statistics (a padded direction would collapse cos_t).
    """
    from .kernels.nearest_hit import BLOCK_R

    n = org.shape[0]
    assert n % BLOCK_R == 0, (n, BLOCK_R)
    nb = n // BLOCK_R
    o = org.reshape(nb, BLOCK_R, 3)
    d = dirs.reshape(nb, BLOCK_R, 3)
    m = working.reshape(nb, BLOCK_R, 1).astype(org.dtype)
    cnt_live = jnp.maximum(m.sum(axis=1), 1.0)              # [B, 1]
    o0 = (o * m).sum(axis=1) / cnt_live                     # [B, 3]
    ro = jnp.sqrt(jnp.max(((o - o0[:, None]) ** 2).sum(-1) * m[..., 0],
                          axis=1))                          # [B]
    ax = (d * m).sum(axis=1)
    ax = ax / jnp.maximum(
        jnp.linalg.norm(ax, axis=-1, keepdims=True), 1e-20)
    d_n = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                          1e-20)
    cos_t = jnp.min(jnp.where(m[..., 0] > 0,
                              (d_n * ax[:, None]).sum(-1), 1.0), axis=1)
    use_cone = cos_t >= 0.25
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t ** 2, 0.0))
    v = tb[None, :, :3] - o0[:, None, :]                    # [B, T, 3]
    dist = jnp.linalg.norm(v, axis=-1)
    rr = tb[None, :, 3] + ro[:, None]
    inside = dist <= rr * (1.0 + 1e-5) + 1e-7
    sin_a = jnp.minimum(rr / jnp.maximum(dist, 1e-20), 1.0)
    cos_a = jnp.sqrt(jnp.maximum(1.0 - sin_a ** 2, 0.0))
    cos_b = (v * ax[:, None]).sum(-1) / jnp.maximum(dist, 1e-20)
    include = (inside
               | (cos_b >= cos_a * cos_t[:, None]
                  - sin_a * sin_t[:, None] - 1e-5)
               | ~use_cone[:, None])
    # conservative per-(block, tile) entry distance: any block ray's hit
    # against the tile's prims is >= max(0, |c - o0| - r_tile - ro); the
    # kernel streams tiles in ascending t_lo and EARLY-EXITS, so the sort
    # key is the t_lo itself (excluded tiles -> +inf slots)
    t_lo = jnp.where(include, jnp.maximum(dist - rr, 0.0), jnp.inf)
    t_tiles = tb.shape[0]
    order = jnp.argsort(t_lo, axis=1)
    ids = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(t_tiles, dtype=jnp.int32)[None, :],
                         t_lo.shape), order, axis=1)
    tlo_sorted = jnp.take_along_axis(t_lo, order, axis=1)
    return ids, tlo_sorted


def _sweep_perm(scene: Scene):
    """Morton-permuted prim tables + per-128-tile bounds for the sweep
    kernel culls -> (scene_view, sph, tri) with each class entry
    ``(perm [n] i32, tb [T, 4] f32)`` or None.

    The whole-table kernel streams prim tiles past coherent ray blocks;
    with a class in Morton order each 128-prim tile is spatially tight, so
    per-block tile selection (listed cull + near-to-far early exit) or the
    legacy in-kernel cone predicate can skip most of it. Only GEOMETRY is
    permuted — winners map back to global ids before shading, so
    id-indexed tables stay untouched. A class participates only when it
    has >= 4 * BLOCK_K primitives; returns None when neither does.
    """
    from .kernels.nearest_hit import BLOCK_K

    def class_fan(n):
        # supertile fan: coarsen the listed granularity until the id
        # table fits its [8, T] SMEM window (r4's 2048-tile cap) — this
        # is what turns the listed cull + near-to-far exit ON for
        # million-prim tables (r5; they were silently dense before)
        fan = 1
        while -(-(-(-n // BLOCK_K)) // fan) > LISTED_MAX_TILES:
            fan *= 2
        return fan

    def tile_bounds(c_p, r_p, fan):
        blk = BLOCK_K * fan
        n = c_p.shape[0]
        T = -(-n // blk)
        pad = T * blk - n
        cp = (jnp.concatenate([c_p, jnp.broadcast_to(c_p[-1:], (pad, 3))])
              if pad else c_p)
        rp = (jnp.concatenate([r_p, jnp.zeros((pad,), r_p.dtype)])
              if pad else r_p)
        cpt = cp.reshape(T, blk, 3)
        rpt = rp.reshape(T, blk)
        tc = 0.5 * (cpt.min(axis=1) + cpt.max(axis=1))
        tr = jnp.max(jnp.linalg.norm(cpt - tc[:, None], axis=-1) + rpt,
                     axis=1)
        return jnp.concatenate([tc, tr[:, None]], axis=1)

    scene_p = scene
    sph = tri = None
    if scene.n_spheres >= 4 * BLOCK_K:
        code = _morton_key(scene, scene.sphere_center, bits=8)
        perm = jnp.argsort(code).astype(jnp.int32)
        c_p = scene.sphere_center[perm]
        r_p = scene.sphere_radius[perm]
        scene_p = scene_p.replace(sphere_center=c_p, sphere_radius=r_p)
        fan = class_fan(scene.n_spheres)
        sph = (perm, tile_bounds(c_p, r_p, fan), fan)
    if scene.n_tris >= 4 * BLOCK_K:
        cent = (scene.tri_v0 + scene.tri_v1 + scene.tri_v2) / 3.0
        code = _morton_key(scene, cent, bits=8)
        perm = jnp.argsort(code).astype(jnp.int32)
        v0 = scene.tri_v0[perm]
        v1 = scene.tri_v1[perm]
        v2 = scene.tri_v2[perm]
        scene_p = scene_p.replace(tri_v0=v0, tri_v1=v1, tri_v2=v2)
        c_p = cent[perm]
        r_p = jnp.maximum(
            jnp.maximum(jnp.linalg.norm(v0 - c_p, axis=-1),
                        jnp.linalg.norm(v1 - c_p, axis=-1)),
            jnp.linalg.norm(v2 - c_p, axis=-1))
        fan = class_fan(scene.n_tris)
        tri = (perm, tile_bounds(c_p, r_p, fan), fan)
    if sph is None and tri is None:
        return None
    return scene_p, sph, tri


def packet_bounce(scene: Scene, cols, c_max: int, t_done: Array,
                  rng=None, accel=None, wave_sub: Optional[int] = None,
                  fine_key: bool = False, grid=None,
                  interpret: Optional[bool] = None):
    """One ROUND of the divergent-bounce loop: sort active rays into
    coherent packets, build per-packet candidate tables on device, advance
    every ray that the candidates can RESOLVE (hit before the packet's
    t_safe, or proven scene exit), un-sort.

    ``cols`` = (ox..dz, cr, cg, cb, path, status) as [rows, 128] arrays
    (status may carry the _CAP sentinel — those rays pass through).
    ``t_done`` [n] is each ray's proven-clear horizon; unresolved rays get
    it raised to the packet's t_safe so retry rounds make strict progress.
    ``rng`` = (seed, rid [n], bounce [n], refr [n]) for rough/transmission
    scenes (the glue's draw coordinates and per-ray substance state);
    ``accel`` feeds the substance point query. ``wave_sub`` overrides the
    packet height (kernels/trace_tiled.WAVE_SUB); ``fine_key`` bins purely
    by fine Morton position (retry rounds — see _morton_key).
    Returns (new cols, new t_done, resolved_hit [n] bool, new refr [n],
    winner pid [n] i32 — global ids, -1 for unresolved/miss — for the
    path-recording mode).
    """
    if wave_sub is None:
        wave_sub = tt.WAVE_SUB
    packet = wave_sub * tt.LANE
    rows = cols[0].shape[0]
    flat = [c.reshape(-1) for c in cols]
    org = jnp.stack(flat[0:3], axis=-1)
    dirs = jnp.stack(flat[3:6], axis=-1)
    alive = flat[10] == int(RayStatus.ALIVE)

    # primary key: quantized cleared horizon — stuck rays (t_done > 0) must
    # cluster together or fresh packet-mates collapse the packet floor to 0
    # and retry rounds re-select the same candidates forever. Scale from the
    # SMALL-prim population extent (a huge straddler would flatten the
    # quantization to one bucket).
    s_lo, s_hi = _robust_extent(scene)
    diag = jnp.linalg.norm(s_hi - s_lo) + 1e-6
    qt = jnp.clip((t_done / (diag / 16.0)).astype(jnp.int32), 0, 63)
    if fine_key:
        # (stuck-horizon, fine Morton, direction bin): MORTON-MAJOR —
        # sparse stragglers binned direction-first scatter over 64 bins
        # and every packet sprawls (measured: 60% of retry rays got
        # t_safe - d_c <= 0); spatial compactness is what keeps d_c below
        # the resolution radius, direction only sub-orders within a cell
        key = ((((qt << 18) + _morton_key(scene, org, bits=6)) << 6)
               + _dir_bin(dirs))
    else:
        key = ((qt * 4096 + _pos_cell(scene, org)) * 64
               + _dir_bin(dirs)).astype(jnp.int32)
    key = jnp.where(alive, key, jnp.int32(1 << 30))     # inactive rays last
    # multi-operand sort MOVES the state with the keys — 8x cheaper than
    # argsort + 12 permutation gathers (318 ms -> dense bitonic moves)
    n = flat[0].shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    need_glue = scene.has_rough or scene.has_transmission
    if need_glue:
        seed, rid, bounce, refr = rng
        _, inv_pos, *flat_s = jax.lax.sort(
            (key, idx, *flat, t_done, rid, bounce, refr), num_keys=1)
        rid_s, bounce_s, refr_s = flat_s[12], flat_s[13], flat_s[14]
    else:
        _, inv_pos, *flat_s = jax.lax.sort(
            (key, idx, *flat, t_done), num_keys=1)
        seed = rid_s = bounce_s = None
        refr_s = jnp.zeros((n,), jnp.float32)
    t_done_s = flat_s[11]
    flat_s = flat_s[:11]
    org_s = jnp.stack(flat_s[0:3], axis=-1)
    dir_s = jnp.stack(flat_s[3:6], axis=-1)
    alive_s = flat_s[10] == int(RayStatus.ALIVE)

    # --- segment-cond compaction: live rays sorted to the front, so the
    # expensive per-packet work (cone tests + nearest-c_max selection +
    # table pack + wave kernel) runs ONLY for segments containing a live
    # ray. After bounce 0 most of the frame has terminated — dead segments
    # cost one predicate each, making round cost proportional to the live
    # wavefront instead of the full frame (the r2 on-chip regression:
    # 3 rounds x full-frame packet prep = 6.7 s/frame at config 4).
    n_packets = rows // wave_sub
    seg_pk = min(SEG_PACKETS * (tt.WAVE_SUB // wave_sub), n_packets)
    new_flat = [jnp.zeros((0,), f.dtype) for f in flat_s[:11]]
    pid_parts, u_parts, v_parts, tsr_parts, refr_parts = [], [], [], [], []
    lo = 0
    while lo < n_packets:
        hi = min(lo + seg_pk, n_packets)
        r0, r1 = lo * wave_sub, hi * wave_sub
        i0, i1 = r0 * tt.LANE, r1 * tt.LANE
        seg_cols = tuple(f[i0:i1] for f in flat_s[:11])
        seg_alive = alive_s[i0:i1]
        seg_org, seg_dir = org_s[i0:i1], dir_s[i0:i1]
        seg_tdone = t_done_s[i0:i1]
        seg_rng = (rid_s[i0:i1], bounce_s[i0:i1]) if need_glue else ()
        seg_refr = refr_s[i0:i1]
        seg_n = i1 - i0

        def do_seg(args, r0=r0, r1=r1):
            (seg_cols, seg_org, seg_dir, seg_alive, seg_tdone,
             seg_rng, seg_refr) = args
            if grid is not None:
                tab, cnts, t_safe = cand.packet_candidates_grid(
                    scene, grid, seg_org, seg_dir, seg_alive, packet,
                    t_done=seg_tdone)
                kc_max = grid.c_max
                bases = (grid.base[1], grid.base[2])
            else:
                tab, cnts, t_safe = cand.packet_candidates(
                    scene, seg_org, seg_dir, seg_alive, packet, c_max,
                    t_done=seg_tdone)
                kc_max = c_max
                bases = None
            cols2 = [c.reshape(r1 - r0, tt.LANE) for c in seg_cols]
            outs = tt.wave_bounce(scene, cols2, tab, cnts, kc_max,
                                  wave_sub=wave_sub, static_bases=bases,
                                  interpret=interpret)
            o0_ray = jnp.repeat(cnts[:, 4:7], packet, axis=0)
            d_c = jnp.linalg.norm(seg_org - o0_ray, axis=-1)
            t_safe_ray = jnp.repeat(t_safe, packet) - d_c
            fl = [o.reshape(-1) for o in outs[:11]]
            pid_seg = outs[12].reshape(-1)
            if need_glue:
                nrm = jnp.stack([o.reshape(-1) for o in outs[15:18]], -1)
                org2 = jnp.stack(fl[0:3], -1)
                dir2 = jnp.stack(fl[3:6], -1)
                org2, dir2, seg_refr = _respawn_glue(
                    scene, accel, seed, seg_rng[0], seg_rng[1], seg_refr,
                    org2, dir2, fl[10], pid_seg,
                    outs[11].reshape(-1), nrm)
                fl[0:3] = [org2[:, 0], org2[:, 1], org2[:, 2]]
                fl[3:6] = [dir2[:, 0], dir2[:, 1], dir2[:, 2]]
            return (tuple(fl), pid_seg, outs[13].reshape(-1),
                    outs[14].reshape(-1), t_safe_ray, seg_refr)

        def skip_seg(args, seg_n=seg_n):
            seg_cols, _o, _d, _a, _t, _r, seg_refr = args
            return (seg_cols, jnp.full((seg_n,), -1, jnp.int32),
                    jnp.zeros((seg_n,), jnp.float32),
                    jnp.zeros((seg_n,), jnp.float32),
                    jnp.zeros((seg_n,), jnp.float32), seg_refr)

        outs = jax.lax.cond(
            jnp.any(seg_alive), do_seg, skip_seg,
            (seg_cols, seg_org, seg_dir, seg_alive, seg_tdone,
             seg_rng, seg_refr))
        new_flat = [jnp.concatenate([a, b])
                    for a, b in zip(new_flat, outs[0])]
        pid_parts.append(outs[1])
        u_parts.append(outs[2])
        v_parts.append(outs[3])
        tsr_parts.append(outs[4])
        refr_parts.append(outs[5])
        lo = hi
    pid_o = jnp.concatenate(pid_parts)
    t_safe_ray = jnp.concatenate(tsr_parts)
    refr_o = jnp.concatenate(refr_parts)

    if scene.textures.has_images or scene.sky_box is not None:
        colors = jnp.stack(new_flat[6:9], axis=-1)
        dirs_o = jnp.stack(new_flat[3:6], axis=-1)
        colors = _apply_images(scene, colors, dirs_o, new_flat[10], alive_s,
                               pid_o, jnp.concatenate(u_parts),
                               jnp.concatenate(v_parts))
        new_flat[6:9] = [colors[:, 0], colors[:, 1], colors[:, 2]]
    # bookkeeping: a resolved hit reports pid >= 0; an ALIVE ray with
    # pid < 0 is unresolved. MARCH unresolved rays: the round proved no hit
    # exists in [0, t_safe_ray), so advancing the origin through that
    # interval is semantically exact (path accumulates the advance). This
    # is the decisive convergence fix — a static origin needs cleared-ball
    # volume ~ R^3 (the r2 escalation only converged because budgets
    # approached the scene size), a marching origin advances a constant
    # shell every round and re-bins next to the rays it is about to pass.
    # The margin delta guards the f32 distance error in t_safe so no ray
    # is pushed onto/через a surface it is about to hit.
    res_hit = pid_o >= 0
    unres = alive_s & ~res_hit & (new_flat[10] == int(RayStatus.ALIVE))
    delta = 1e-4 * diag
    t_adv = jnp.where(unres, jnp.maximum(t_safe_ray - delta, 0.0), 0.0)
    for i in range(3):
        new_flat[i] = new_flat[i] + t_adv * new_flat[3 + i]
    new_flat[9] = new_flat[9] + t_adv
    # remaining proven-clear distance ahead of the NEW origin; stays > 0
    # only for rays that could not advance (sprawling packet, t_safe <= 0),
    # whose growing quantized horizon escalates their binning isolation
    t_done_s = jnp.where(
        unres, jnp.maximum(jnp.maximum(t_done_s, t_safe_ray) - t_adv, 0.0),
        t_done_s)
    new_flat += [t_done_s, res_hit.astype(jnp.int32), refr_o, pid_o]
    # un-sort by the carried original positions (multi-operand sort again)
    _, *unsorted = jax.lax.sort((inv_pos, *new_flat), num_keys=1)
    return ([u.reshape(rows, tt.LANE) for u in unsorted[:11]],
            unsorted[11], unsorted[12].astype(bool), unsorted[13],
            unsorted[14])


def _epilogue(cr, cg, cb, path, status, atten):
    """EXHAUST blackout + light-hit ISL (raytracer.ts:256-263, :273-275)."""
    exhausted = status == int(RayStatus.ALIVE)
    status = jnp.where(exhausted, int(RayStatus.EXHAUST), status)
    isl = 1.0 / (JS_EPSILON + (path * atten) ** 2)
    lit = status == int(RayStatus.LIGHT)
    scale = jnp.where(exhausted, 0.0, jnp.where(lit, isl, 1.0))
    return cr * scale, cg * scale, cb * scale, status


#: extra retry rounds beyond refmax-1 for unresolved (truncated-list) rays.
#: Segment-cond compaction makes retry rounds cost ~ the unresolved
#: minority, so the default leans high — "unresolved" in the diag must be 0
EXTRA_ROUNDS = int(__import__("os").environ.get("RT_TILED_ROUNDS", "10"))
#: ceiling on the escalating retry candidate budgets. The wave kernel's
#: double-buffered [c_max, N_ATTR] block lives on Mosaic's scoped-VMEM
#: stack (16 MB limit the CompilerParams vmem_limit does NOT govern);
#: 1 << 14 keeps the block at 1.3 MB. Escalation beyond the cap is
#: replaced by MORE capped rounds: each round excludes the cleared shell
#: (t_done floor) before selecting, so a fixed budget still advances the
#: resolved horizon by a constant-volume shell per round.
ESC_MAX = int(__import__("os").environ.get("RT_TILED_ESC_MAX",
                                           str(1 << 14)))
#: scenes at or below this primitive count use SWEEP MODE for bounces
#: >= 1: whole-table rescue rounds instead of packet candidate rounds
#: (see render_frame_tiled). r4 raised the bar 262144 -> 1M: with the
#: scoped-VMEM raise, listed cull and near-to-far early exit, sweep
#: frames at 1M prims measured ~2x faster than the packet machinery
#: (~50 s vs ~100 s per 1080p recording frame, config-5 runs); the
#: packet rounds remain the fallback beyond it.
SWEEP_MAX_PRIMS = int(__import__("os").environ.get("RT_TILED_SWEEP_MAX",
                                                   "1048576"))
#: sweep-mode slice width: the compacted live prefix one sweep round
#: processes (the XLA shade/respawn costs scale with this; overflow live
#: rays take another while-loop round)
SWEEP_SLICE = int(__import__("os").environ.get("RT_TILED_SWEEP_SLICE",
                                               str(655360)))
#: ray capacity of one whole-table rescue round (see _rescue_round).
#: Sized so refmax+3 rounds cover the straggler population the marching
#: retries leave at config-4 scale (measured r3: each rescue resolves
#: exactly its cap; 5 x 32k left 89k of ~250k stragglers unresolved)
RESCUE_CAP = int(__import__("os").environ.get("RT_TILED_RESCUE_CAP",
                                              "65536"))


def _rescue_round(scene: Scene, cfg: RenderConfig, cols, bounce, refr,
                  seed, rid, accel=None, cap: Optional[int] = None,
                  sweep_tab=None, rec=None):
    """Guaranteed-exact straggler round: compact the still-working rays to
    the front, run the PALLAS whole-table nearest-hit on the first
    RESCUE_CAP of them, and shade/respawn through the XLA replay bounce
    (ops/trace._bounce with pid_override — the same code path whose
    gradients the fit loop replays).

    The candidate rounds resolve the bulk cheaply; the residue that
    ball/cone waves reach slowly (sparse stragglers whose packets sprawl,
    long horizon-grazing paths) is exactly the population small enough
    that streaming the ENTIRE primitive table past it costs ~nothing
    (kernels/nearest_hit: ~0.01 cyc/ray/prim -> ~30 ms for 32k rays at
    100k prims). One round fully resolves up to RESCUE_CAP rays — hit,
    miss, or continuation (the continuation spends one bounce and is
    caught by the next rescue round).

    ``cols`` are the 11 state columns as [rows, LANE]; ``bounce``/``refr``
    are flat [n]; returns the updated (cols, bounce, refr[, rec]).

    ``rec`` ([n, refmax] i32, -1-initialized) switches on PATH RECORDING:
    each resolved ray's winner pid is written at its bounce column — the
    TILED forward then doubles as the recording pass for path-replay
    gradients (ops/trace.trace_rays ``pid_seq``), replacing the OCTREE-DDA
    recording that cost 1198 s at config-5 scale (VERDICT r3 #2).
    """
    from .kernels.nearest_hit import nearest_hit_pallas
    from .ops.trace import RayState, _bounce

    rows = cols[0].shape[0]
    n = rows * tt.LANE
    cap = min(cap or RESCUE_CAP, n)
    flat = [c.reshape(-1) for c in cols]
    working = ((flat[10] == int(RayStatus.ALIVE))
               & (bounce < cfg.refmax))

    def run(args):
        flat, bounce, refr, rec = args
        # compact working rays to the front IN (cell, direction) ORDER:
        # the sweep kernel's block-cone cull only fires when each 512-ray
        # block is spatially and directionally coherent (a 0/1 key leaves
        # bounce-1 blocks with randomly reflected directions — cos_t ~ -1,
        # no culls, pure predicate overhead)
        org_a = jnp.stack(flat[0:3], -1)
        dir_a = jnp.stack(flat[3:6], -1)
        key = (_pos_cell(scene, org_a) * 64 + _dir_bin(dir_a)).astype(
            jnp.int32)
        key = jnp.where(working, key, jnp.int32(1 << 30))
        idx = jnp.arange(n, dtype=jnp.int32)
        rid_s = rid if rid is not None else jnp.zeros((n,), jnp.int32)
        rec_cols = ([rec[:, j] for j in range(cfg.refmax)]
                    if rec is not None else [])
        _, inv_pos, *ops_s = jax.lax.sort(
            (key, idx, *flat, bounce, refr, rid_s, *rec_cols), num_keys=1)
        flat_s, bounce_s, refr_s, rid_ss = (ops_s[:11], ops_s[11],
                                            ops_s[12], ops_s[13])
        rec_s = ops_s[14:14 + len(rec_cols)]
        sl = [f[:cap] for f in flat_s]
        org = jnp.stack(sl[0:3], -1)
        dirs = jnp.stack(sl[3:6], -1)
        # whole-table search on the compacted slice (discrete; replayed
        # differentiably by the fit loop exactly like every other backend).
        # n_live: working rays are the sorted prefix, so the kernel skips
        # every block past them — rescue cost ~ straggler count, not cap
        n_work = jnp.sum(working.astype(jnp.int32))
        nl = jnp.minimum(n_work, cap)
        work_sl = (sl[10] == int(RayStatus.ALIVE)) & (
            bounce_s[:cap] < cfg.refmax)
        if sweep_tab is not None:
            scene_s, sph_e, tri_e = sweep_tab
            # listed cull: [8, T] SMEM id windows per program; supertile
            # fans (_sweep_perm.class_fan) keep T <= 2048 at any prim
            # count (r4's dense fallback past 2048 tiles cost config-5
            # recordings the whole cull + near-to-far exit)
            kw = {}
            if SWEEP_LISTED:
                # floor at 64 (super)tiles: below it the per-chunk exit
                # branches cost more than the dense stream saves (config
                # 3's 41 tri tiles measured 3.5e6 listed vs 4.5e6 dense).
                # Supertile fans (_sweep_perm) keep the id tables inside
                # the 2048-entry SMEM window at ANY prim count
                if sph_e is not None and sph_e[1].shape[0] >= 64:
                    kw["tile_ids"] = _block_tile_select(
                        org, dirs, work_sl, sph_e[1])
                    kw["sph_fan"] = sph_e[2]
                if tri_e is not None and tri_e[1].shape[0] >= 64:
                    kw["tri_tile_ids"] = _block_tile_select(
                        org, dirs, work_sl, tri_e[1])
                    kw["tri_fan"] = tri_e[2]
            if (not kw and SWEEP_CULL and sph_e is not None
                    and sph_e[2] == 1 and sph_e[1].shape[0] <= 2048):
                kw["tile_bounds"] = sph_e[1]
            _t, pid = nearest_hit_pallas(scene_s, org, dirs, n_live=nl,
                                         **kw)
            # winners map back from permuted-class to global ids
            if sph_e is not None:
                pid = jnp.where(
                    (pid >= 0) & (pid < scene.n_spheres),
                    sph_e[0][jnp.clip(pid, 0,
                                      max(scene.n_spheres - 1, 0))], pid)
            if tri_e is not None:
                b_end = scene.n_spheres + scene.n_boxes
                loc = jnp.clip(pid - b_end, 0, max(scene.n_tris - 1, 0))
                pid = jnp.where(pid >= b_end, b_end + tri_e[0][loc], pid)
        else:
            _t, pid = nearest_hit_pallas(scene, org, dirs, n_live=nl)
        pid = jnp.where(work_sl, pid, -1)
        st = RayState(org=org, dir=dirs,
                      color=jnp.stack(sl[6:9], -1),
                      path=sl[9],
                      refr=refr_s[:cap],
                      status=jnp.where(work_sl, int(RayStatus.ALIVE),
                                       jnp.where(sl[10] == int(
                                           RayStatus.ALIVE), _CAP,
                                           sl[10])))
        rng = (seed, rid_ss[:cap]) if scene.has_rough else None
        out = _bounce(scene, cfg, accel, st, rng, bounce_s[:cap],
                      pid_override=pid)
        cont = work_sl & (out.status == int(RayStatus.ALIVE))
        bounce_new = bounce_s[:cap] + jnp.where(cont, 1, 0)
        status_out = jnp.where(out.status == _CAP, int(RayStatus.ALIVE),
                               out.status)
        new_sl = [out.org[:, 0], out.org[:, 1], out.org[:, 2],
                  out.dir[:, 0], out.dir[:, 1], out.dir[:, 2],
                  out.color[:, 0], out.color[:, 1], out.color[:, 2],
                  out.path, status_out]
        flat_n = [jnp.concatenate([a, f[cap:]])
                  for a, f in zip(new_sl, flat_s)]
        bounce_n = jnp.concatenate([bounce_new, bounce_s[cap:]])
        refr_n = jnp.concatenate([out.refr, refr_s[cap:]])
        rec_n = []
        for j, rc in enumerate(rec_s):
            # a working slice ray records its winner (-1 = resolved miss)
            # at its CURRENT bounce column
            upd = work_sl & (bounce_s[:cap] == j)
            rec_n.append(jnp.concatenate(
                [jnp.where(upd, pid, rc[:cap]), rc[cap:]]))
        _, *back = jax.lax.sort((inv_pos, *flat_n, bounce_n, refr_n,
                                 *rec_n), num_keys=1)
        rec_out = (jnp.stack(back[13:13 + len(rec_n)], axis=1)
                   if rec_n else rec)
        return back[:11], back[11], back[12], rec_out

    def skip(args):
        return args

    flat, bounce, refr, rec = jax.lax.cond(
        jnp.any(working), run, skip, (flat, bounce, refr, rec))
    return [f.reshape(rows, tt.LANE) for f in flat], bounce, refr, rec


def render_frame_tiled(scene: Scene, cfg: RenderConfig, cam,
                       tables=None, packet_c_max: int = 4096,
                       key=None, sample: int = 0, accel=None,
                       interpret: Optional[bool] = None,
                       with_diag: bool = False,
                       with_record: bool = False):
    """Full-frame HDR render via the tiled kernel -> [h, w, 3].

    ``with_record=True`` additionally returns ``pid_seq`` [h*w, refmax]
    i32 — the per-bounce winner primitive of every pixel ray (-1 = miss),
    exactly the recording :func:`raytracer_js_tpu.ops.trace.trace_rays`
    replays differentiably (``pid_seq=``). The TILED forward already
    computes every winner; emitting them makes the big-scene frame path
    double as the path-recording pass for inverse rendering (the OCTREE-DDA
    recording it replaces cost 1198 s per 8-view config-5 recording).
    Return orders: img | (img, diag) | (img, rec) | (img, diag, rec).

    Bounce 0 runs the frame kernel on exact untruncated frustum candidate
    lists. Later bounces run ``(refmax - 1) + EXTRA_ROUNDS`` rounds of the
    packetized wavefront: each round advances every ray its (possibly
    truncated) candidate list can resolve and widens the others' cleared
    horizon, so a ray consumes one round per bounce plus one per retry.
    Rays still unresolved when rounds run out keep status ALIVE and fall
    into the EXHAUST blackout — ``with_diag``'s {"unresolved": i32} counts
    them (0 == the frame is exact; grow RT_TILED_ROUNDS or packet_c_max
    otherwise).

    ``tables`` — optional cached result of :func:`frame_tables`.
    ``key``/``sample`` seed the counter-RNG streams of rough scenes
    (rid = (y*w + x)*spp + sample, identical to the other backends);
    ``accel`` (an OctreeAccel) feeds the transmission substance query —
    without it the query falls back to the dense containment matrix
    (fine for small scenes, prohibitive at 100k prims).
    """
    from .ops import sampling

    if tables is None:
        tables = frame_tables(scene, cam, packet_c_max=packet_c_max)
    if len(tables) == 4:
        tab, cnts, c_max, grid = tables
    else:                       # legacy 3-tuple: rowwise packet selection
        tab, cnts, c_max = tables
        grid = None
    need_glue = scene.has_rough or scene.has_transmission
    st = tt.frame_bounce0(scene, cam, tab, cnts, c_max, interpret=interpret)
    hp, wp = st["cr"].shape
    xi = jnp.tile(jnp.arange(wp), hp)
    yi = jnp.repeat(jnp.arange(hp), wp)
    valid = (xi < cam.w) & (yi < cam.h)
    if need_glue:
        if key is None:
            key = jax.random.key(0)
        seed = sampling.seed_from_key(key)
        rid = jnp.where(valid, (yi * cam.w + xi) * cfg.spp + sample, 0
                        ).astype(jnp.int32)
        from .render import start_substance

        refr = jnp.broadcast_to(start_substance(scene, cam.pos), (hp * wp,))
    else:
        seed = rid = None
        refr = jnp.zeros((hp * wp,), jnp.float32)
    if scene.textures.has_images or scene.sky_box is not None:
        flat = {k: st[k].reshape(-1) for k in st}
        # padding pixels started MISS; everything else was ALIVE
        colors = jnp.stack([flat["cr"], flat["cg"], flat["cb"]], -1)
        dirs_o = jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1)
        colors = _apply_images(scene, colors, dirs_o, flat["status"],
                               valid, flat["pid"], flat["u"],
                               flat["v"])
        st = dict(st, cr=colors[:, 0].reshape(hp, wp),
                  cg=colors[:, 1].reshape(hp, wp),
                  cb=colors[:, 2].reshape(hp, wp))
    if need_glue:
        # bounce-0 scatter/refraction continuation fixups (bounce index 0)
        flat = {k: st[k].reshape(-1) for k in st}
        org0 = jnp.stack([flat["ox"], flat["oy"], flat["oz"]], -1)
        dir0 = jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1)
        nrm0 = jnp.stack([flat["nx"], flat["ny"], flat["nz"]], -1)
        org0, dir0, refr = _respawn_glue(
            scene, accel, seed, rid, jnp.zeros_like(rid), refr,
            org0, dir0, flat["status"], flat["pid"], flat["t"], nrm0)
        st = dict(st,
                  ox=org0[:, 0].reshape(hp, wp),
                  oy=org0[:, 1].reshape(hp, wp),
                  oz=org0[:, 2].reshape(hp, wp),
                  dx=dir0[:, 0].reshape(hp, wp),
                  dy=dir0[:, 1].reshape(hp, wp),
                  dz=dir0[:, 2].reshape(hp, wp))

    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")
    unresolved = jnp.zeros((), jnp.int32)
    rec = None
    if with_record:
        rec = jnp.full((hp * wp, cfg.refmax), -1, jnp.int32)
        rec = rec.at[:, 0].set(jnp.where(
            valid, st["pid"].reshape(-1), -1).astype(jnp.int32))
    if cfg.refmax > 1:
        h_pad, w_pad = hp, wp
        rows = h_pad * w_pad // tt.LANE
        n = h_pad * w_pad
        cols = [st[k].reshape(rows, tt.LANE) for k in names]
        # rays continuing out of bounce 0 have spent one bounce
        bounce = jnp.where(st["status"].reshape(-1)
                           == int(RayStatus.ALIVE), 1, 0)
        t_done = jnp.zeros((n,), jnp.float32)
        # round plan: (c_max, packet height, fine-morton key). Standard
        # rounds use full packets + (cell, dir) binning; retry rounds bin
        # by (direction, fine Morton) and MARCH unresolved rays through
        # their proven-empty horizon each round (packet_bounce), so flat
        # budgets suffice — termination is guaranteed by the whole-table
        # rescue rounds below, not by escalating budgets.
        def any_working(cols, bounce):
            return jnp.any((cols[10].reshape(-1) == int(RayStatus.ALIVE))
                           & (bounce < cfg.refmax))

        if scene.n_prims <= SWEEP_MAX_PRIMS:
            # SWEEP MODE: at this scale streaming the WHOLE primitive
            # table past the compacted live rays (kernels/nearest_hit,
            # ~0.01 cyc/ray/prim with live-prefix block skip) is cheaper
            # per ray than building candidate tables at all (measured r3:
            # the packet selection+pack costs ~0.6 us/ray/round vs
            # ~0.12 us/ray for the full 100k-prim stream). Each round
            # fully resolves up to sw_cap working rays — no retries, no
            # marching — so "unresolved 0" needs up to ceil(n / sw_cap)
            # rounds per remaining bounce: the budget must scale with the
            # slice count (a fixed refmax+3 bound silently left working
            # rays whenever live rays per bounce exceeded SWEEP_SLICE —
            # mirror-heavy frames or small RT_TILED_SWEEP_SLICE). The
            # while_loop exits as soon as nothing is working, so the
            # generous static bound costs nothing at runtime.
            # slice cap: the PALLAS kernel already scales with the live
            # count (n_live block skip), but the XLA shade/respawn runs
            # over the whole compacted slice — cap it near the expected
            # live fraction; overflow just takes another while iteration
            sw_cap = min(n, SWEEP_SLICE)
            sw_rounds = (cfg.refmax + 3) * (-(-n // sw_cap))

            def sw_cond(state):
                i, cols, bounce, refr, _rec = state
                return (i < sw_rounds) & any_working(cols, bounce)

            sweep_tab = (_sweep_perm(scene)
                         if (SWEEP_LISTED or SWEEP_CULL) else None)

            def sw_body(state):
                i, cols, bounce, refr, rec = state
                cols, bounce, refr, rec = _rescue_round(
                    scene, cfg, cols, bounce, refr, seed, rid,
                    accel=accel, cap=sw_cap, sweep_tab=sweep_tab, rec=rec)
                return i + 1, cols, bounce, refr, rec

            it, cols, bounce, refr, rec = jax.lax.while_loop(
                sw_cond, sw_body,
                (jnp.zeros((), jnp.int32), cols, bounce, refr, rec))
            unresolved = jnp.sum(
                ((cols[10].reshape(-1) == int(RayStatus.ALIVE))
                 & (bounce < cfg.refmax)).astype(jnp.int32))
            st = {k: c.reshape(h_pad, w_pad) for k, c in zip(names, cols)}
            cr, cg, cb, _ = _epilogue(st["cr"], st["cg"], st["cb"],
                                      st["path"], st["status"],
                                      float(cfg.distance_attenuation_factor))
            img = jnp.stack([cr, cg, cb], axis=-1)[:cam.h, :cam.w]
            return _rtl_outs(img, unresolved, rec, cam, hp, wp, cfg,
                             with_diag, with_record, rounds=it)

        c_round = min(packet_c_max, ESC_MAX)

        def one_round(cols, t_done, refr, bounce, rec, fine):
            """One candidate round: cap-mask, packet_bounce, bounce += on
            resolved continuations. Identical for every retry, so the
            retry loop compiles ONE body (a fully unrolled 16-round plan
            took ~1 h of XLA compile at config-4 scale)."""
            status_f = cols[10].reshape(-1)
            capped = ((status_f == int(RayStatus.ALIVE))
                      & (bounce >= cfg.refmax))
            cols = list(cols)
            cols[10] = jnp.where(capped, _CAP, status_f).reshape(
                rows, tt.LANE)
            rng = ((seed, rid, bounce, refr) if need_glue else None)
            cols, t_done, res_hit, refr, pid_o = packet_bounce(
                scene, cols, c_round, t_done, rng=rng, accel=accel,
                wave_sub=tt.WAVE_SUB, fine_key=fine, grid=grid,
                interpret=interpret)
            if rec is not None:
                # record winners at the PRE-increment bounce column
                for j in range(cfg.refmax):
                    rec = rec.at[:, j].set(jnp.where(
                        res_hit & (bounce == j), pid_o, rec[:, j]))
            status_o = cols[10].reshape(-1)
            bounce = bounce + jnp.where(
                res_hit & (status_o == int(RayStatus.ALIVE)), 1, 0)
            cols[10] = jnp.where(status_o == _CAP, int(RayStatus.ALIVE),
                                 status_o).reshape(rows, tt.LANE)
            return cols, t_done, refr, bounce, rec

        # standard rounds: one per remaining bounce, frame-coherent binning
        for _ in range(cfg.refmax - 1):
            cols, t_done, refr, bounce, rec = jax.lax.cond(
                any_working(cols, bounce),
                lambda a: one_round(*a, fine=False), lambda a: a,
                (cols, t_done, refr, bounce, rec))

        # marching retry rounds: ONE traced body in a while_loop (stops as
        # soon as every ray is resolved)
        def retry_cond(state):
            i, cols, t_done, refr, bounce, _rec = state
            return (i < EXTRA_ROUNDS) & any_working(cols, bounce)

        def retry_body(state):
            i, cols, t_done, refr, bounce, rec = state
            cols, t_done, refr, bounce, rec = one_round(
                cols, t_done, refr, bounce, rec, fine=True)
            return i + 1, cols, t_done, refr, bounce, rec

        _, cols, t_done, refr, bounce, rec = jax.lax.while_loop(
            retry_cond, retry_body,
            (jnp.zeros((), jnp.int32), cols, t_done, refr, bounce, rec))

        # guaranteed-exact finale: whole-table rescue of the stragglers,
        # again one traced body. Bound scaled by the rescue slice count —
        # each round fully resolves at most RESCUE_CAP rays, so covering a
        # worst-case all-straggler frame needs ceil(n / cap) rounds per
        # remaining bounce (the loop exits early when nothing is working).
        rescue_rounds = (cfg.refmax + 3) * (-(-n // min(RESCUE_CAP, n)))

        def rescue_cond(state):
            i, cols, bounce, refr, _rec = state
            return (i < rescue_rounds) & any_working(cols, bounce)

        def rescue_body(state):
            i, cols, bounce, refr, rec = state
            cols, bounce, refr, rec = _rescue_round(scene, cfg, cols,
                                                    bounce, refr, seed,
                                                    rid, accel=accel,
                                                    rec=rec)
            return i + 1, cols, bounce, refr, rec

        _, cols, bounce, refr, rec = jax.lax.while_loop(
            rescue_cond, rescue_body,
            (jnp.zeros((), jnp.int32), cols, bounce, refr, rec))
        unresolved = jnp.sum(
            ((cols[10].reshape(-1) == int(RayStatus.ALIVE))
             & (bounce < cfg.refmax)).astype(jnp.int32))
        st = {k: c.reshape(h_pad, w_pad) for k, c in zip(names, cols)}

    cr, cg, cb, _ = _epilogue(st["cr"], st["cg"], st["cb"], st["path"],
                              st["status"],
                              float(cfg.distance_attenuation_factor))
    img = jnp.stack([cr, cg, cb], axis=-1)[:cam.h, :cam.w]
    return _rtl_outs(img, unresolved, rec, cam, hp, wp, cfg, with_diag,
                     with_record)


def render_frame_tiled_replay_shaded(scene: Scene, cfg: RenderConfig, cam,
                                     tables=None, key=None, sample: int = 0,
                                     accel=None,
                                     interpret: Optional[bool] = None,
                                     with_diag: bool = False):
    """Image-scene TILED frame = SOLID-search record pass + one flat
    replay-shading pass -> [h, w, 3].

    r5 finding (tools/bench_results_r5/exp_c3d-g): shading image scenes
    INSIDE the sweep while-loop costs ~3x the solid path per round (25 vs
    8.6 ms at 262k rays) even with zero image content — an XLA fusion
    pathology of the cond+sort round composition (the same components sum
    to ~3 ms standalone; monkeypatch bisects are non-monotonic, so it is
    not attributable to any one op). The search and respawn never read
    texture colors, so this wrapper runs the whole TILED search on a
    texture-SOLIDIFIED twin of the scene with ``with_record=True`` (the
    config-5 recording machinery, record-replay parity already tested in
    both sweep and packet modes) and shades once, flat and outside any
    loop, with :func:`raytracer_js_tpu.ops.trace.trace_rays`
    ``pid_seq=rec`` on the REAL scene. Exactness: winner pids, RNG
    streams (same (key, rid, bounce) coordinates), substance chains and
    path lengths are identical by the replay contract; colors are
    recomputed rather than carried.
    """
    import dataclasses as _dc

    from .config import HitBackend
    from .models.camera import pixel_rays
    from .ops.trace import trace_rays
    from .render import start_substance

    tex = scene.textures
    ssc = scene.replace(
        textures=tex.replace(kind=jnp.zeros_like(tex.kind),
                             has_images=False, has_bilinear=False),
        sky_box=None)
    out = render_frame_tiled(ssc, cfg, cam, tables=tables, key=key,
                             sample=sample, accel=accel,
                             interpret=interpret, with_diag=with_diag,
                             with_record=True)
    if with_diag:
        _img, diag, rec = out
    else:
        _img, rec = out
    org, dirs = pixel_rays(cam)
    n = org.shape[0]
    if key is None:
        key = jax.random.key(0)
    rid = jnp.arange(n, dtype=jnp.int32) * cfg.spp + sample
    refr0 = jnp.broadcast_to(start_substance(scene, cam.pos), (n,))
    cfg_replay = _dc.replace(cfg, backend=HitBackend.BRUTE)
    st = trace_rays(scene, cfg_replay, org, dirs, key, rid,
                    start_refr=refr0, pid_seq=rec)
    img = st.color.reshape(cam.h, cam.w, 3)
    return (img, diag) if with_diag else img


def _rtl_outs(img, unresolved, rec, cam, hp, wp, cfg, with_diag,
              with_record, rounds=None):
    """Assemble render_frame_tiled's return tuple (img | +diag | +rec)."""
    outs = (img,)
    if with_diag:
        diag = {"unresolved": unresolved}
        if rounds is not None:
            diag["rounds"] = rounds
        outs = outs + (diag,)
    if with_record:
        rec = rec.reshape(hp, wp, cfg.refmax)[:cam.h, :cam.w]
        outs = outs + (rec.reshape(-1, cfg.refmax),)
    return outs if len(outs) > 1 else img
