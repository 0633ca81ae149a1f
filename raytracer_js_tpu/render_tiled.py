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

Restricted class: solid textures/sky, no transmission, zero roughness (the
trace_fused class) — BASELINE config 4's shape. Off-class big scenes fall
back to ops/trace (render.render_hdr dispatch).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .accel import candidates as cand
from .config import JS_EPSILON, RayStatus, RenderConfig, TextureKind
from .kernels import trace_tiled as tt
from .models import textures as tex_mod
from .models.scene import Scene

Array = jnp.ndarray

#: packet size — must equal the kernel ray tile
PACKET = tt.TILE_SUB * tt.LANE


def supports(scene: Scene) -> bool:
    """Wider than the fused kernel: image textures and image skies are
    handled (uv computed in-kernel, sampling applied in the XLA glue);
    transmission and roughness still route to the wavefront path."""
    return not scene.has_transmission and not scene.has_rough


def frame_tables(scene: Scene, cam):
    """Host-side bounce-0 candidate tables (cache across frames while the
    camera pose and scene geometry are unchanged)."""
    return cand.frame_candidates(scene, cam, tt.TILE_SUB, tt.LANE)


def _dir_bin(d: Array) -> Array:
    """Coarse direction bin (4 levels/axis, 64 bins) for packet coherence."""
    q = jnp.clip(((d + 1.0) * 2.0).astype(jnp.int32), 0, 3)
    return (q[:, 0] * 4 + q[:, 1]) * 4 + q[:, 2]


def _pos_cell(scene: Scene, org: Array, grid: int = 8) -> Array:
    centers, radii = cand.bounding_spheres_jnp(scene)
    lo = jnp.min(centers - radii[:, None], axis=0)
    hi = jnp.max(centers + radii[:, None], axis=0)
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
    is_img = hit & (kind == int(TextureKind.IMAGE))
    smp = tex_mod.sample(scene.textures, tex_id, u, v)
    colors = jnp.where(is_img[:, None], colors * smp, colors)
    newly_miss = prev_alive & (status == int(RayStatus.MISS))
    from .ops.trace import sky_color

    sky = sky_color(scene, dirs)
    return jnp.where(newly_miss[:, None], colors * sky, colors)


def packet_bounce(scene: Scene, cols, c_max: int,
                  interpret: Optional[bool] = None):
    """One divergent bounce: sort into coherent packets, build per-packet
    candidates on device, advance one bounce, un-sort.

    ``cols`` = (ox, oy, oz, dx, dy, dz, cr, cg, cb, path, status) as
    [rows, 128] arrays. Returns (new cols, overflow_packets: i32 scalar —
    packets whose conservative candidate set exceeded c_max; nonzero means
    some rays may have missed primitives and the caller should widen c_max).
    """
    rows = cols[0].shape[0]
    n = rows * tt.LANE
    flat = [c.reshape(-1) for c in cols]
    org = jnp.stack(flat[0:3], axis=-1)
    dirs = jnp.stack(flat[3:6], axis=-1)
    alive = flat[10] == int(RayStatus.ALIVE)

    key = (_pos_cell(scene, org) * 64 + _dir_bin(dirs)).astype(jnp.int32)
    key = jnp.where(alive, key, jnp.int32(1 << 30))     # dead rays last
    order = jnp.argsort(key)
    flat_s = [f[order] for f in flat]
    org_s = jnp.stack(flat_s[0:3], axis=-1)
    dir_s = jnp.stack(flat_s[3:6], axis=-1)
    alive_s = flat_s[10] == int(RayStatus.ALIVE)

    tab, cnts, overflow = cand.packet_candidates(
        scene, org_s, dir_s, alive_s, PACKET, c_max)
    cols_s = [f.reshape(rows, tt.LANE) for f in flat_s]
    outs = tt.wave_bounce(scene, cols_s, tab, cnts, c_max,
                          interpret=interpret)
    new_flat = [o.reshape(-1) for o in outs[:11]]
    if scene.textures.has_images:
        colors = jnp.stack(new_flat[6:9], axis=-1)
        dirs_o = jnp.stack(new_flat[3:6], axis=-1)
        colors = _apply_images(scene, colors, dirs_o, new_flat[10], alive_s,
                               outs[12].reshape(-1), outs[13].reshape(-1),
                               outs[14].reshape(-1))
        new_flat[6:9] = [colors[:, 0], colors[:, 1], colors[:, 2]]
    unsorted = [jnp.zeros_like(f).at[order].set(f) for f in new_flat]
    return ([u.reshape(rows, tt.LANE) for u in unsorted],
            jnp.sum(overflow.astype(jnp.int32)))


def _epilogue(cr, cg, cb, path, status, atten):
    """EXHAUST blackout + light-hit ISL (raytracer.ts:256-263, :273-275)."""
    exhausted = status == int(RayStatus.ALIVE)
    status = jnp.where(exhausted, int(RayStatus.EXHAUST), status)
    isl = 1.0 / (JS_EPSILON + (path * atten) ** 2)
    lit = status == int(RayStatus.LIGHT)
    scale = jnp.where(exhausted, 0.0, jnp.where(lit, isl, 1.0))
    return cr * scale, cg * scale, cb * scale, status


def render_frame_tiled(scene: Scene, cfg: RenderConfig, cam,
                       tables=None, packet_c_max: int = 4096,
                       interpret: Optional[bool] = None,
                       with_diag: bool = False):
    """Full-frame HDR render via the tiled kernel -> [h, w, 3].

    ``tables`` — optional cached result of :func:`frame_tables`.
    ``with_diag`` also returns {"overflow": i32} (packets whose candidate
    set was truncated; must be 0 for an exact frame).
    """
    if tables is None:
        tables = frame_tables(scene, cam)
    tab, cnts, c_max = tables
    st = tt.frame_bounce0(scene, cam, tab, cnts, c_max, interpret=interpret)
    if scene.textures.has_images:
        hp, wp = st["cr"].shape
        flat = {k: st[k].reshape(-1) for k in st}
        # padding pixels started MISS; everything else was ALIVE
        xi = jnp.tile(jnp.arange(wp), hp)
        yi = jnp.repeat(jnp.arange(hp), wp)
        prev_alive = (xi < cam.w) & (yi < cam.h)
        colors = jnp.stack([flat["cr"], flat["cg"], flat["cb"]], -1)
        dirs_o = jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1)
        colors = _apply_images(scene, colors, dirs_o, flat["status"],
                               prev_alive, flat["pid"], flat["u"],
                               flat["v"])
        st = dict(st, cr=colors[:, 0].reshape(hp, wp),
                  cg=colors[:, 1].reshape(hp, wp),
                  cb=colors[:, 2].reshape(hp, wp))

    overflow = jnp.zeros((), jnp.int32)
    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")
    if cfg.refmax > 1:
        h_pad, w_pad = st["cr"].shape
        rows = h_pad * w_pad // tt.LANE
        cols = [st[k].reshape(rows, tt.LANE) for k in names]
        for _ in range(cfg.refmax - 1):
            cols, ovf = packet_bounce(scene, cols, packet_c_max,
                                      interpret=interpret)
            overflow = overflow + ovf
        st = {k: c.reshape(h_pad, w_pad) for k, c in zip(names, cols)}

    cr, cg, cb, _ = _epilogue(st["cr"], st["cg"], st["cb"], st["path"],
                              st["status"],
                              float(cfg.distance_attenuation_factor))
    img = jnp.stack([cr, cg, cb], axis=-1)[:cam.h, :cam.w]
    if with_diag:
        return img, {"overflow": overflow}
    return img
