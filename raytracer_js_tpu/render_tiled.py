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
from .config import JS_EPSILON, RayStatus, RenderConfig
from .kernels import trace_tiled as tt
from .models.scene import Scene

Array = jnp.ndarray

#: packet size — must equal the kernel ray tile
PACKET = tt.TILE_SUB * tt.LANE


def supports(scene: Scene) -> bool:
    """Same restricted class as the fused kernel."""
    from .kernels.trace_fused import supports as fused_supports

    return fused_supports(scene)


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
