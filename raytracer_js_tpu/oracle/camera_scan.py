"""Scalar twin of the reference camera's sequential pixel-direction scan.

The reference generates pixel directions *incrementally*: starting from the
orthonormal (front, left, up) triad it applies one fixed-angle 2-D Givens
rotation per pixel, marching center-out per row, rows center-out per column
(/root/reference/src/view/camera.ts:207-250). ``models/camera.pixel_rays``
claims its closed form equals that construction; this module re-implements
the sequential scan faithfully (float64 NumPy, one rotation per step) so the
claim is a *test* against an executable oracle, not a comment.

Reproduced behaviors (square screens):

* ``rotate_vectors((x, y), (c, s)) = (c*x + s*y, -s*x + c*y)``
  (vector.ts:317-322) — rotation *toward* the second basis vector;
* per-step angles ``fov_h / screen_w`` horizontally and ``fov_v / screen_h``
  vertically (camera.ts:82-86);
* scan order: vertical outer loop from ``w>>1`` up then ``(w>>1)-1`` down
  (counter-rotation, rotate-first), horizontal inner loop from ``h>>1`` up
  then ``(h>>1)-1`` down (camera.ts:241-249);
* the horizontal scan rotates the pair (v-rotated front, UN-rotated left)
  (camera.ts:219-220 captures ``camera.norm_lf``);
* DOCUMENTED DIVERGENCE (non-square screens): the reference's loops index
  the horizontal range with ``screen_h`` and the vertical range with
  ``screen_w`` (camera.ts:242-249), consistent only when w == h. The twin
  keeps the reference bounds, so parity with the closed form is asserted on
  square screens only (models/camera.py docstring).
"""
from __future__ import annotations

import numpy as np


def _rotate_pair(vx: np.ndarray, vy: np.ndarray, c: float, s: float):
    """vector.rotate_vectors (vector.ts:317-322), float64."""
    return c * vx + s * vy, -s * vx + c * vy


def scan_directions(front, left, up, w: int, h: int,
                    fov_h: float, fov_v: float) -> np.ndarray:
    """Sequential center-out scan -> dirs [h, w, 3] float64.

    Output indexed [y, x] like ``pixel_rays(cam).reshape(h, w, 3)``; the
    emitted (x, y) of each CameraPixel addresses the same layout the
    exposure buffer uses (exposure_buffer.ts:62-66).
    """
    front = np.asarray(front, np.float64)
    left = np.asarray(left, np.float64)
    up = np.asarray(up, np.float64)
    ch, sh = np.cos(fov_h / w), np.sin(fov_h / w)
    cv, sv = np.cos(fov_v / h), np.sin(fov_v / h)
    out = np.zeros((h, w, 3), np.float64)

    def iter_h(from_x: int, to_x: int, y: int, s_sign: float,
               beg_fr: np.ndarray, inc: int, rotate_first: bool):
        fr, lf = beg_fr, left
        if rotate_first:
            fr, lf = _rotate_pair(fr, lf, ch, s_sign * sh)
        x = from_x
        while x != to_x:
            out[y, x] = fr
            fr, lf = _rotate_pair(fr, lf, ch, s_sign * sh)
            x += inc

    def iter_v(from_y: int, to_y: int, s_sign: float, inc: int,
               rotate_first: bool):
        fr, u = front, up
        if rotate_first:
            fr, u = _rotate_pair(fr, u, cv, s_sign * sv)
        y = from_y
        while y != to_y:
            # reference bounds: horizontal range indexed by screen_h
            # (camera.ts:242-243) — the square-only quirk kept verbatim
            iter_h(h >> 1, h, y, +1.0, fr, 1, False)
            iter_h((h >> 1) - 1, -1, y, -1.0, fr, -1, True)
            fr, u = _rotate_pair(fr, u, cv, s_sign * sv)
            y += inc

    # vertical range indexed by screen_w (camera.ts:248-249)
    iter_v(w >> 1, w, +1.0, 1, False)
    iter_v((w >> 1) - 1, -1, -1.0, -1, True)
    return out
