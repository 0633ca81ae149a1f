"""Mosaic-safe transcendental helpers for kernel bodies.

Mosaic (Pallas TPU) lowers sin/cos/exp/log/sqrt but not ``atan2``; the
equirect UV map (ops/vecmath.uv_map_sphere, uv_mapping.ts:19-25) needs it
inside the tiled kernel for image-textured winners. ``atan2_poly`` is the
standard octant-reduced polynomial arctangent — pure elementwise jnp
arithmetic, so the SAME function runs in kernel bodies and (for tests) in
plain XLA.

Accuracy: max |atan2_poly - atan2| ~ 8.9e-8 rad (degree-15 odd least-
squares fit on Chebyshev nodes over [0, 1]); for texture UVs that is
~1.4e-8 of a revolution — far below one texel at any practical atlas size.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray

#: coefficients of p(u) with atan(z) = z * p(z^2) on z in [0, 1]
_ATAN_C = (
    9.9999995820e-01, -3.3332302828e-01, 1.9973681363e-01,
    -1.4040138891e-01, 9.9679236189e-02, -6.0219127990e-02,
    2.4756780690e-02, -4.8311683873e-03,
)
_HALF_PI = float(np.pi / 2.0)
_PI = float(np.pi)


def atan2_poly(y: Array, x: Array) -> Array:
    """Elementwise atan2 via octant reduction + odd polynomial.

    Matches jnp.arctan2's principal value in (-pi, pi] up to ~8.9e-8 for
    finite inputs; (0, 0) returns 0 (same as the reference's uv use — the
    equirect map never feeds an exact zero vector).
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-37)
    u = z * z
    p = _ATAN_C[-1]
    for c in _ATAN_C[-2::-1]:
        p = p * u + c
    a = z * p
    a = jnp.where(ay > ax, _HALF_PI - a, a)
    a = jnp.where(x < 0.0, _PI - a, a)
    return jnp.where(y < 0.0, -a, a)
