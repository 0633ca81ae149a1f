"""Counter-based random sampling for scatter.

TPU re-design of the reference RNG stack (/root/reference/src/math/rng/):
the single sequential ``FpLcg`` stream (fp-lcg.ts:50-83) cannot exist in a
data-parallel wavefront — every ray would contend for one state. Instead we
use JAX's counter-based threefry keys folded per (pixel, sample, bounce),
which is order-independent and therefore bitwise-reproducible under ANY
sharding of the ray space (SURVEY.md §2 #7): a ray's random stream depends
only on its global pixel id, never on which chip traces it.

The unit-ball direction sample replaces the reference's rejection loop
(vector_utils.ts:8-14, ~pi/6 acceptance — unvectorizable) with the exact
branch-free equivalent: an isotropic Gaussian direction scaled by a
cube-rooted uniform radius. Both produce the uniform-in-ball distribution.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .vecmath import dot, normalize

Array = jnp.ndarray


def ray_keys(key: Array, ray_id: Array) -> Array:
    """Per-ray keys folded from a base key and global ray ids ([N] -> [N]).

    This is the sharding-stable replacement for the reference's shared
    sequential RNG: identical (key, ray_id) always yields identical bits no
    matter how the wavefront is tiled across chips.
    """
    return jax.vmap(jax.random.fold_in, (None, 0))(key, ray_id)


def ball_sample(keys: Array) -> Array:
    """Uniform samples in the unit ball from [N] per-ray keys -> [N, 3]."""
    k_dir, k_rad = jax.vmap(lambda k: tuple(jax.random.split(k)))(keys)
    g = jax.vmap(lambda k: jax.random.normal(k, (3,)))(k_dir)
    d = normalize(g, eps=1e-20)
    u = jax.vmap(lambda k: jax.random.uniform(k, ()))(k_rad)
    r = jnp.cbrt(u)
    return d * r[..., None]


def hemisphere_ball_sample(keys: Array, normal: Array) -> Array:
    """Unit-ball sample flipped into the hemisphere of ``normal``.

    Matches the scatter setup of raytracer.ts:121-127: sample the ball, then
    negate if it opposes the surface normal.
    """
    v = ball_sample(keys)
    flip = dot(v, normal) < 0.0
    return jnp.where(flip[..., None], -v, v)


def scatter_direction(keys: Array, reflected: Array, normal: Array,
                      roughness: Array) -> Array:
    """Roughness-lerped scatter direction (raytracer.ts:121-133):
    ``normalize((1 - rho) * reflected + rho * ball_sample_in_hemisphere)``.

    With roughness 0 this returns exactly ``reflected`` (the trace step also
    gates on roughness > 0, raytracer.ts:233-235, so the RNG draw itself has
    no effect there — important for deterministic golden tests).
    """
    rand = hemisphere_ball_sample(keys, normal)
    rho = roughness[..., None]
    mixed = (1.0 - rho) * reflected + rho * rand
    mixed = normalize(mixed, eps=1e-20)
    return jnp.where(roughness[..., None] > 0.0, mixed, reflected)
