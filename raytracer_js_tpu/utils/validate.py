"""Scene and runtime validation — the sanitizer analogue.

The reference's defensive layer is scattered runtime throws: vector size
checks (vector.ts:67-76), octree bounds (octree.ts:45-48), walker sanity
(octree_space.ts:232-238), buffer bounds (screen_canvas.ts:85-90), UV bounds
(texture_image.ts:49-50), and a geometric acute-normal warning
(raytracer.ts:199-203). A wavefront engine cannot throw per-lane, so the
equivalents here are (a) host-side structural validation at scene build and
(b) optional traced value checks via ``checkify``-style finite assertions
that run under jit when debugging.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import Scene


class SceneValidationError(ValueError):
    pass


def validate_scene(scene: Scene, strict: bool = True) -> List[str]:
    """Structural validation -> list of problem strings (raises when strict).

    Checks the invariants every downstream kernel assumes: id columns in
    range, positive radii/extents, finite geometry, normalized table sizes.
    """
    problems: List[str] = []

    def chk(cond, msg):
        if not cond:
            problems.append(msg)

    P = scene.n_prims
    chk(scene.prim_material.shape == (P,), "prim_material wrong shape")
    chk(scene.prim_texture.shape == (P,), "prim_texture wrong shape")
    chk(scene.prim_substance.shape == (P,), "prim_substance wrong shape")

    n_mat = scene.materials.response.shape[0]
    n_tex = scene.textures.kind.shape[0]
    n_sub = scene.sub_refr.shape[0]
    if P:
        mat = np.asarray(scene.prim_material)
        tex = np.asarray(scene.prim_texture)
        sub = np.asarray(scene.prim_substance)
        chk(((mat >= 0) & (mat < n_mat)).all(), "material id out of range")
        chk(((tex >= 0) & (tex < n_tex)).all(), "texture id out of range")
        chk(((sub >= -1) & (sub < n_sub)).all(), "substance id out of range")

    for name in ("sphere_center", "sphere_radius", "box_center", "box_half",
                 "tri_v0", "tri_v1", "tri_v2"):
        arr = np.asarray(getattr(scene, name))
        chk(np.isfinite(arr).all(), f"{name} contains non-finite values")
    chk((np.asarray(scene.sphere_radius) > 0).all() or scene.n_spheres == 0,
        "non-positive sphere radius")
    chk((np.asarray(scene.box_half) > 0).all() or scene.n_boxes == 0,
        "non-positive box extent")
    rough = np.asarray(scene.materials.roughness)
    chk(((rough >= 0) & (rough <= 1)).all(), "roughness outside [0, 1]")
    chk((np.asarray(scene.sub_refr) > 0).all(), "non-positive refractive index")
    chk(0 <= scene.sky_tex < n_tex, "sky texture id out of range")
    chk(bool(np.isfinite(np.asarray(scene.textures.solid_rgb)).all()),
        "non-finite texture colors")

    if strict and problems:
        raise SceneValidationError("; ".join(problems))
    return problems


def assert_rays_sane(org: jnp.ndarray, dir: jnp.ndarray) -> None:
    """Host-side wavefront sanity (walker set_position analogue,
    octree_space.ts:232-238): finite origins, near-unit directions."""
    o = np.asarray(org)
    d = np.asarray(dir)
    if not np.isfinite(o).all():
        raise SceneValidationError("non-finite ray origins")
    n = np.linalg.norm(d, axis=-1)
    if not np.allclose(n, 1.0, atol=1e-3):
        raise SceneValidationError(
            f"ray directions not unit (|d| in [{n.min():.4f}, {n.max():.4f}])")


def finite_or_debug(x: jnp.ndarray, name: str = "value") -> jnp.ndarray:
    """Traced finite check: under jit, funnels a NaN/Inf count into a
    jax.debug.print (per-lane throws are impossible on a wavefront —
    the acute-normal console.warn analogue, raytracer.ts:199-203)."""
    bad = jnp.size(x) - jnp.sum(jnp.isfinite(x))

    def warn(bad_count):
        jax.debug.print("[raytracer_js_tpu] {} non-finite lanes in " + name,
                        bad_count)

    jax.lax.cond(bad > 0, warn, lambda _: None, bad)
    return x
