"""Pallas nearest-hit kernel vs the XLA brute path (interpret mode on CPU).

The kernel is the PALLAS HitBackend engine; on the CPU test mesh it runs in
pallas interpret mode, exercising the identical program the TPU compiles.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_js_tpu import RenderConfig, render_hdr
from raytracer_js_tpu.config import HitBackend
from raytracer_js_tpu.kernels.nearest_hit import nearest_hit_pallas
from raytracer_js_tpu.ops.trace import nearest_hit_brute

from scenes import config1_camera, config1_cfg, config1_scene


def _rand_rays(n, seed=0, lo=-6, hi=6):
    rng = np.random.default_rng(seed)
    org = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


@pytest.mark.parametrize("with_glass,with_tri", [(False, False), (True, True)])
def test_kernel_matches_brute(with_glass, with_tri):
    scene = config1_scene(with_glass=with_glass, with_tri=with_tri)
    org, d = _rand_rays(300, seed=1)
    t_b, p_b = map(np.asarray, nearest_hit_brute(scene, org, d))
    t_p, p_p = map(np.asarray, nearest_hit_pallas(scene, org, d))
    hit = p_b >= 0
    np.testing.assert_allclose(t_p[hit], t_b[hit], rtol=1e-4, atol=1e-6)
    assert np.array_equal(p_p[~hit], p_b[~hit])
    assert (p_p[hit] != p_b[hit]).mean() < 0.02   # exact-tie tolerance


def test_kernel_ray_count_not_multiple_of_block():
    """Tail padding: ray counts off the 256 block must round-trip."""
    scene = config1_scene()
    org, d = _rand_rays(37, seed=2)
    t_b, p_b = map(np.asarray, nearest_hit_brute(scene, org, d))
    t_p, p_p = map(np.asarray, nearest_hit_pallas(scene, org, d))
    hit = p_b >= 0
    np.testing.assert_allclose(t_p[hit], t_b[hit], rtol=1e-4, atol=1e-6)
    assert np.array_equal(p_p, p_b)


def test_render_pallas_backend_matches_brute():
    scene = config1_scene(with_glass=True, with_tri=True)
    cam = config1_camera(16, 16)
    img_b = np.asarray(render_hdr(scene, cam, config1_cfg()))
    img_p = np.asarray(render_hdr(
        scene, cam, config1_cfg(backend=HitBackend.PALLAS)))
    np.testing.assert_allclose(img_p, img_b, rtol=1e-5, atol=1e-6)


def test_kernel_spheres_only_scene():
    """Empty box/tri tables must not upset the tile loops."""
    from raytracer_js_tpu import ResponseType, SceneBuilder

    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.5, 0.5, 0.5)))
    m = b.add_material(ResponseType.REFLECTION)
    tex = b.add_solid_texture((1, 1, 1))
    b.add_sphere((3.0, 0.0, 0.0), 1.0, m, tex)
    scene = b.build()
    org, d = _rand_rays(64, seed=3)
    t_b, p_b = map(np.asarray, nearest_hit_brute(scene, org, d))
    t_p, p_p = map(np.asarray, nearest_hit_pallas(scene, org, d))
    assert np.array_equal(p_p, p_b)
    hit = p_b >= 0
    np.testing.assert_allclose(t_p[hit], t_b[hit], rtol=1e-4)


def test_scalar_kernel_matches_brute():
    from raytracer_js_tpu.kernels.nearest_hit import nearest_hit_pallas_scalar

    scene = config1_scene(with_glass=True, with_tri=True)
    org, d = _rand_rays(300, seed=5)
    t_b, p_b = map(np.asarray, nearest_hit_brute(scene, org, d))
    t_p, p_p = map(np.asarray, nearest_hit_pallas_scalar(scene, org, d))
    hit = p_b >= 0
    np.testing.assert_allclose(t_p[hit], t_b[hit], rtol=1e-4, atol=1e-6)
    assert np.array_equal(p_p[~hit], p_b[~hit])
    assert (p_p[hit] != p_b[hit]).mean() < 0.02


def test_kernel_near_miss_field_no_phantom_hits():
    """r5 regression: a multi-tile sphere field rich in near-miss rays.

    The tile kernel's MXU-factored o.c / d.c dots ran at DEFAULT matmul
    precision, whose bf16 operand rounding flipped near-miss discriminants
    positive (disc -0.124 -> +0.048) — ~25% of true MISS rays reported
    phantom hits on chip (and under this environment's CPU lowering).
    Interpret-mode parity vs brute over 512 primaries catches the class;
    needs >= 2 prim tiles so the dense tile loop (not the scalar variant)
    is exercised.
    """
    from raytracer_js_tpu import ResponseType, SceneBuilder, make_camera
    from raytracer_js_tpu.models.camera import pixel_rays

    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.35, 0.45, 0.65)))
    m = b.add_material(ResponseType.REFLECTION)
    tex = b.add_solid_texture((0.8, 0.3, 0.2))
    rng = np.random.default_rng(0)
    for _ in range(600):
        p = rng.uniform(-4, 4, 3)
        p[0] += 8
        b.add_sphere(tuple(p), 0.25, m, tex)
    scene = b.build()
    cam = make_camera((0, 0, 0.5), 32, 32, np.pi / 2, np.pi / 2)
    org, d = pixel_rays(cam)
    t_b, p_b = map(np.asarray, nearest_hit_brute(scene, org, d))
    t_p, p_p = map(np.asarray, nearest_hit_pallas(scene, org, d))
    assert np.array_equal(p_p, p_b)
    hit = p_b >= 0
    np.testing.assert_allclose(t_p[hit], t_b[hit], rtol=1e-3, atol=1e-3)
