"""Parity tests for the fused replay forward/backward Pallas kernels.

Contract: kernels/replay_grad.replay_colors matches ops/trace.trace_rays
replay colors, and its custom-VJP gradients match jax.grad through the XLA
replay path on every Scene float leaf AND on (org, dir) — the camera-pose
gradient (reference behavior raytracer.ts:166-277 via the scalar oracle;
the search winners are supplied, stop_gradient'ed in both paths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_js_tpu import RenderConfig, SceneBuilder, make_camera
from raytracer_js_tpu.config import HitBackend, ResponseType
from raytracer_js_tpu.kernels import replay_grad
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.ops.trace import record_paths, trace_rays
from raytracer_js_tpu.parallel.sharding import float_partition


def _scene(seed=0, n_sph=9):
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.3, 0.45, 0.7)))
    grey = b.add_solid_texture((0.6, 0.55, 0.5))
    white = b.add_solid_texture((1.0, 0.9, 0.8))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((0.0, 0.0, -51.0), 100.0, diffuse, grey)
    b.add_box((4.0, -2.5, 1.0), (1.0, 2.0, 1.5), mirror, white)
    rng = np.random.default_rng(seed)
    pal = [b.add_solid_texture(rng.uniform(0.2, 1.0, 3)) for _ in range(4)]
    centers = rng.uniform([2.0, -3.0, -0.5], [8.0, 3.0, 3.0], (n_sph, 3))
    radii = rng.uniform(0.3, 0.9, n_sph)
    for i in range(n_sph):
        b.add_sphere(centers[i], float(radii[i]),
                     mirror if i % 3 == 0 else diffuse, pal[i % 4])
    b.add_sphere((5.0, 0.5, 5.0), 1.2, light, white)
    return b.build()


def _rays(n=4096, seed=1):
    cam = make_camera((0.0, 0.0, 0.5), 64, 64, np.pi / 2, np.pi / 2)
    org, dirs = pixel_rays(cam)
    return org[:n], dirs[:n]


@pytest.mark.parametrize("refmax", [1, 2, 3])
def test_forward_matches_xla_replay(refmax):
    scene = _scene()
    cfg = RenderConfig(refmax=refmax, backend=HitBackend.BRUTE, unroll=True)
    assert replay_grad.supports(scene, cfg)
    org, dirs = _rays()
    n = org.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    rec = record_paths(scene, cfg, org, dirs, key, rid)
    st = trace_rays(scene, cfg, org, dirs, key, rid, pid_seq=rec)
    got = replay_colors = replay_grad.replay_colors(
        scene, cfg, org, dirs, rec, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(st.color),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("refmax", [2, 3])
def test_grads_match_xla_replay(refmax):
    scene = _scene()
    cfg = RenderConfig(refmax=refmax, backend=HitBackend.BRUTE, unroll=True)
    org, dirs = _rays()
    n = org.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    rec = record_paths(scene, cfg, org, dirs, key, rid)
    params, rebuild = float_partition(scene)
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))

    def loss_xla(params, org, dirs):
        st = trace_rays(rebuild(params), cfg, org, dirs, key, rid,
                        pid_seq=rec)
        return jnp.sum((st.color - target) ** 2) / n

    def loss_kern(params, org, dirs):
        col = replay_grad.replay_colors(rebuild(params), cfg, org, dirs,
                                        rec, interpret=True)
        return jnp.sum((col - target) ** 2) / n

    l0, g0 = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        params, org, dirs)
    l1, g1 = jax.value_and_grad(loss_kern, argnums=(0, 1, 2))(
        params, org, dirs)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    # scene leaves
    for a, b in zip(g0[0], g1[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)
    # ray cotangents (camera-pose gradient path)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g0[2]),
                               rtol=2e-4, atol=2e-6)


def test_listed_mode_matches_xla_replay():
    """LISTED kernels (per-tile compact sphere-id lists) reproduce the
    same colors and gradients as the full-scan kernels / XLA replay."""
    scene = _scene(seed=11, n_sph=37)
    cfg = RenderConfig(refmax=2, backend=HitBackend.BRUTE, unroll=True)
    org, dirs = _rays()
    n = org.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    rec = record_paths(scene, cfg, org, dirs, key, rid)
    tab = replay_grad.build_tile_lists(np.asarray(rec), scene.n_spheres)
    assert tab is not None and tab[:, 0].max() >= 1
    params, rebuild = float_partition(scene)
    target = jnp.zeros((n, 3), jnp.float32)

    def loss_xla(params, org, dirs):
        st = trace_rays(rebuild(params), cfg, org, dirs, key, rid,
                        pid_seq=rec)
        return jnp.sum((st.color - target) ** 2) / n

    def loss_kern(params, org, dirs):
        col = replay_grad.replay_colors(rebuild(params), cfg, org, dirs,
                                        rec, interpret=True,
                                        tile_lists=tab)
        return jnp.sum((col - target) ** 2) / n

    l0, g0 = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        params, org, dirs)
    l1, g1 = jax.value_and_grad(loss_kern, argnums=(0, 1, 2))(
        params, org, dirs)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    for a, b in zip(g0[0], g1[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g0[1]),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(g1[2]), np.asarray(g0[2]),
                               rtol=2e-4, atol=2e-6)


def test_sharded_fit_replay_kernel_matches_unsharded():
    """The kernel replay step composes with the mesh: params marked
    device-varying + explicit psum == the implicit-psum XLA semantics."""
    from raytracer_js_tpu.optim import FitConfig, fit
    from raytracer_js_tpu.parallel import make_mesh
    from raytracer_js_tpu.render import render_rays

    cfg = RenderConfig(refmax=2, backend=HitBackend.BRUTE)
    scene_true = _scene(seed=5, n_sph=4)
    cams = [make_camera((0.0, 0.0, 0.5), 32, 32, np.pi / 2, np.pi / 2)]
    key = jax.random.key(2)
    org, dirs = pixel_rays(cams[0])
    rid = jnp.arange(org.shape[0], dtype=jnp.int32)
    targets = jnp.stack([render_rays(scene_true, cfg, org, dirs, key, rid)])

    start = _scene(seed=7, n_sph=4)
    fc = FitConfig(steps=3, lr=1e-2, replay_every=1)
    r_plain = fit(start, cfg, cams, targets, fc, key=key)
    r_mesh = fit(start, cfg, cams, targets, fc, key=key, mesh=make_mesh())
    np.testing.assert_allclose(r_mesh.losses, r_plain.losses,
                               rtol=1e-5, atol=1e-7)


def test_supports_gates():
    scene = _scene()
    assert replay_grad.supports(scene, RenderConfig(refmax=2))
    assert not replay_grad.supports(scene, RenderConfig(refmax=2, spp=4))
    assert not replay_grad.supports(scene, RenderConfig(refmax=9))
    big = _scene(n_sph=replay_grad.SCAN_MAX_PRIMS + 8)
    assert not replay_grad.supports(big, RenderConfig(refmax=2))
