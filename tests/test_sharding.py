"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The reference has zero parallelism (SURVEY.md §2); these validate the new
capability: sharded rendering is bitwise-identical to single-device, and the
psum-all-reduced fit step produces replicated finite gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_js_tpu import RenderConfig, render_hdr
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.parallel import (
    float_partition,
    make_mesh,
    render_hdr_sharded,
    sharded_fit_step,
)

from scenes import config1_camera, config1_cfg, config1_scene


def test_eight_devices_present():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_render_matches_single(n_dev):
    scene = config1_scene()
    cam = config1_camera(32, 16)   # 512 rays / n_dev each
    cfg = config1_cfg()
    mesh = make_mesh(jax.devices()[:n_dev])
    img1 = np.asarray(render_hdr(scene, cam, cfg))
    imgN = np.asarray(render_hdr_sharded(mesh, scene, cam, cfg))
    np.testing.assert_array_equal(img1, imgN)


def test_sharded_render_rng_stable_across_mesh_sizes():
    """Roughness>0 draws randomness; global-ray-id keying must make results
    identical under 2-way and 8-way sharding."""
    from raytracer_js_tpu import ResponseType, SceneBuilder, make_camera

    b = SceneBuilder()
    sky = b.add_solid_texture((0.4, 0.5, 0.6))
    b.set_sky(sky)
    rough = b.add_material(ResponseType.REFLECTION, mirror=True, roughness=0.5)
    b.add_sphere((4.0, 0.0, 0.0), 1.5, rough, b.add_solid_texture((1, 1, 1)))
    scene = b.build()
    cam = make_camera((0, 0, 0), 16, 16, np.pi / 2, np.pi / 2)
    cfg = RenderConfig(refmax=2)
    key = jax.random.key(7)
    img2 = np.asarray(render_hdr_sharded(
        make_mesh(jax.devices()[:2]), scene, cam, cfg, key=key))
    img8 = np.asarray(render_hdr_sharded(
        make_mesh(jax.devices()[:8]), scene, cam, cfg, key=key))
    np.testing.assert_array_equal(img2, img8)


def test_sharded_fit_step_grads():
    scene = config1_scene()
    cam = config1_camera(16, 16)
    cfg = config1_cfg()
    mesh = make_mesh(jax.devices())
    key = jax.random.key(0)
    target = jnp.zeros((cam.h * cam.w, 3), jnp.float32)
    loss, grads = sharded_fit_step(mesh, scene, cfg, cam, target, key)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the sphere geometry must receive signal
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_sharded_fit_matches_unsharded_grad():
    """psum-reduced sharded gradient == plain jax.grad of the global loss."""
    scene = config1_scene()
    cam = config1_camera(16, 8)
    cfg = config1_cfg()
    key = jax.random.key(0)
    org, dirs = pixel_rays(cam)
    ray_id = jnp.arange(org.shape[0], dtype=jnp.int32)
    target = jnp.full((org.shape[0], 3), 0.25, jnp.float32)

    params, rebuild = float_partition(scene)

    def global_loss(params):
        from raytracer_js_tpu.render import render_rays

        sc = rebuild(params)
        colors = render_rays(sc, cfg, org, dirs, key, ray_id)
        return jnp.sum((colors - target) ** 2) / org.shape[0]

    loss_ref, grads_ref = jax.value_and_grad(global_loss)(params)
    mesh = make_mesh(jax.devices())
    loss_sh, grads_sh = sharded_fit_step(mesh, scene, cfg, cam, target, key)
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(grads_sh),
                    jax.tree_util.tree_leaves(grads_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
