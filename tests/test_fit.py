"""Inverse-rendering fit: recover scene parameters from rendered targets."""
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_js_tpu import RenderConfig, ResponseType, SceneBuilder, make_camera
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.optim import FitConfig, fit, multiview_loss
from raytracer_js_tpu.render import render_rays


def _scene(color):
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.2, 0.2, 0.2)))
    m = b.add_material(ResponseType.REFLECTION)
    b.add_sphere((4.0, 0.0, 0.0), 1.5, m, b.add_solid_texture(color))
    return b.build()


def _targets(scene, cameras, cfg, key):
    out = []
    for v, cam in enumerate(cameras):
        org, dirs = pixel_rays(cam)
        rid = jnp.arange(org.shape[0], dtype=jnp.int32) + v * org.shape[0]
        out.append(render_rays(scene, cfg, org, dirs, key, rid))
    return jnp.stack(out)


def test_fit_recovers_texture_color():
    """Optimize a wrong sphere color toward a rendered target — the core
    inverse-rendering capability (BASELINE config 5, small)."""
    cfg = RenderConfig(refmax=2)
    cams = [make_camera((0, 0, 0), 16, 16, np.pi / 2, np.pi / 2),
            make_camera((8, 0, 0), 16, 16, np.pi / 2, np.pi / 2,
                        rot_h=np.pi)]
    key = jax.random.key(1)
    true_scene = _scene((0.8, 0.3, 0.1))
    targets = _targets(true_scene, cams, cfg, key)

    start = _scene((0.4, 0.4, 0.4))
    l0 = float(multiview_loss(start, cfg, cams, targets, key))

    # train only the texture table (leaf filter by matching shape against
    # the known solid_rgb array)
    solid_shape = start.textures.solid_rgb.shape
    res = fit(start, cfg, cams, targets,
              FitConfig(steps=60, lr=5e-2), key=key,
              trainable=lambda i, p: p.shape == solid_shape)
    l1 = res.losses[-1]
    assert l1 < l0 * 0.05, (l0, l1)
    got = np.asarray(res.scene.textures.solid_rgb[1])
    np.testing.assert_allclose(got, [0.8, 0.3, 0.1], atol=0.05)


def _pose_scene():
    """Camera INSIDE three large emissive spheres: every pixel hits, so the
    ISL brightness field is a smooth function of the pose (no discrete
    hit-boundary signal, which stop_gradient discards by design), and the
    three distinct centers break the single-sphere rotational gauge."""
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.2, 0.2, 0.2)))
    m = b.add_material(ResponseType.REFLECTION, light=True)
    t = b.add_solid_texture((0.9, 0.6, 0.3))
    for c, r in (((6.0, 2.0, -1.5), 12.0), ((-4.0, -3.0, 2.0), 14.0),
                 ((1.0, 8.0, 3.0), 16.0)):
        b.add_sphere(c, r, m, t)
    return b.build()


def test_fit_recovers_camera_pose():
    """FitConfig.fit_cameras: a perturbed camera pose (translation AND
    rotation) converges back to the pose that rendered the target
    (VERDICT r3 #6 / SURVEY §7 step 7). Exercises the Riemannian triad
    projection (optim/fit._project_triad_grads) — raw-triad gradients
    diverge on this same landscape — and checks the recovered triad stays
    orthonormal."""
    scene = _pose_scene()
    cfg = RenderConfig(refmax=1, distance_attenuation_factor=0.1)
    key = jax.random.key(5)
    true_cam = make_camera((0, 0, 0), 24, 24, np.pi / 2, np.pi / 2)
    targets = _targets(scene, [true_cam], cfg, key)

    from raytracer_js_tpu.models.camera import move, rotate_h
    from raytracer_js_tpu.parallel.sharding import float_partition
    start_cam = rotate_h(move(true_cam, (0.1, 0.2, -0.15)), 0.06)
    l0 = float(multiview_loss(scene, cfg, [start_cam], targets, key))
    # pose-only: camera leaves sit AFTER the scene float leaves
    n_scene = len(float_partition(scene)[0])
    res = fit(scene, cfg, [start_cam], targets,
              FitConfig(steps=300, lr=1e-2, fit_cameras=True), key=key,
              trainable=lambda i, p: i >= n_scene)
    assert res.cameras is not None
    cam = res.cameras[0]
    assert res.losses[-1] < l0 * 1e-3, (l0, res.losses[::75])
    np.testing.assert_allclose(np.asarray(cam.pos), [0.0, 0.0, 0.0],
                               atol=0.06)
    np.testing.assert_allclose(np.asarray(cam.front), [1.0, 0.0, 0.0],
                               atol=0.03)
    # triad still orthonormal after 300 retraction steps
    tri = np.stack([np.asarray(cam.front), np.asarray(cam.left),
                    np.asarray(cam.up)])
    np.testing.assert_allclose(tri @ tri.T, np.eye(3), atol=1e-5)


def test_fit_camera_pose_sharded_matches_unsharded():
    """fit_cameras composes with the mesh: in-shard ray generation +
    axis_index slicing reproduces the unsharded trajectory (early steps
    bitwise-close; later steps drift by f32 reduction-order only)."""
    from raytracer_js_tpu.parallel import make_mesh

    scene = _pose_scene()
    cfg = RenderConfig(refmax=1, distance_attenuation_factor=0.1)
    key = jax.random.key(7)
    true_cam = make_camera((0, 0, 0), 16, 8, np.pi / 2, np.pi / 2)
    targets = _targets(scene, [true_cam], cfg, key)
    from raytracer_js_tpu.models.camera import move
    start_cam = move(true_cam, (0.0, 0.2, 0.0))

    fc = FitConfig(steps=2, lr=1e-2, fit_cameras=True)
    r_plain = fit(scene, cfg, [start_cam], targets, fc, key=key)
    r_shard = fit(scene, cfg, [start_cam], targets, fc, key=key,
                  mesh=make_mesh())
    np.testing.assert_allclose(r_plain.losses, r_shard.losses,
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(r_plain.cameras[0].pos),
                               np.asarray(r_shard.cameras[0].pos),
                               rtol=1e-4, atol=1e-6)


def test_fit_sharded_matches_unsharded_first_step():
    from raytracer_js_tpu.parallel import make_mesh

    cfg = RenderConfig(refmax=1)
    cams = [make_camera((0, 0, 0), 16, 8, np.pi / 2, np.pi / 2)]
    key = jax.random.key(0)
    true_scene = _scene((0.9, 0.1, 0.2))
    targets = _targets(true_scene, cams, cfg, key)
    start = _scene((0.5, 0.5, 0.5))

    r_plain = fit(start, cfg, cams, targets, FitConfig(steps=3, lr=1e-2),
                  key=key)
    r_shard = fit(start, cfg, cams, targets, FitConfig(steps=3, lr=1e-2),
                  key=key, mesh=make_mesh())
    np.testing.assert_allclose(r_plain.losses, r_shard.losses,
                               rtol=1e-5, atol=1e-7)


def test_fit_accel_rebuild_policy():
    """OCTREE-backend fit with accel_every: the octree is rebuilt from the
    moving geometry with pinned shapes (no recompile), and optimizing
    geometry still converges (VERDICT r1 next-step 7)."""
    from raytracer_js_tpu.accel.octree import build_octree, nearest_hit_octree
    from raytracer_js_tpu.config import HitBackend, OctreeConfig
    from raytracer_js_tpu.ops.trace import nearest_hit_brute

    cfg = RenderConfig(refmax=1, backend=HitBackend.OCTREE)
    cams = [make_camera((0, 0, 0), 16, 16, np.pi / 2, np.pi / 2)]
    key = jax.random.key(3)

    def scene_at(y):
        # emissive sphere: the ISL factor 1/(eps + (t*A)^2) carries the
        # continuous center -> pixel gradient (a diffuse solid-texture hit
        # has no continuous dependence on geometry at all)
        b = SceneBuilder()
        b.set_sky(b.add_solid_texture((0.2, 0.2, 0.2)))
        m = b.add_material(ResponseType.REFLECTION, light=True)
        b.add_sphere((4.0, y, 0.0), 2.5, m,
                     b.add_solid_texture((0.9, 0.2, 0.1)))
        return b.build()

    true_scene = scene_at(0.0)
    targets = _targets(true_scene, cams, cfg, key)
    start = scene_at(0.8)                       # wrong sphere position
    ocfg = OctreeConfig(max_depth=3)
    accel = build_octree(start, ocfg)

    center_shape = start.sphere_center.shape
    res = fit(start, cfg, cams, targets,
              FitConfig(steps=60, lr=3e-2, accel_every=2), key=key,
              trainable=lambda i, p: p.shape == center_shape,
              accel=accel)
    assert res.losses[-1] < res.losses[0] * 0.5, res.losses[::10]
    got_y = float(res.scene.sphere_center[0, 1])
    assert abs(got_y) < abs(0.8) * 0.6, got_y

    # the final accel (rebuilt, pinned shapes) agrees with brute on the
    # final geometry
    final_accel = build_octree(res.scene, ocfg, like=accel)
    org = jnp.zeros((8, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (8, 1))
    t_o, p_o = nearest_hit_octree(res.scene, final_accel, org, d)
    t_b, p_b = nearest_hit_brute(res.scene, org, d)
    np.testing.assert_allclose(np.asarray(t_o), np.asarray(t_b), rtol=1e-5)
