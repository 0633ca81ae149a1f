"""Fused full-trace Pallas kernel vs the XLA wavefront loop (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_js_tpu import RenderConfig, ResponseType, SceneBuilder, make_camera
from raytracer_js_tpu.kernels.trace_fused import supports, trace_rays_fused
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.ops.trace import trace_rays

from scenes import config1_cfg, config1_scene


def _compare(scene, cam, cfg):
    org, dirs = pixel_rays(cam)
    rid = jnp.arange(org.shape[0], dtype=jnp.int32)
    key = jax.random.key(0)
    ref = trace_rays(scene, cfg, org, dirs, key, rid)
    color, status = trace_rays_fused(scene, cfg, org, dirs)
    np.testing.assert_allclose(np.asarray(color), np.asarray(ref.color),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(status), np.asarray(ref.status))


def test_supports_gate():
    assert supports(config1_scene())
    # r2: transmission and roughness are in-class (in-kernel containment
    # scan / counter-RNG scatter); only image textures remain excluded
    assert supports(config1_scene(with_glass=True))
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0, 0, 0)))
    rough = b.add_material(ResponseType.REFLECTION, mirror=True,
                           roughness=0.5)
    b.add_sphere((1, 0, 0), 0.5, rough, b.add_solid_texture((1, 1, 1)))
    assert supports(b.build())
    b2 = SceneBuilder()
    img = np.full((4, 4, 3), 0.5, np.float32)
    b2.set_sky(b2.add_image_texture(img))
    assert not supports(b2.build())


def _ext_scene(trans=False, rough=0.0, seed=5):
    """Mixed extended-class scene: ground box, mirror, glass (defined and
    undefined substance), emissive."""
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.35, 0.45, 0.65)))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True,
                            roughness=rough)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((0, 0, -51.0), 100.0, diffuse, b.add_solid_texture((.6,) * 3))
    b.add_sphere((4, 0, 0.5), 1.0, mirror, b.add_solid_texture((.9, .2, .1)))
    if trans:
        glass_sub = b.add_substance(1.5)
        glass = b.add_material(ResponseType.TRANSMISSION)
        b.add_sphere((3, -1.5, 0.5), 0.8, glass,
                     b.add_solid_texture((.95, .95, 1.0)),
                     substance=glass_sub)
        # undefined substance: pass-through, no refraction
        # (raytracer.ts:243-248)
        b.add_sphere((3, 1.5, 0.5), 0.7, glass,
                     b.add_solid_texture((1.0, 1.0, 1.0)))
        # nested: small water sphere inside the glass one exercises the
        # innermost-containment rule
        water = b.add_substance(1.333)
        b.add_sphere((3, -1.5, 0.5), 0.35, glass,
                     b.add_solid_texture((0.9, 1.0, 1.0)), substance=water)
    b.add_sphere((5, .5, 4.0), 1.0, light, b.add_solid_texture((1.,) * 3))
    return b.build()


def test_fused_transmission_matches_wavefront():
    scene = _ext_scene(trans=True)
    assert supports(scene)
    cam = make_camera((0.0, 0.0, 0.5), 24, 24, np.pi / 2, np.pi / 2)
    _compare(scene, cam, RenderConfig(refmax=3))


def test_fused_rough_matches_wavefront():
    """Identical counter-RNG streams: the fused kernel's in-kernel scatter
    reproduces the XLA path's draws (same (key, rid, bounce) hash)."""
    scene = _ext_scene(rough=0.5)
    cam = make_camera((0.0, 0.0, 0.5), 24, 24, np.pi / 2, np.pi / 2)
    _compare(scene, cam, RenderConfig(refmax=2))


def test_fused_rough_transmission_combined():
    scene = _ext_scene(trans=True, rough=0.4)
    cam = make_camera((0.0, 0.0, 0.5), 24, 24, np.pi / 2, np.pi / 2)
    _compare(scene, cam, RenderConfig(refmax=3))


def test_fused_frame_rough_spp_matches_brute():
    """Frame kernel + spp accumulation on a rough scene vs the XLA path
    (render_hdr end-to-end, same RNG stream ids pixel*spp + s)."""
    import dataclasses

    from raytracer_js_tpu.config import HitBackend
    from raytracer_js_tpu.render import render_hdr

    scene = _ext_scene(rough=0.6)
    cam = make_camera((0.0, 0.0, 0.5), 24, 16, np.pi / 2, np.pi / 3)
    key = jax.random.key(11)
    cfg = RenderConfig(refmax=2, spp=2, backend=HitBackend.FUSED)
    a = np.asarray(render_hdr(scene, cam, cfg, key=key))
    b = np.asarray(render_hdr(
        scene, cam, dataclasses.replace(cfg, backend=HitBackend.BRUTE),
        key=key))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_fused_matches_wavefront_config1():
    scene = config1_scene()
    assert supports(scene)
    cam = make_camera((0.0, 0.0, 0.5), 16, 16, np.pi / 2, np.pi / 2)
    _compare(scene, cam, config1_cfg())


def test_fused_matches_wavefront_mirror_exhaust():
    """Parallel mirrors: exhaustion + emissive ISL paths."""
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.2, 0.3, 0.4)))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((3.0, 0.0, 0.0), (0.5, 8.0, 8.0), mirror, white)
    b.add_box((-3.0, 0.0, 0.0), (0.5, 8.0, 8.0), mirror, white)
    b.add_sphere((0.0, 0.0, -5.5), 1.0, light, white)
    scene = b.build()
    cam = make_camera((0.0, 0.0, 0.0), 16, 16, np.pi / 2, np.pi / 2)
    _compare(scene, cam, RenderConfig(refmax=4))


def test_fused_with_triangles():
    scene = config1_scene(with_tri=True)
    assert supports(scene)
    cam = make_camera((0.0, 0.0, 0.5), 12, 12, np.pi / 2, np.pi / 2)
    _compare(scene, cam, config1_cfg())


def test_fused_empty_scene_pure_sky():
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.3, 0.6, 0.9)))
    scene = b.build()
    cam = make_camera((0.0, 0.0, 0.0), 8, 8, np.pi / 2, np.pi / 2)
    _compare(scene, cam, RenderConfig(refmax=2))


def test_fused_shortlist_parity(monkeypatch):
    """Bounce-0 frustum shortlists must be exact culling: spheres spread
    across the view (some behind the camera, one enclosing it) trace
    identically to the full scan. The shortlist is opt-in (off by default
    below RT_SHORTLIST_MIN spheres), so force it on here."""
    import raytracer_js_tpu.kernels.trace_fused as tf

    monkeypatch.setattr(tf, "SHORTLIST_MIN_SPHERES", 16)
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.2, 0.3, 0.4)))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    rng = np.random.default_rng(7)
    for i in range(18):
        c = rng.uniform([-6.0, -6.0, -6.0], [8.0, 6.0, 6.0])
        tex = b.add_solid_texture(rng.uniform(0.2, 1.0, 3))
        b.add_sphere(c, float(rng.uniform(0.3, 1.2)),
                     (diffuse, mirror)[i % 2], tex)
    b.add_sphere((0.0, 0.0, 0.0), 20.0, diffuse, white)  # encloses camera
    b.add_sphere((5.0, 0.0, 2.0), 0.8, light, white)
    scene = b.build()
    assert scene.n_spheres >= tf.SHORTLIST_MIN_SPHERES
    cam = make_camera((0.0, 0.0, 0.5), 16, 16, np.pi / 2, np.pi / 2)
    _compare(scene, cam, RenderConfig(refmax=3))
    # and the culling actually rejects something for narrow blocks
    org, dirs = pixel_rays(cam)
    quant = tf.FUSE_SUB * tf.SP_LANE
    n_pad = -(-org.shape[0] // quant) * quant
    org_p = jnp.concatenate(
        [org, jnp.broadcast_to(org[-1], (n_pad - org.shape[0], 3))])
    dir_p = jnp.concatenate(
        [dirs, jnp.broadcast_to(dirs[-1], (n_pad - dirs.shape[0], 3))])
    ids, counts = tf._sphere_shortlists(
        org_p, dir_p, scene.sphere_center, scene.sphere_radius,
        n_pad // quant, scene.n_spheres)
    assert int(counts.min()) >= 1
    assert int(counts.max()) <= scene.n_spheres


def test_render_fused_backend_end_to_end():
    from raytracer_js_tpu import render_hdr
    from raytracer_js_tpu.config import HitBackend

    scene = config1_scene()
    cam = make_camera((0.0, 0.0, 0.5), 16, 16, np.pi / 2, np.pi / 2)
    img_b = np.asarray(render_hdr(scene, cam, config1_cfg()))
    # FUSED render_hdr routes to the frame kernel (in-kernel raygen +
    # unit-|d| sphere quadratic): equal to ULP noise, not bitwise
    img_f = np.asarray(render_hdr(scene, cam,
                                  config1_cfg(backend=HitBackend.FUSED)))
    np.testing.assert_allclose(img_f, img_b, rtol=1e-4, atol=1e-5)
    # transmission is in-class since r2: the glass scene runs the fused
    # kernel (ULP-level agreement), it no longer falls back to brute
    glass = config1_scene(with_glass=True)
    img_g = np.asarray(render_hdr(glass, cam,
                                  config1_cfg(backend=HitBackend.FUSED)))
    img_gb = np.asarray(render_hdr(glass, cam, config1_cfg()))
    np.testing.assert_allclose(img_g, img_gb, rtol=1e-4, atol=1e-5)
    # an image-textured scene DOES fall back (out of fused class)
    bi = SceneBuilder()
    bi.set_sky(bi.add_image_texture(np.full((4, 4, 3), 0.4, np.float32)))
    d = bi.add_material(ResponseType.REFLECTION)
    bi.add_sphere((4, 0, 0.5), 1.0, d, bi.add_solid_texture((.9, .2, .1)))
    imgsc = bi.build()
    img_i = np.asarray(render_hdr(imgsc, cam,
                                  config1_cfg(backend=HitBackend.FUSED)))
    img_ib = np.asarray(render_hdr(imgsc, cam, config1_cfg()))
    np.testing.assert_array_equal(img_i, img_ib)


def test_frame_fused_nonsquare_offgrid():
    """Frame kernel (in-kernel raygen) on a non-square image whose pixel
    count is not a multiple of the ray-tile quantum: the in-kernel
    (x, y) <- index decode must match pixel_rays exactly."""
    from raytracer_js_tpu import render_hdr
    from raytracer_js_tpu.config import HitBackend
    from raytracer_js_tpu.kernels import trace_fused as tf

    scene = config1_scene()
    assert tf.supports_frame(scene)
    cam = make_camera((0.2, -0.3, 0.5), 40, 24, np.pi / 2, np.pi / 3,
                      rot_h=0.3, rot_v=-0.2)
    img_b = np.asarray(render_hdr(scene, cam, config1_cfg()))
    img_f = np.asarray(render_hdr(scene, cam,
                                  config1_cfg(backend=HitBackend.FUSED)))
    assert img_f.shape == (24, 40, 3)
    np.testing.assert_allclose(img_f, img_b, rtol=1e-4, atol=1e-5)


def test_frame_fused_mirror_bounces():
    """Mirror continuation through the frame kernel: reflected directions
    stay unit, so the unit-|d| specialization must hold at bounce >= 1."""
    from raytracer_js_tpu import RenderConfig, render_hdr
    from raytracer_js_tpu.config import HitBackend

    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.2, 0.3, 0.4)))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((3.0, 0.0, 0.0), (0.5, 8.0, 8.0), mirror, white)
    b.add_box((-3.0, 0.0, 0.0), (0.5, 8.0, 8.0), mirror, white)
    b.add_sphere((0.0, 0.0, -5.5), 1.0, light, white)
    scene = b.build()
    cam = make_camera((0.0, 0.0, 0.0), 16, 16, np.pi / 2, np.pi / 2)
    cfg = RenderConfig(refmax=4)
    img_b = np.asarray(render_hdr(scene, cam, cfg))
    img_f = np.asarray(render_hdr(
        scene, cam, RenderConfig(refmax=4, backend=HitBackend.FUSED)))
    np.testing.assert_allclose(img_f, img_b, rtol=1e-4, atol=1e-5)


def test_frame_fused_tile_shortlist_parity(monkeypatch):
    """Per-tile analytic cone shortlists must be exact culling: a scene of
    spheres scattered across/behind/around the camera renders identically
    (to ULP noise) with and without the shortlist path."""
    import raytracer_js_tpu.kernels.trace_fused as tf
    from raytracer_js_tpu import render_hdr
    from raytracer_js_tpu.config import HitBackend

    monkeypatch.setattr(tf, "FRAME_SHORT_MIN", 4)
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.2, 0.3, 0.4)))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    rng = np.random.default_rng(11)
    for i in range(14):
        c = rng.uniform([-6.0, -6.0, -6.0], [8.0, 6.0, 6.0])
        tex = b.add_solid_texture(rng.uniform(0.2, 1.0, 3))
        b.add_sphere(c, float(rng.uniform(0.2, 1.0)),
                     (diffuse, mirror)[i % 2], tex)
    b.add_sphere((0.0, 0.0, 0.0), 18.0, diffuse, white)  # encloses camera
    b.add_sphere((5.0, 0.0, 2.0), 0.8, light, white)
    scene = b.build()
    # 36x24: partial tiles on both axes, 2 bounces — the shortlist
    # exactness property is size-independent
    cam = make_camera((0.0, 0.0, 0.5), 36, 24, np.pi / 2, np.pi / 2,
                      rot_h=0.4)
    cfg = RenderConfig(refmax=2, backend=HitBackend.FUSED)
    img_s = np.asarray(render_hdr(scene, cam, cfg))
    monkeypatch.setenv("RT_NO_FRAME_SHORT", "1")
    img_full = np.asarray(render_hdr(scene, cam, cfg))
    np.testing.assert_array_equal(img_s, img_full)
    # brute stays the semantic reference (same refmax: the r5 shape trim
    # left one pixel needing a 3rd bounce, which a refmax-mismatched
    # comparison counts as a spurious EXHAUST-vs-color diff)
    img_b = np.asarray(render_hdr(
        scene, cam, RenderConfig(refmax=2, backend=HitBackend.BRUTE)))
    np.testing.assert_allclose(img_s, img_b, rtol=1e-4, atol=1e-5)
    # and the shortlist actually culls for off-axis tiles
    tab = np.asarray(tf._tile_shortlists(
        cam, -(-cam.h // tf.FUSE_SUB), -(-cam.w // tf.SP_LANE),
        scene.sphere_center, scene.sphere_radius))
    assert tab[:, 0].min() >= 1
    assert tab[:, 0].min() < scene.n_spheres
