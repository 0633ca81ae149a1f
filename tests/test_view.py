"""View-layer tests: exposure accumulation, tone mapping, screen quantize.

Property styles mirror the reference's camera/exposure semantics
(SURVEY.md §2 #28-32); the quirky 1/(1+k) progressive weight is asserted
exactly (exposure_buffer.ts:53-60).
"""
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_js_tpu.config import ToneMapConfig, ToneMapperKind
from raytracer_js_tpu.models.camera import make_camera, pixel_rays, rotate_h, rotate_v
from raytracer_js_tpu.view import exposure as ex
from raytracer_js_tpu.view import screen
from raytracer_js_tpu.view.tonemap import dynamic_range, tonemap


def test_accumulate_reference_weights():
    """Frame k (1-based) enters with weight 1/(1+k) — the reference's
    post-increment running mean, NOT the textbook 1/k."""
    buf = ex.new_exposure_buffer(2, 2)
    f1 = jnp.ones((2, 2, 3))
    buf = ex.accumulate(buf, f1)
    np.testing.assert_allclose(np.asarray(buf.pixels), 0.5)  # 1 * 1/2
    f2 = jnp.zeros((2, 2, 3))
    buf = ex.accumulate(buf, f2)
    # w = 1/3: 0 * 1/3 + 0.5 * 2/3
    np.testing.assert_allclose(np.asarray(buf.pixels), 1.0 / 3.0)
    assert int(buf.frame_count) == 2


def test_accumulate_max_frames_freezes():
    buf = ex.new_exposure_buffer(1, 1, max_frames=1)
    buf = ex.accumulate(buf, jnp.ones((1, 1, 3)))
    frozen = ex.accumulate(buf, jnp.zeros((1, 1, 3)))
    np.testing.assert_array_equal(np.asarray(frozen.pixels),
                                  np.asarray(buf.pixels))
    assert int(frozen.frame_count) == 1


def test_reset():
    buf = ex.accumulate(ex.new_exposure_buffer(1, 1), jnp.ones((1, 1, 3)))
    buf = ex.reset(buf)
    assert int(buf.frame_count) == 0
    np.testing.assert_array_equal(np.asarray(buf.pixels), 0.0)


def test_luma_stats_bt601():
    px = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
                      [[0.0, 0.0, 1.0], [1.0, 1.0, 1.0]]])
    buf = ex.ExposureBuffer(pixels=px, frame_count=jnp.ones((), jnp.int32))
    y = np.asarray(ex.luma(px))
    np.testing.assert_allclose(y, [[0.299, 0.587], [0.114, 1.0]], atol=1e-6)
    mean = float(ex.luma_mean(buf))
    np.testing.assert_allclose(mean, y.mean(), rtol=1e-6)
    np.testing.assert_allclose(float(ex.luma_variance(buf, mean)),
                               y.var(), rtol=1e-5)
    np.testing.assert_allclose(float(ex.luma_absdev(buf, mean)),
                               np.abs(y - y.mean()).mean(), rtol=1e-5)


def test_tonemap_identity_window():
    buf = ex.accumulate(ex.new_exposure_buffer(2, 2),
                        jnp.full((2, 2, 3), 2.0))
    lo, hi = dynamic_range(buf, ToneMapConfig(kind=ToneMapperKind.IDENTITY))
    assert float(lo) == 0.0 and float(hi) == 1.0
    img = np.asarray(tonemap(buf, ToneMapConfig(kind=ToneMapperKind.IDENTITY)))
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_tonemap_stddev_window_floor():
    """hi = min(mean+dev, max); lo floored at min_dynamic re-derives hi
    (tone_mapping.ts:48-63)."""
    buf = ex.accumulate(ex.new_exposure_buffer(2, 2),
                        jnp.full((2, 2, 3), 1e-6))
    cfg = ToneMapConfig(kind=ToneMapperKind.STDDEV_AROUND_MEAN,
                        dynamic_range=4, min_dynamic=1e-3)
    lo, hi = dynamic_range(buf, cfg)
    assert np.isclose(float(lo), 1e-3)
    assert np.isclose(float(hi), 1e-3 * 16)


def test_screen_quantize_and_roundtrip(tmp_path):
    img = np.linspace(0, 1, 12).reshape(2, 2, 3)
    u8 = screen.quantize_u8(img)
    assert u8.dtype == np.uint8 and u8.max() == 255 and u8.min() == 0
    p = screen.write_png(tmp_path / "t.png", img)
    assert p.exists()
    p2 = screen.write_npy(tmp_path / "t2", img)
    np.testing.assert_allclose(np.load(p2), img.astype(np.float32))


def test_rgba_draw_overlay_and_roundtrip(tmp_path):
    """draw_rgba: opaque base alpha (screen_canvas.ts:45-56), overlay blend
    per color.ts:59-65, RGBA PNG/npy roundtrip."""
    from raytracer_js_tpu.view.view import draw_rgba

    buf = ex.accumulate(ex.new_exposure_buffer(2, 2),
                        jnp.full((2, 2, 3), 0.5))
    cfg = ToneMapConfig(kind=ToneMapperKind.IDENTITY)
    base = np.asarray(draw_rgba(buf, cfg))
    assert base.shape == (2, 2, 4)
    np.testing.assert_allclose(base[..., 3], 1.0)   # alpha = 0xff analogue
    # 50%-alpha red HUD layer over the grey frame
    hud = np.zeros((2, 2, 4), np.float32)
    hud[..., 0] = 1.0
    hud[..., 3] = 0.5
    out = np.asarray(draw_rgba(buf, cfg, overlays=(hud,)))
    np.testing.assert_allclose(out[..., 0], 0.5 * 1.0 + 0.5 * 0.25,
                               atol=1e-6)
    np.testing.assert_allclose(out[..., 1], 0.5 * 0.25, atol=1e-6)
    np.testing.assert_allclose(out[..., 3], 1.0)    # clamp(1 + 0.5)
    p = screen.write_png(tmp_path / "rgba.png", out)
    assert p.exists()
    if p.suffix == ".png":
        from PIL import Image

        back = np.asarray(Image.open(p))
        assert back.shape == (2, 2, 4) and (back[..., 3] == 255).all()


def test_camera_direction_norm_invariant():
    """Every pixel direction is unit length after arbitrary rotations —
    the reference camera property test (test/view-camera.test.ts:17-49)."""
    cam = make_camera((0, 0, 0), 33, 17, np.pi, np.pi / 3)
    cam = rotate_h(cam, 0.7)
    cam = rotate_v(cam, -0.4)
    _, dirs = pixel_rays(cam)
    n = np.linalg.norm(np.asarray(dirs), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)


def test_camera_rotations_preserve_orthonormal_triad():
    cam = make_camera((0, 0, 0), 8, 8, np.pi / 2, np.pi / 2)
    cam = rotate_v(rotate_h(cam, 1.1), 0.6)
    f, l, u = (np.asarray(x) for x in (cam.front, cam.left, cam.up))
    for v in (f, l, u):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=1e-6)
    np.testing.assert_allclose([f @ l, f @ u, l @ u], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.cross(f, l), u, atol=1e-6)


def test_progressive_render_converges_against_single_frame():
    """progressive_render over k frames of a deterministic scene equals the
    single frame (weights sum to k/(k+1)... the running mean of identical
    frames converges to the frame)."""
    from raytracer_js_tpu import RenderConfig
    from raytracer_js_tpu.view.view import progressive_render
    from scenes import config1_camera, config1_cfg, config1_scene

    scene = config1_scene()
    cam = config1_camera(8, 8)
    out = progressive_render(scene, cam, config1_cfg(),
                             ToneMapConfig(kind=ToneMapperKind.IDENTITY),
                             frames=3)
    from raytracer_js_tpu import render_hdr

    single = np.clip(np.asarray(render_hdr(scene, cam, config1_cfg())), 0, 1)
    # after 3 identical frames the buffer holds 3/4 of the frame
    np.testing.assert_allclose(np.asarray(out), single * 0.75, atol=1e-6)


def test_live_session_logic():
    """PlayerInterface analogue (raytracer_js_tpu.live): keys move/rotate
    the camera, any motion resets the exposure accumulation
    (main.ts:285/:325), 't' cycles the tone mapper, 'q' quits; the ANSI
    half-block canvas encodes two pixels per cell."""
    import jax

    from raytracer_js_tpu import RenderConfig
    from raytracer_js_tpu.live import (LiveState, ansi_frame, apply_key,
                                       tick)
    from raytracer_js_tpu.render import render_hdr
    from scenes import config1_cfg, config1_scene

    cam = make_camera((0, 0, 0.5), 8, 8, np.pi / 2, np.pi / 2)
    st = LiveState(camera=cam, buf=ex.new_exposure_buffer(8, 8))
    scene = config1_scene()
    cfg = config1_cfg()
    fn = jax.jit(lambda s, c, k: render_hdr(s, c, cfg, key=k))
    st = tick(st, scene, cfg, fn, jax.random.key(0))
    assert int(st.buf.frame_count) == 1
    st2 = apply_key(st, "w")
    assert st2.moved and int(st2.buf.frame_count) == 0     # exposure reset
    np.testing.assert_allclose(np.asarray(st2.camera.pos[0]),
                               np.asarray(st.camera.pos[0]) + 0.1,
                               atol=1e-6)
    st3 = apply_key(st2, "LEFT")
    assert not np.allclose(np.asarray(st3.camera.front),
                           np.asarray(st2.camera.front))
    st3 = apply_key(st3, "r")                              # reset angles
    np.testing.assert_allclose(np.asarray(st3.camera.front), [1, 0, 0],
                               atol=1e-6)
    st4 = apply_key(st3, "t")
    assert st4.mapper == 1 and not st4.moved
    assert apply_key(st4, "q").quit
    # ANSI canvas: 8x8 px -> 4 rows of 8 half-block cells
    img = np.zeros((8, 8, 3), np.float32)
    img[0, 0] = 1.0
    s = ansi_frame(img)
    assert s.count("▀") == 32 and "38;2;255;255;255" in s
