"""Golden-image tests: every TPU path must be allclose to the scalar oracle.

The reference has no golden tests (SURVEY.md §4); BASELINE.md mandates
pixel allclose(1e-4) vs the scalar reference path."""
import numpy as np
import pytest

from raytracer_js_tpu import render_hdr
from raytracer_js_tpu.oracle import scalar as oracle

from scenes import config1_camera, config1_cfg, config1_scene


@pytest.mark.parametrize("with_glass,with_tri", [
    (False, False), (True, False), (False, True), (True, True)])
def test_render_matches_oracle(with_glass, with_tri):
    scene = config1_scene(with_glass=with_glass, with_tri=with_tri)
    cam = config1_camera(32, 32)
    cfg = config1_cfg()
    img = np.asarray(render_hdr(scene, cam, cfg))
    ref = oracle.render(scene, cam, cfg)
    np.testing.assert_allclose(img, ref, rtol=0, atol=1e-4)


def test_render_refmax_exhaust_and_light():
    """Two parallel mirrors: rays bouncing past refmax must go black; the
    emissive sphere path must carry ISL attenuation (raytracer.ts:256-275)."""
    from raytracer_js_tpu import ResponseType, SceneBuilder, make_camera

    b = SceneBuilder()
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((3.0, 0.0, 0.0), (0.5, 8.0, 8.0), mirror, white)
    b.add_box((-3.0, 0.0, 0.0), (0.5, 8.0, 8.0), mirror, white)
    # On the exactly-representable path: pixel (x=8, y=0) fires at
    # th_v = -pi/4, hits the +x wall at (2.75, 0, -2.75), reflects to
    # (-1, 0, -1)/sqrt(2), and passes through (0, 0, -5.5).
    b.add_sphere((0.0, 0.0, -5.5), 1.0, light, white)
    scene = b.build()
    cam = make_camera((0.0, 0.0, 0.0), 16, 16, np.pi / 2, np.pi / 2)
    cfg = config1_cfg(refmax=4)
    img = np.asarray(render_hdr(scene, cam, cfg))
    ref = oracle.render(scene, cam, cfg)
    np.testing.assert_allclose(img, ref, rtol=0, atol=1e-4)
    assert (img == 0).all(axis=-1).any(), "expected exhausted (black) pixels"
    assert img.max() > 0, "expected attenuated light pixels"
