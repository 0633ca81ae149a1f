"""Space predicates, RGBA color ops, DR-limited tone mapper, camera lock."""
import jax.numpy as jnp
import numpy as np

from raytracer_js_tpu.config import ToneMapConfig, ToneMapperKind
from raytracer_js_tpu.models.camera import make_camera, rotate_v
from raytracer_js_tpu.ops.color import (
    clamp_color,
    color,
    luma,
    mul_color,
    overlay_color,
    scale_color,
)
from raytracer_js_tpu.ops.space import (
    RangeCoverage,
    aabb_in_space,
    aabb_overlap_volume,
    get_overlap_space,
    point_in_space,
    space_in_space,
)


def test_point_in_space_coverage_modes():
    """Open/closed endpoint conventions (space.ts:55-82): the hi face is
    excluded in CLOSE_OPEN, the lo face in OPEN_CLOSE, both kept in FULL."""
    pos = jnp.zeros(3)
    size = jnp.ones(3)
    on_lo = jnp.zeros(3)
    on_hi = jnp.ones(3)
    assert bool(point_in_space(on_lo, pos, size, RangeCoverage.CLOSE_OPEN))
    assert not bool(point_in_space(on_hi, pos, size, RangeCoverage.CLOSE_OPEN))
    assert not bool(point_in_space(on_lo, pos, size, RangeCoverage.OPEN_CLOSE))
    assert bool(point_in_space(on_hi, pos, size, RangeCoverage.OPEN_CLOSE))
    assert bool(point_in_space(on_lo, pos, size, RangeCoverage.FULL))
    assert bool(point_in_space(on_hi, pos, size, RangeCoverage.FULL))


def test_point_in_space_randomized():
    """Randomized property test (style of test/octree-space.test.ts:6-34)."""
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(-2, 2, (200, 3)))
    inside = np.asarray(point_in_space(pts, jnp.zeros(3), jnp.ones(3)))
    expect = np.all((np.asarray(pts) >= 0) & (np.asarray(pts) < 1), axis=1)
    np.testing.assert_array_equal(inside, expect)


def test_containment_and_overlap():
    assert bool(space_in_space(jnp.full(3, 0.25), jnp.full(3, 0.5),
                               jnp.zeros(3), jnp.ones(3)))
    assert not bool(space_in_space(jnp.full(3, 0.75), jnp.full(3, 0.5),
                                   jnp.zeros(3), jnp.ones(3)))
    assert bool(aabb_in_space(jnp.zeros(3), 1.0, jnp.zeros(3), jnp.ones(3)))
    lo, size, ok = get_overlap_space(jnp.zeros(3), jnp.ones(3),
                                     jnp.full(3, 0.5), jnp.ones(3))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(lo), 0.5)
    np.testing.assert_allclose(np.asarray(size), 0.5)
    vol = aabb_overlap_volume(jnp.zeros(3), jnp.ones(3),
                              jnp.full(3, 0.5), jnp.ones(3))
    np.testing.assert_allclose(float(vol), 0.125)
    vol0 = aabb_overlap_volume(jnp.zeros(3), jnp.ones(3),
                               jnp.full(3, 2.0), jnp.ones(3))
    assert float(vol0) == 0.0


def test_color_ops():
    a = color(0.5, 0.25, 1.0, 0.5)
    b = color(1.0, 1.0, 0.5, 1.0)
    np.testing.assert_allclose(np.asarray(mul_color(a, b)),
                               [0.5, 0.25, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(scale_color(b, 0.5)),
                               [0.5, 0.5, 0.25, 1.0])
    np.testing.assert_allclose(np.asarray(scale_color(b, 0.5,
                                                      scale_alpha=True)),
                               [0.5, 0.5, 0.25, 0.5])
    np.testing.assert_allclose(np.asarray(clamp_color(color(2.0, -1.0, 0.5))),
                               [1.0, 0.0, 0.5, 1.0])
    # overlay: 50% red over solid blue -> half red half blue, alpha 1
    out = overlay_color(color(1.0, 0.0, 0.0, 0.5), color(0.0, 0.0, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), [0.5, 0.0, 0.5, 1.0])
    np.testing.assert_allclose(float(luma(color(1.0, 1.0, 1.0))), 1.0,
                               rtol=1e-6)


def test_dr_limited_tonemapper():
    """Statistics-free fixed window (tone_mapping.ts:35-46)."""
    from raytracer_js_tpu.view import exposure as ex
    from raytracer_js_tpu.view.tonemap import dynamic_range

    buf = ex.accumulate(ex.new_exposure_buffer(2, 2), jnp.ones((2, 2, 3)))
    cfg = ToneMapConfig(kind=ToneMapperKind.DR_LIMITED, dynamic_range=4,
                        min_dynamic=1e-2)
    lo, hi = dynamic_range(buf, cfg)
    assert np.isclose(float(lo), 1e-2) and np.isclose(float(hi), 0.16)


def test_camera_vertical_lock():
    """Locked pitch rejects rotations past vertical (camera.ts:134-145)."""
    cam = make_camera((0, 0, 0), 8, 8, np.pi / 2, np.pi / 2)
    up_ok = rotate_v(cam, 0.8, lock=True)
    assert float(up_ok.up[2]) > 0
    # a rotation past straight-up flips up.z negative -> rejected
    before = rotate_v(cam, 1.5, lock=True)
    blocked = rotate_v(before, 0.5, lock=True)
    np.testing.assert_array_equal(np.asarray(blocked.front),
                                  np.asarray(before.front))
    unlocked = rotate_v(before, 0.5, lock=False)
    assert float(unlocked.up[2]) < 0
