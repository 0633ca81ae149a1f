"""Scene/ray validation tests (the reference's runtime-throw analogues)."""
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_js_tpu import ResponseType, SceneBuilder
from raytracer_js_tpu.utils.validate import (
    SceneValidationError,
    assert_rays_sane,
    validate_scene,
)

from scenes import config1_scene


def test_valid_scene_passes():
    assert validate_scene(config1_scene(with_glass=True, with_tri=True)) == []


def test_bad_material_id_caught():
    scene = config1_scene()
    bad = scene.replace(prim_material=scene.prim_material + 99)
    with pytest.raises(SceneValidationError, match="material id"):
        validate_scene(bad)


def test_negative_radius_caught():
    scene = config1_scene()
    bad = scene.replace(sphere_radius=scene.sphere_radius * -1.0)
    with pytest.raises(SceneValidationError, match="radius"):
        validate_scene(bad)


def test_nonfinite_geometry_caught():
    scene = config1_scene()
    c = np.asarray(scene.sphere_center).copy()
    c[0, 0] = np.nan
    bad = scene.replace(sphere_center=jnp.asarray(c))
    with pytest.raises(SceneValidationError, match="sphere_center"):
        validate_scene(bad)


def test_non_strict_collects():
    scene = config1_scene()
    bad = scene.replace(sphere_radius=scene.sphere_radius * -1.0,
                        prim_texture=scene.prim_texture + 99)
    problems = validate_scene(bad, strict=False)
    assert len(problems) == 2


def test_ray_sanity():
    org = jnp.zeros((4, 3))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1))
    assert_rays_sane(org, d)
    with pytest.raises(SceneValidationError, match="not unit"):
        assert_rays_sane(org, d * 3.0)
    with pytest.raises(SceneValidationError, match="non-finite"):
        assert_rays_sane(org.at[0, 0].set(jnp.nan), d)
