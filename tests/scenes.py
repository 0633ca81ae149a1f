"""Shared deterministic test scenes (roughness == 0 so the scalar oracle
applies). Mirrors BASELINE.md config 1: spheres + ground, 64x64-class."""
from __future__ import annotations

import numpy as np

from raytracer_js_tpu import RenderConfig, ResponseType, SceneBuilder, make_camera


def config1_scene(with_glass: bool = False, with_tri: bool = False):
    """3 spheres + ground box + emissive sphere, flat deterministic materials."""
    b = SceneBuilder()
    sky = b.add_solid_texture((0.35, 0.45, 0.65))
    b.set_sky(sky)
    red = b.add_solid_texture((0.9, 0.2, 0.15))
    green = b.add_solid_texture((0.2, 0.8, 0.3))
    grey = b.add_solid_texture((0.6, 0.6, 0.6))
    white = b.add_solid_texture((1.0, 1.0, 1.0))

    diffuse = b.add_material(ResponseType.REFLECTION, mirror=False)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    glass_mat = b.add_material(ResponseType.TRANSMISSION)
    glass_sub = b.add_substance(1.5)

    # ground: large box below origin
    b.add_box((0.0, 0.0, -51.0), 100.0, diffuse, grey)
    b.add_sphere((4.0, 0.0, 0.3), 0.9, diffuse, red)
    b.add_sphere((4.5, 1.8, 0.2), 0.8, mirror, white)
    b.add_sphere((3.5, -1.7, 0.1), 0.7, diffuse, green)
    b.add_sphere((5.0, 0.5, 2.6), 0.8, light, white)
    if with_glass:
        b.add_sphere((2.6, 0.7, 0.4), 0.5, glass_mat, white, glass_sub)
    if with_tri:
        b.add_triangle((3.0, -0.8, -0.4), (3.6, 0.4, 1.3), (4.2, -1.6, 1.0),
                       diffuse, green)
    return b.build()


def config1_camera(w: int = 32, h: int = 32):
    return make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2)


def config1_cfg(**kw):
    return RenderConfig(**{"refmax": 3, "spp": 1, **kw})
