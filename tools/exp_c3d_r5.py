"""r5: config-3 image-cost split by hybrid scenes (512^2, refmax=3).

frame_img        - the real config-3 scene (image checker + image sky)
frame_skyonly    - image sky, all prim textures solid
frame_checkonly  - image checker, solid sky
frame_flagonly   - ALL content solid but has_images forced True (the
                   structural cost of the image code path: want_uv kernel
                   variant, wider sort state, in-_bounce sample glue)
frame_solid      - everything solid (baseline)
Run: python tools/exp_c3d_r5.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import _materialize, _time_sustained, build_config3_scene

OUT = []


def rec(name, ms):
    OUT.append({"name": name, "ms": ms * 1e3})
    print(json.dumps(OUT[-1]), flush=True)


def main():
    from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
    from raytracer_js_tpu.config import HitBackend, TextureKind
    from raytracer_js_tpu.render_tiled import frame_tables

    w, h = 512, 512
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    scene = build_config3_scene()
    tex = scene.textures
    kind_np = np.asarray(tex.kind)
    sky_tex = int(scene.sky_tex)

    def variant(name, kind_mask_solid, has_images):
        """kind_mask_solid: bool [K] — force these textures to SOLID."""
        kind = np.where(kind_mask_solid, int(TextureKind.SOLID), kind_np)
        t2 = tex.replace(kind=jnp.asarray(kind.astype(kind_np.dtype)),
                         has_images=has_images)
        sc = scene.replace(textures=t2)
        cfg = RenderConfig(refmax=3, backend=HitBackend.TILED)
        tab, cnts, c_max, grid = frame_tables(sc, cam)
        fn = jax.jit(lambda s: render_hdr(s, cam, cfg,
                                          tables=(tab, cnts, c_max, grid)))
        img = fn(sc)
        assert np.isfinite(np.asarray(img)).all()
        dt, _ = _time_sustained(fn, sc, burst=16)
        rec(name, dt)

    k = kind_np.shape[0]
    none = np.zeros(k, bool)
    allm = np.ones(k, bool)
    sky_only = np.ones(k, bool)
    sky_only[sky_tex] = False
    check_only = np.zeros(k, bool)
    check_only[sky_tex] = True

    variant("frame_img", none, True)
    variant("frame_skyonly", sky_only, True)
    variant("frame_checkonly", check_only, True)
    variant("frame_flagonly", allm, True)
    variant("frame_solid", allm, False)

    with open("/root/repo/tools/bench_results_r5/exp_c3d.jsonl", "w") as fo:
        for r in OUT:
            fo.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
