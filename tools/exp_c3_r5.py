"""r5 config-3 TILED frame decomposition.

frame_img    - the real config-3 frame (image textures + image sky)
frame_solid  - same geometry, solid textures/sky (glue cost = difference)
frame_r1     - refmax=1 variant (bounce-0-only cost)
Run: python tools/exp_c3_r5.py
"""
import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import _materialize, _time_sustained, build_config3_scene


def main():
    from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
    from raytracer_js_tpu.config import HitBackend, TextureKind
    from raytracer_js_tpu.render_tiled import frame_tables

    w, h = 512, 512
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    out = []

    def run(name, scene, refmax=3):
        cfg = RenderConfig(refmax=refmax, backend=HitBackend.TILED)
        tab, cnts, c_max, grid = frame_tables(scene, cam)
        fn = jax.jit(lambda s, tb, ct, gr: render_hdr(
            s, cam, cfg, tables=(tb, ct, c_max, gr)))
        fn = functools.partial(fn, tb=tab, ct=cnts, gr=grid)
        img = fn(scene)
        assert np.isfinite(np.asarray(img)).all()
        dt, _ = _time_sustained(fn, scene, burst=16)
        row = {"name": name, "ms": dt * 1e3,
               "rays_per_s": w * h * refmax / dt / refmax}
        out.append(row)
        print(json.dumps(row), flush=True)

    scene = build_config3_scene()
    run("frame_img", scene)
    run("frame_img_r1", scene, refmax=1)

    # solid-ified: identical geometry/materials, all textures solid
    tex = scene.textures
    solid = tex.replace(kind=jnp.zeros_like(tex.kind),
                        solid_rgb=jnp.full_like(tex.solid_rgb, 0.5),
                        has_images=False, has_bilinear=False)
    ssc = scene.replace(textures=solid)
    run("frame_solid", ssc)

    with open("/root/repo/tools/bench_results_r5/exp_c3.jsonl", "w") as f:
        for row in out:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
