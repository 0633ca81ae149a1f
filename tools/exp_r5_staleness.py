"""Config-5 amortization evidence: replay_every staleness-vs-loss curve.

A geometry + color inverse-rendering fit (sphere centers/radii + texture
colors, the config-5 class) run at replay_every in {1, 8, 32, 64}:
replay_every=1 is exactly the search gradient every step; larger values
reuse the recorded winner structure while geometry moves between
recordings. The curve shows how much final loss the staleness costs —
the justification for amortizing config 5's recording over 32 steps.

CPU-runnable (small frames); writes tools/bench_results_r5/staleness.json.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from raytracer_js_tpu import RenderConfig, ResponseType, SceneBuilder, make_camera
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.optim import FitConfig, fit
from raytracer_js_tpu.render import render_rays


def scene_with(offsets, radii_scale=1.0, color=(0.7, 0.3, 0.2)):
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.25, 0.3, 0.4)))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    grey = b.add_solid_texture((0.55, 0.55, 0.55))
    tex = b.add_solid_texture(color)
    b.add_box((0.0, 0.0, -21.0), 40.0, diffuse, grey)
    rng = np.random.default_rng(5)
    base = rng.uniform([3.0, -2.5, -0.5], [7.0, 2.5, 2.5], (6, 3))
    for i in range(6):
        b.add_sphere(base[i] + offsets[i], float(0.6 * radii_scale),
                     mirror if i % 3 == 0 else diffuse, tex)
    b.add_sphere((5.0, 0.0, 5.0), 1.0, light,
                 b.add_solid_texture((1.0, 1.0, 1.0)))
    return b.build()


def main():
    cfg = RenderConfig(refmax=2)
    cams = [make_camera((0.0, 0.0, 0.5), 48, 48, np.pi / 2, np.pi / 2)]
    key = jax.random.key(3)
    true_scene = scene_with(np.zeros((6, 3)))
    org, dirs = pixel_rays(cams[0])
    rid = jnp.arange(org.shape[0], dtype=jnp.int32)
    targets = jnp.stack([render_rays(true_scene, cfg, org, dirs, key, rid)])

    steps = 64
    out = {"steps": steps, "curve": []}
    start_off = np.zeros((6, 3))
    start_off[:, 1] = 0.35          # displaced geometry to recover
    for every in [1, 8, 32, 64]:
        start = scene_with(start_off, color=(0.4, 0.4, 0.4))
        res = fit(start, cfg, cams, targets,
                  FitConfig(steps=steps, lr=2e-2, replay_every=every),
                  key=key)
        out["curve"].append({
            "replay_every": every,
            "final_loss": float(res.losses[-1]),
            "loss_at": {str(s): float(res.losses[s])
                        for s in (0, 15, 31, 63)},
        })
        print(json.dumps(out["curve"][-1]), flush=True)
    os.makedirs("/root/repo/tools/bench_results_r5", exist_ok=True)
    with open("/root/repo/tools/bench_results_r5/staleness.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
