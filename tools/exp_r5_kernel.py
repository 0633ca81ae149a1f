"""r5: replay-kernel launch breakdown at the headline shape.

fwd_kernel   - jit(replay_colors) alone (one fwd launch)
vg_kernel    - value_and_grad over the L2 loss (fwd launch + bwd launch)
bwd_only     - vg - fwd (derived)
Run: python tools/exp_r5_kernel.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import _materialize, _time_sustained, build_scene


def main():
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.config import HitBackend
    from raytracer_js_tpu.kernels import replay_grad
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.ops.trace import record_paths
    from raytracer_js_tpu.parallel.sharding import float_partition

    w, h = 1920, 1088
    n = w * h
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    org, dirs = pixel_rays(cam)
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    cfg = RenderConfig(refmax=2, backend=HitBackend.PALLAS, unroll=True)
    out = []

    for n_sph, tag in [(50, "50"), (1000, "1k")]:
        scene = build_scene(n_sph)
        params, rebuild = float_partition(scene)
        rec = jax.jit(lambda p: record_paths(
            rebuild(p), cfg, org, dirs, key, rid))(params)
        _materialize(rec)
        lists = replay_grad.build_tile_lists(np.asarray(rec),
                                              scene.n_spheres)
        print(json.dumps({"name": f"lists{tag}",
                          "l_pad": int(lists.shape[1] - 1),
                          "l_mean": float(lists[:, 0].mean()),
                          "l_max": int(lists[:, 0].max())}), flush=True)

        def fwd(p):
            return replay_grad.replay_colors(rebuild(p), cfg, org, dirs,
                                             rec, tile_lists=lists)

        f_fwd = jax.jit(fwd)
        dt, _ = _time_sustained(f_fwd, params, burst=8)
        out.append({"name": f"fwd_kernel{tag}", "ms": dt * 1e3})
        print(json.dumps(out[-1]), flush=True)

        def loss(p):
            c = fwd(p)
            return jnp.sum(c ** 2) / n

        f_vg = jax.jit(jax.value_and_grad(loss))
        dt, _ = _time_sustained(f_vg, params, burst=8)
        out.append({"name": f"vg_kernel{tag}", "ms": dt * 1e3})
        print(json.dumps(out[-1]), flush=True)

    with open("/root/repo/tools/bench_results_r5/exp_kernel.jsonl", "w") as f:
        for row in out:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
