"""r5: config-3 image-glue component timings at 512^2 (262k rays).

sample_prim   - tex_mod.sample over 262k rays (the per-bounce winner call)
sky_sample    - ops/trace.sky_color over 262k dirs (per-bounce miss glue)
atlas_take    - raw advanced-index gather (the old path)
atlas_mxu     - the two-level MXU gather alone
Run: python tools/exp_c3b_r5.py
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
    from raytracer_js_tpu.models import textures as tex_mod
    from raytracer_js_tpu.ops.trace import sky_color

    scene = build_config3_scene()
    n = 512 * 512
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.uniform(0, 0.999, n).astype(np.float32))
    v = jnp.asarray(rng.uniform(0, 0.999, n).astype(np.float32))
    tid = jnp.asarray(rng.integers(0, scene.textures.kind.shape[0],
                                   n).astype(np.int32))
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))

    f = jax.jit(lambda sc, tid, u, v: tex_mod.sample(sc.textures, tid, u, v))
    _materialize(f(scene, tid, u, v))
    dt, _ = _time_sustained(lambda s: f(s, tid, u, v), scene, burst=32)
    rec("sample_prim", dt)

    f2 = jax.jit(lambda sc, d: sky_color(sc, d))
    _materialize(f2(scene, dirs))
    dt, _ = _time_sustained(lambda s: f2(s, dirs), scene, burst=32)
    rec("sky_sample", dt)

    atlas = scene.textures.atlas
    i, h, w, _ = atlas.shape
    row = jnp.asarray(rng.integers(0, h, n).astype(np.int32))
    col = jnp.asarray(rng.integers(0, w, n).astype(np.int32))
    irow = jnp.asarray(rng.integers(0, i, n).astype(np.int32))

    f3 = jax.jit(lambda a: a[irow, row, col])
    _materialize(f3(atlas))
    dt, _ = _time_sustained(f3, atlas, burst=32)
    rec("atlas_take", dt)

    f4 = jax.jit(lambda a: tex_mod._atlas_gather(a, irow, row, col))
    _materialize(f4(atlas))
    dt, _ = _time_sustained(f4, atlas, burst=32)
    rec("atlas_mxu", dt)

    with open("/root/repo/tools/bench_results_r5/exp_c3b.jsonl", "w") as fo:
        for r in OUT:
            fo.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
