"""r5: ONE jitted sweep rescue round at the config-3 shape, image-flag
vs solid — pins the ~23 ms/round structural gap exp_c3d exposed
(frame_flagonly == frame_img >> frame_solid with identical rounds).

b0_{img,solid}     - frame_bounce0 kernel alone
round_{img,solid}  - one _rescue_round on the bounce-0 population
Run: python tools/exp_c3e_r5.py
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
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.config import HitBackend, RayStatus, TextureKind
    import raytracer_js_tpu.kernels.trace_tiled as tt
    import raytracer_js_tpu.render_tiled as rtl
    from raytracer_js_tpu.render_tiled import frame_tables

    w = h = 512
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    scene = build_config3_scene()
    tex = scene.textures
    allm = jnp.full_like(tex.kind, int(TextureKind.SOLID))
    cfg = RenderConfig(refmax=3, backend=HitBackend.TILED)
    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")

    for tag, t2 in (("img", tex.replace(has_images=True)),
                    ("solid", tex.replace(kind=allm, has_images=False))):
        sc = scene.replace(textures=t2)
        tab, cnts, c_max, grid = frame_tables(sc, cam)

        b0 = jax.jit(lambda s: tt.frame_bounce0(s, cam, tab, cnts, c_max))
        st = b0(sc)
        _materialize(st["cr"])
        dt, _ = _time_sustained(lambda s: b0(s)["cr"], sc, burst=16)
        rec(f"b0_{tag}", dt)

        rows = st["cr"].size // tt.LANE
        cols = [st[k].reshape(rows, tt.LANE) for k in names]
        bounce = jnp.where(
            st["status"].reshape(-1) == int(RayStatus.ALIVE), 1, 0)
        refr = jnp.ones((rows * tt.LANE,), jnp.float32)
        sweep_tab = rtl._sweep_perm(sc)
        seed = jnp.zeros((), jnp.uint32)
        rid = jnp.arange(rows * tt.LANE, dtype=jnp.int32)

        def round_fn(s, cols, bounce, refr):
            out_cols, b2, r2, _ = rtl._rescue_round(
                s, cfg, cols, bounce, refr, seed, rid,
                cap=min(rows * tt.LANE, rtl.SWEEP_SLICE),
                sweep_tab=sweep_tab)
            return out_cols[6]

        rf = jax.jit(round_fn)
        _materialize(rf(sc, cols, bounce, refr))
        dt, _ = _time_sustained(lambda a: rf(*a), (sc, cols, bounce, refr),
                                burst=16)
        rec(f"round_{tag}", dt)

    with open("/root/repo/tools/bench_results_r5/exp_c3e.jsonl", "w") as fo:
        for r in OUT:
            fo.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
