"""r5: decompose the TPU-only TILED drive divergence (maxerr 0.45).

The nearest-hit kernel now matches brute on chip (probe_tpu), yet the
full 600-sphere TILED render still diverges from the oracle by 0.45 on
TPU only. Localize:

  stage A: frame_bounce0 winner pids vs XLA brute on the primaries
  stage B: render_hdr BRUTE backend vs oracle (XLA path sanity)
  stage C: render_hdr TILED vs BRUTE on chip + diff geometry
Run: python tools/exp_r5_probe2.py
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

import raytracer_js_tpu as rt
from raytracer_js_tpu.config import HitBackend
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.ops.trace import nearest_hit_brute
from tools.exp_r5_probe import build

OUT = []


def rec(**kw):
    OUT.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import raytracer_js_tpu.kernels.trace_tiled as tt
    from raytracer_js_tpu.render_tiled import frame_tables

    scene = build(0)
    w = h = 128
    cam = rt.make_camera((0, 0, 0.5), w, h, np.pi / 2, np.pi / 2)
    org, dirs = pixel_rays(cam)

    # stage A: bounce-0 frame-kernel winners vs brute
    tab, cnts, c_max, grid = frame_tables(scene, cam)
    st = tt.frame_bounce0(scene, cam, tab, cnts, c_max)
    pid_k = np.asarray(st["pid"]).reshape(-1)[: w * h]
    t_b, p_b = map(np.asarray, nearest_hit_brute(scene, org, dirs))
    mism = pid_k != p_b
    rec(stage="A_bounce0", pid_mismatch=int(mism.sum()),
        first=int(np.argmax(mism)) if mism.any() else -1,
        k=int(pid_k[np.argmax(mism)]) if mism.any() else 0,
        b=int(p_b[np.argmax(mism)]) if mism.any() else 0)

    # stage B: XLA BRUTE render vs oracle
    cfg = rt.RenderConfig(refmax=2, backend=HitBackend.BRUTE)
    hdr_b = np.asarray(rt.render_hdr(scene, cam, cfg))
    from raytracer_js_tpu.oracle import scalar
    ref = np.asarray(scalar.render(scene, cam, rt.RenderConfig(refmax=2)))
    rec(stage="B_brute_vs_oracle", maxerr=float(np.abs(hdr_b - ref).max()),
        npix=int((np.abs(hdr_b - ref).max(-1) > 1e-4).sum()))

    # stage C: TILED vs BRUTE on chip
    cfg_t = rt.RenderConfig(refmax=2, backend=HitBackend.TILED)
    hdr_t = np.asarray(rt.render_hdr(scene, cam, cfg_t))
    d = np.abs(hdr_t - hdr_b).max(-1)
    bad = np.argwhere(d > 1e-4)
    rec(stage="C_tiled_vs_brute", maxerr=float(d.max()),
        npix=int((d > 1e-4).sum()),
        first=bad[0].tolist() if len(bad) else None,
        tiled_rgb=hdr_t[tuple(bad[0])].tolist() if len(bad) else None,
        brute_rgb=hdr_b[tuple(bad[0])].tolist() if len(bad) else None)

    with open("/root/repo/tools/bench_results_r5/exp_probe2.jsonl", "w") as f:
        for r in OUT:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
