"""Fused-kernel tuning sweep — sustained (pipelined) timing on real hardware.

The fused trace kernel has two load-bearing knobs, both env vars read at
import time (so each point runs in a subprocess):

* ``RT_FUSE_SUB``      — ray-tile sublanes (rays per program = SUB*128)
* ``RT_SHORTLIST_MIN`` / ``RT_SHORT_CAP`` — bounce-0 frustum-shortlist gate

Usage:  python tools/tune_fused.py [--subs 32,64,128] [--refmax 2]
Prints one JSON line per point. Measured v5e history (1080p, 50 spheres,
2 bounces, sustained): SUB 256 -> 5.52 ms, 64 -> 3.85 ms, 32 -> 3.69 ms;
shortlist on (50 spheres) loses ~0.6 ms to its per-frame cone build.
"""
import argparse
import json
import os
import subprocess
import sys

RUNNER = r"""
import os, json
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                if "__file__" in dir() else ".")
from bench import build_scene, _time_sustained
from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
from raytracer_js_tpu.config import HitBackend
refmax = int(os.environ.get("TUNE_REFMAX", "2"))
w, h = 1920, 1088
scene = build_scene(int(os.environ.get("TUNE_SPHERES", "50")))
cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
cfg = RenderConfig(refmax=refmax, backend=HitBackend.FUSED)
fn = jax.jit(lambda s: render_hdr(s, cam, cfg))
img = jax.block_until_ready(fn(scene))
assert np.isfinite(np.asarray(img)).all()
dt, _ = _time_sustained(fn, scene, burst=16)
print(json.dumps({"fuse_sub": os.environ.get("RT_FUSE_SUB", "default"),
                  "shortlist_min": os.environ.get("RT_SHORTLIST_MIN", "default"),
                  "refmax": refmax, "ms": dt * 1e3,
                  "mrays_s": w * h / dt / 1e6}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subs", default="32,64,128")
    ap.add_argument("--refmax", type=int, default=2)
    ap.add_argument("--spheres", type=int, default=50)
    ap.add_argument("--with-shortlist", action="store_true")
    args = ap.parse_args()
    for sub in args.subs.split(","):
        env = dict(os.environ, RT_FUSE_SUB=sub.strip(),
                   TUNE_REFMAX=str(args.refmax),
                   TUNE_SPHERES=str(args.spheres))
        if args.with_shortlist:
            env["RT_SHORTLIST_MIN"] = "1"
        r = subprocess.run([sys.executable, "-c", RUNNER], env=env,
                           capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        out = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(out[-1] if out else
              f"FAIL sub={sub}: {r.stderr.strip().splitlines()[-1][:300] if r.stderr.strip() else 'no output'}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
