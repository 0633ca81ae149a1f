"""r4 backward follow-up: where do the replay fwd 5 ms / vg 12-14 ms go?

One TPU job, many small jits (replay graphs compile in seconds):

* fwd ablations — monkeypatch sky / texture sampling / surface recompute to
  constants to localize the forward cost;
* vg levers — per-bounce jax.checkpoint (RT_REPLAY_CKPT plain/dots, no flat
  packing) and the 3-way bf16-split gather (RT_GATHER_SPLIT=1), alone and
  combined.

Findings feed CLAUDE.md's perf ledger; winning flags get promoted to
defaults.
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/.axon_site")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene, _time_sustained
from raytracer_js_tpu import RenderConfig, make_camera
from raytracer_js_tpu.config import HitBackend
from raytracer_js_tpu.models.camera import pixel_rays
from raytracer_js_tpu.ops import trace as trace_m
from raytracer_js_tpu.ops.trace import record_paths, trace_rays
from raytracer_js_tpu.parallel.sharding import float_partition


def main():
    w, h = 1920, 1088
    scene = build_scene(50)
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    org, dirs = pixel_rays(cam)
    n = org.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    params, rebuild = float_partition(scene)
    cfg = RenderConfig(refmax=2, backend=HitBackend.PALLAS)
    rec = jax.jit(lambda p: record_paths(rebuild(p), cfg, org, dirs,
                                         key, rid))(params)
    target = jnp.zeros((n, 3), jnp.float32)

    def loss(p):
        sc = rebuild(p)
        st = trace_rays(sc, cfg, org, dirs, key, rid, pid_seq=rec)
        return jnp.sum((st.color - target) ** 2) / n

    def measure(tag, fwd=True, vg=True):
        row = {"tag": tag}
        try:
            if fwd:
                f = jax.jit(lambda p: loss(p))
                dt, _ = _time_sustained(f, params, burst=8, repeats=3)
                row.update(fwd_ms=dt * 1e3, fwd_rps=n / dt)
            if vg:
                g = jax.jit(jax.value_and_grad(lambda p: loss(p)))
                dt, _ = _time_sustained(g, params, burst=8, repeats=3)
                row.update(vg_ms=dt * 1e3, vg_rps=n / dt)
        except Exception as e:
            row["error"] = repr(e)[:200]
        print(json.dumps(row), flush=True)

    # --- baseline --------------------------------------------------------
    measure("baseline")

    # --- vg levers -------------------------------------------------------
    for split in ("", "1"):
        for ck in ("", "plain", "dots"):
            if not split and not ck:
                continue
            os.environ["RT_GATHER_SPLIT"] = split
            os.environ["RT_REPLAY_CKPT"] = ck
            measure(f"split={split or 0} ckpt={ck or 'off'}",
                    fwd=(ck == ""), vg=True)
    os.environ["RT_GATHER_SPLIT"] = ""
    os.environ["RT_REPLAY_CKPT"] = ""

    # --- fwd ablations (semantics-breaking; fwd cost localization) -------
    orig_sky = trace_m.sky_color
    orig_sample = trace_m.tex_mod.sample
    orig_surface = trace_m.surface_at

    def fake_sky(scene, dir):
        return jnp.full_like(dir, 0.4)

    def fake_sample(tex, tex_id, u, v):
        return jnp.stack([u, v, u * 0 + 0.5], -1)

    def fake_surface(scene, org, dir, pid):
        z = jnp.zeros(org.shape[0], org.dtype)
        return org + dir, -dir, z, z, z + 1.0

    trace_m.sky_color = fake_sky
    measure("ablate:sky", vg=False)
    trace_m.tex_mod.sample = fake_sample
    measure("ablate:sky+tex", vg=False)
    trace_m.surface_at = fake_surface
    measure("ablate:sky+tex+surface", vg=True)
    trace_m.sky_color = orig_sky
    trace_m.tex_mod.sample = orig_sample
    measure("ablate:surface_only", vg=True)
    trace_m.surface_at = orig_surface


if __name__ == "__main__":
    main()
