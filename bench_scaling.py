"""Scaling-efficiency report: render throughput at 1, 2, ..., N devices.

BASELINE.md metric 3: >= 85% scaling efficiency to 2 hosts. On real multi-
host slices run one process per host with JAX_COORDINATOR/NPROC/PROC_ID set
(parallel/distributed.init_distributed); this same harness then reports
per-host scaling. On a single chip (the only hardware this round) it
measures virtual-mesh overheads on CPU — the sharding-correctness mechanism
— and prints the report skeleton the multi-host run fills in.

Prints ONE JSON line: {"metric": "scaling_efficiency", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spheres", type=int, default=50)
    ap.add_argument("--refmax", type=int, default=2)
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force a virtual CPU mesh of this many devices")
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu_mesh}").strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    from bench import build_scene
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.parallel import make_mesh, render_hdr_sharded
    from raytracer_js_tpu.parallel.distributed import init_distributed, topology_summary

    init_distributed()
    topo = topology_summary()
    scene = build_scene(args.spheres)
    cfg = RenderConfig(refmax=args.refmax)
    n_dev = len(jax.devices())

    results = {}
    sizes = sorted({1, 2, n_dev} & set(range(1, n_dev + 1)))
    for nd in sizes:
        if len(jax.devices()) < nd:
            continue
        cam = make_camera((0.0, 0.0, 0.5), args.size, args.size,
                          np.pi / 2, np.pi / 2)
        mesh = make_mesh(jax.devices()[:nd])
        fn = jax.jit(lambda s: render_hdr_sharded(mesh, s, cam, cfg))
        jax.block_until_ready(fn(scene))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(scene))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        results[nd] = args.size * args.size / dt

    base = results.get(1)
    eff = {str(nd): (r / (base * nd) if base else None)
           for nd, r in results.items()}
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": eff.get(str(n_dev)),
        "unit": "fraction_of_linear",
        "vs_baseline": (eff.get("2") or 0) / 0.85 if base else None,
        "detail": {"rays_per_s": results, "efficiency": eff,
                   "topology": topo, "size": args.size},
    }))


if __name__ == "__main__":
    main()
