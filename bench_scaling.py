"""Scaling-efficiency report (BASELINE.md metric 3: >= 85% at 2 hosts).

This workload's scaling is decided by its *communication*, not by load
balance: rays are independent, the scene is replicated, and the only
collective anywhere is the gradient all-reduce of the inverse-rendering
step (parallel/sharding.py). So the report has three parts:

1. **Collective census** (measured, from the compiled sharded HLO): bytes
   of all-reduce / all-gather / permute per step, for the forward frame and
   for the fit step. Forward must be ZERO (communication-free by
   construction); fit is one psum of the float parameter pytree.
2. **Modeled multi-host efficiency** from the census: with per-step compute
   time t_c (measured on the real chip — pass ``--chip-ms``, defaults to
   the recorded r2 ledger numbers) and gradient bytes B over DCN bandwidth
   ``--dcn-gbps``, a ring all-reduce moves 2B(N-1)/N bytes per host, so
   eff(N) = t_c / (t_c + t_comm) with t_comm = 2*B*(N-1)/N / bw. This is
   the standard cost model (scaling-book recipe); forward eff is exactly
   1.0 at any N because its census is zero bytes.
3. **CPU virtual-mesh walltimes** (correctness + overhead sanity only):
   this host has ~2 cores, so an 8-virtual-device mesh CANNOT show
   wall-clock speedup — these times are machine-bound and labeled so.
   The real sharding-correctness gate is the mesh-size-invariance test
   suite (tests/test_sharding.py: bitwise-equal images for any mesh).

On real multi-host slices (one process per host, JAX_COORDINATOR set),
the same script measures efficiency directly instead of modeling it.

Prints ONE JSON line: {"metric": "scaling_efficiency", ...}.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")

_SHAPE_BYTES = {"f32": 4, "f64": 8, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def collective_census(compiled_text: str) -> dict:
    """Count collective ops + payload bytes in a compiled HLO dump."""
    ops = {}
    total_bytes = 0
    for line in compiled_text.splitlines():
        s = line.strip()
        m = re.match(r"[%\w.\-]*\s*=\s*([a-z0-9()\[\],{}/ ]+?)\s+"
                     r"(all-reduce|all-gather|reduce-scatter|"
                     r"collective-permute|all-to-all)", s)
        if not m:
            continue
        op = m.group(2)
        ops[op] = ops.get(op, 0) + 1
        # shapes like f32[100000,3] possibly tuple (f32[..], f32[..])
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            if dt not in _SHAPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total_bytes += n * _SHAPE_BYTES[dt]
    return {"ops": ops, "bytes": total_bytes}


def modeled_efficiency(t_compute_s: float, grad_bytes: int, n_hosts: int,
                       dcn_gbps: float) -> float:
    """Ring all-reduce cost model: eff = t_c / (t_c + t_comm)."""
    if grad_bytes == 0 or n_hosts <= 1:
        return 1.0
    t_comm = 2.0 * grad_bytes * (n_hosts - 1) / n_hosts / (dcn_gbps * 1e9)
    return t_compute_s / (t_compute_s + t_comm)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spheres", type=int, default=50)
    ap.add_argument("--refmax", type=int, default=2)
    ap.add_argument("--cpu-mesh", type=int, default=0,
                    help="force a virtual CPU mesh of this many devices")
    ap.add_argument("--chip-ms", type=float, default=None,
                    help="measured per-step compute ms on the real chip "
                         "(default: measure here if on TPU, else the r2 "
                         "ledger fit-step time)")
    ap.add_argument("--dcn-gbps", type=float, default=25.0,
                    help="assumed DCN bandwidth per host, GB/s (conservative)")
    ap.add_argument("--hosts", type=int, default=2,
                    help="host count for the modeled efficiency")
    args = ap.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu_mesh:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from bench import build_scene
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.parallel import make_mesh, render_hdr_sharded
    from raytracer_js_tpu.parallel.distributed import (init_distributed,
                                                       topology_summary)
    from raytracer_js_tpu.parallel.sharding import (RAY_AXIS, float_partition,
                                                    sharded_fit_step)

    init_distributed()
    topo = topology_summary()
    scene = build_scene(args.spheres)
    cfg = RenderConfig(refmax=args.refmax)
    n_dev = len(jax.devices())
    on_tpu = jax.devices()[0].platform == "tpu"
    cam = make_camera((0.0, 0.0, 0.5), args.size, args.size,
                      np.pi / 2, np.pi / 2)
    key = jax.random.key(0)

    # ---- 1. collective census from the compiled sharded programs ---------
    mesh = make_mesh(jax.devices())
    fwd = jax.jit(lambda s: render_hdr_sharded(mesh, s, cam, cfg))
    fwd_hlo = fwd.lower(scene).compile().as_text()
    fwd_census = collective_census(fwd_hlo)

    target = jnp.zeros((args.size * args.size, 3), jnp.float32)
    fit = jax.jit(lambda s: sharded_fit_step(mesh, s, cfg, cam, target, key))
    fit_hlo = fit.lower(scene).compile().as_text()
    fit_census = collective_census(fit_hlo)

    params, _ = float_partition(scene)
    grad_bytes = int(sum(np.asarray(p).nbytes for p in params))

    # ---- 2. walltimes (strong-scaling table; machine-bound on CPU) -------
    results = {}
    for nd in sorted({1, 2, n_dev} & set(range(1, n_dev + 1))):
        m = make_mesh(jax.devices()[:nd])
        fn = jax.jit(lambda s: render_hdr_sharded(m, s, cam, cfg))
        jax.block_until_ready(fn(scene))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(scene))
            ts.append(time.perf_counter() - t0)
        results[nd] = args.size * args.size / min(ts)

    base = results.get(1)
    walltime_eff = {str(nd): (r / (base * nd) if base else None)
                    for nd, r in results.items()}

    # ---- 3. modeled multi-host efficiency from the census ----------------
    if args.chip_ms is not None:
        t_c = args.chip_ms * 1e-3
        t_c_src = "--chip-ms"
    elif on_tpu:
        jax.block_until_ready(fit(scene))
        t0 = time.perf_counter()
        jax.block_until_ready(fit(scene))
        t_c = time.perf_counter() - t0
        t_c_src = "measured_here"
    else:
        # r2 ledger: config-5 fit step 19.2 s at 192x112x8 views / 1M prims;
        # headline forward 0.55 ms. Use the *fit* number — the only step
        # with communication — scaled to this bench's ray count.
        t_c = 19.2 * (args.size * args.size) / (192 * 112 * 8)
        t_c_src = "r2_ledger_config5_scaled"
    fwd_eff = {str(n): modeled_efficiency(
        t_c, 0, n, args.dcn_gbps) for n in (2, 4, args.hosts)}
    fit_eff = {str(n): modeled_efficiency(
        t_c, grad_bytes, n, args.dcn_gbps) for n in (2, 4, args.hosts)}

    measured_multihost = topo.get("process_count", 1) > 1
    value = (walltime_eff.get(str(n_dev)) if measured_multihost
             else fit_eff[str(args.hosts)])

    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": value,
        "unit": "fraction_of_linear",
        "vs_baseline": (value or 0) / 0.85,
        "detail": {
            "mode": ("measured_multihost" if measured_multihost
                     else "census+model"),
            "collectives": {"forward": fwd_census, "fit_step": fit_census},
            "grad_bytes": grad_bytes,
            "model": {"t_compute_s": t_c, "t_compute_source": t_c_src,
                      "dcn_gbps": args.dcn_gbps,
                      "fwd_eff": fwd_eff, "fit_eff": fit_eff},
            "walltimes_rays_per_s": results,
            "walltime_eff": walltime_eff,
            "walltime_note": (
                f"virtual {n_dev}-device mesh on "
                f"{os.cpu_count()} physical cores — machine-bound, not a "
                "sharding property" if not on_tpu else "on-chip"),
            "topology": topo, "size": args.size,
        },
    }))


if __name__ == "__main__":
    main()
