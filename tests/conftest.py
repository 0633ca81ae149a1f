"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference engine (Dark565/raytracer.js) is single-threaded browser JS with
no device concept; all multi-chip behavior in this framework is new capability.
Tests validate sharding semantics on fake CPU devices
(``xla_force_host_platform_device_count``), the mechanism BASELINE.md prescribes
for multi-host-without-a-cluster testing. Real-chip perf is measured by bench.py.
"""
import os

# Must be set before jax initializes a backend. Force-override: the dev
# environment exports JAX_PLATFORMS=axon (the real-TPU tunnel) and running
# the whole suite over tunnel RPCs is both slow and hardware-flaky; unit
# correctness is CPU-checked, real-chip perf belongs to bench.py.
os.environ["JAX_PLATFORMS"] = "cpu"
import sys

if "jax" in sys.modules:
    # A pytest plugin (jaxtyping) imports jax before conftest runs, freezing
    # the env-derived config default; update it explicitly instead.
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
