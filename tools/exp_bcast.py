"""Microexperiment: per-candidate scalar broadcast mechanisms on TPU.

A big-scene trace kernel needs, per candidate j (dynamic), its ~10 f32
attributes broadcast to a (SUB, 128) ray tile. The lane-replicated-row trick
(kernels/nearest_hit._row) costs 128x HBM at large candidate counts, so test
the cheap layouts:

  A. dense VMEM [C, 8] table; (1,1) dynamic slice + broadcast_to
  B. SMEM per-tile (8, W) blocks; scalar reads at computed (row, col)
  C. dense VMEM [C, 128] with attrs replicated 16x on lanes... (skip)
  D. control: lane-replicated VMEM rows via dynamic sublane read (known good)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_bcast.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 32, 128
C = 256          # candidates per tile
A = 8            # attrs per candidate
TILES = 4


def ref_result(tab_dense):
    # sum over candidates of (attr0 * attr1 + attr2) broadcast; per tile
    s = (tab_dense[:, :, 0] * tab_dense[:, :, 1] + tab_dense[:, :, 2]).sum(1)
    return np.broadcast_to(s[:, None, None], (TILES, SUB, LANE))


def run(name, fn, *args):
    try:
        out = jax.block_until_ready(jax.jit(fn)(*args))
        return name, np.asarray(out)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
        return name, None


# --- A: (1,1) dynamic slice from dense VMEM [C, A] ------------------------
def kern_a(tab_ref, out_ref):
    def body(j, acc):
        a0 = tab_ref[j, 0]
        a1 = tab_ref[j, 1]
        a2 = tab_ref[j, 2]
        return acc + (a0 * a1 + a2)

    s = jax.lax.fori_loop(0, C, body, jnp.zeros((SUB, LANE), jnp.float32))
    out_ref[:, :] = s


def call_a(tab):
    return pl.pallas_call(
        kern_a,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((1, C, A), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * SUB, LANE), jnp.float32),
    )(tab)


def kern_a2(tab_ref, out_ref):
    # 2-D per-tile block variant
    def body(j, acc):
        return acc + (tab_ref[j, 0] * tab_ref[j, 1] + tab_ref[j, 2])

    out_ref[:, :] = jax.lax.fori_loop(
        0, C, body, jnp.zeros((SUB, LANE), jnp.float32))


def call_a2(tab2d):
    return pl.pallas_call(
        kern_a2,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((C, A), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * SUB, LANE), jnp.float32),
    )(tab2d)


# --- B: SMEM (8, W) per-tile blocks ---------------------------------------
W = C * A // 8


def kern_b(tab_ref, out_ref):
    def body(j, acc):
        base = j * A
        def at(k):
            idx = base + k
            return tab_ref[idx % 8, idx // 8]
        return acc + (at(0) * at(1) + at(2))

    out_ref[:, :] = jax.lax.fori_loop(
        0, C, body, jnp.zeros((SUB, LANE), jnp.float32))


def call_b(tab_sm):
    return pl.pallas_call(
        kern_b,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((8, W), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * SUB, LANE), jnp.float32),
    )(tab_sm)


# --- D: control, lane-replicated rows + dynamic sublane read --------------
def kern_d(tab_ref, out_ref):
    def row(r):
        return tab_ref[pl.ds(r, 1), :]

    def body(j, acc):
        return acc + (row(j) * row(C + j) + row(2 * C + j))

    out_ref[:, :] = jax.lax.fori_loop(
        0, C, body, jnp.zeros((SUB, LANE), jnp.float32))


def call_d(tab_rep):
    return pl.pallas_call(
        kern_d,
        grid=(TILES,),
        in_specs=[pl.BlockSpec((A * C, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * SUB, LANE), jnp.float32),
    )(tab_rep)


def main():
    rng = np.random.default_rng(0)
    tab = rng.uniform(0.5, 1.5, (TILES, C, A)).astype(np.float32)
    want = ref_result(tab)

    # layouts
    tab3 = jnp.asarray(tab)                                  # [T, C, A]
    tab2 = jnp.asarray(tab.reshape(TILES * C, A))            # [T*C, A]
    flat = tab.reshape(TILES, C * A)
    tab_sm = jnp.asarray(
        flat.reshape(TILES, W, 8).transpose(0, 2, 1)         # idx%8, idx//8
            .reshape(TILES * 8, W))
    # attr-major replicated rows: rows [a*C + j] of tile t
    rep = tab.transpose(0, 2, 1).reshape(TILES * A * C, 1)
    tab_rep = jnp.asarray(np.broadcast_to(rep, (TILES * A * C, LANE)).copy())

    results = {}
    for name, fn, arg in [("A_slice3d", call_a, tab3),
                          ("A2_slice2d", call_a2, tab2),
                          ("B_smem8row", call_b, tab_sm),
                          ("D_replrows", call_d, tab_rep)]:
        n, out = run(name, fn, arg)
        if out is None:
            continue
        out = out.reshape(TILES, SUB, LANE)
        err = np.abs(out - want).max() / np.abs(want).max()
        # timing
        f = jax.jit(fn)
        jax.block_until_ready(f(arg))
        t0 = time.perf_counter()
        for _ in range(50):
            o = f(arg)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / 50
        print(f"{n}: ok rel_err={err:.2e} t={dt * 1e6:.0f}us")
        results[n] = dt
    print("done", {k: f"{v * 1e6:.0f}us" for k, v in results.items()})


if __name__ == "__main__":
    sys.exit(main())
