"""Candidate-broadcast mechanisms on the REAL hit-search workload.

Times the sphere-quadratic + running-min scan (not algebraically
collapsible) per candidate for:
  S: scalar VMEM reads + splat (current trace_tiled)
  E: per-chunk [CHUNK, A] vector load + static extract + splat
  R: rays-on-sublanes [512, 128] chunks, candidates on lanes, MXU
     contraction (kernels/nearest_hit layout) from an [A, C] table
Run: python tools/exp_mech.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _materialize, _rtt

SUB, LANE, A = 32, 128, 8
TILES = 64
C = 1024
CHUNK = 16

rng = np.random.default_rng(0)
tabs = rng.uniform(-1.0, 1.0, (TILES, C, A)).astype(np.float32)
tabs[:, :, 3] = rng.uniform(0.5, 2.0, (TILES, C))   # ccmr-ish
dirs = rng.normal(size=(TILES, SUB * LANE, 3)).astype(np.float32)
dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)


def ref_result():
    # per tile: min over candidates of the first-forward sphere param
    out = np.full((TILES, SUB * LANE), np.inf, np.float32)
    for t in range(TILES):
        d = dirs[t].astype(np.float64)
        for j in range(C):
            cx, cy, cz, ccmr = tabs[t, j, :4].astype(np.float64)
            b = -(d[:, 0] * cx + d[:, 1] * cy + d[:, 2] * cz)
            disc = b * b - (ccmr - 0.25)
            sq = np.sqrt(np.maximum(disc, 0.0))
            tt = np.where(-b - sq >= 0, -b - sq, sq - b)
            ok = (disc >= 0) & (tt >= 0)
            out[t] = np.where(ok & (tt < out[t]), tt, out[t])
    return out


def sphere_t_scalar(tab, j, dx, dy, dz):
    cx = tab[j, 0]
    cy = tab[j, 1]
    cz = tab[j, 2]
    ccmr = tab[j, 3]
    b = -(dx * cx + dy * cy + dz * cz)
    disc = b * b - (ccmr - 0.25)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(-b - sq >= 0.0, -b - sq, sq - b)
    return t, (disc >= 0.0) & (t >= 0.0)


def kern_s(tab_ref, dx_ref, dy_ref, dz_ref, out_ref):
    dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]

    def body(j, best):
        t, ok = sphere_t_scalar(tab_ref, j, dx, dy, dz)
        return jnp.where(ok & (t < best), t, best)

    out_ref[:, :] = jax.lax.fori_loop(
        0, C, body, jnp.full(dx.shape, jnp.inf, jnp.float32))


def kern_e(tab_ref, dx_ref, dy_ref, dz_ref, out_ref):
    dx, dy, dz = dx_ref[:, :], dy_ref[:, :], dz_ref[:, :]

    def chunk(ci, best):
        blk = tab_ref[pl.ds(ci * CHUNK, CHUNK), :]      # [CHUNK, A] vector
        for k in range(CHUNK):
            cx = jnp.broadcast_to(blk[k, 0], dx.shape)
            cy = jnp.broadcast_to(blk[k, 1], dx.shape)
            cz = jnp.broadcast_to(blk[k, 2], dx.shape)
            ccmr = jnp.broadcast_to(blk[k, 3], dx.shape)
            b = -(dx * cx + dy * cy + dz * cz)
            disc = b * b - (ccmr - 0.25)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t = jnp.where(-b - sq >= 0.0, -b - sq, sq - b)
            ok = (disc >= 0.0) & (t >= 0.0)
            best = jnp.where(ok & (t < best), t, best)
        return best

    out_ref[:, :] = jax.lax.fori_loop(
        0, C // CHUNK, chunk, jnp.full(dx.shape, jnp.inf, jnp.float32))


def kern_r(tabT_ref, d3_ref, out_ref):
    # rays on sublanes [512, 3]; candidates on lanes, 128 per chunk
    d3 = d3_ref[:, 0:3]                                  # [512, 3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 1)

    def chunk(ci, best):
        sl = pl.ds(ci * 128, 128)
        cT = tabT_ref[0:3, sl]                           # [3, 128]
        ccmr = tabT_ref[3:4, sl]                         # [1, 128]
        b = -jnp.dot(d3, cT, preferred_element_type=jnp.float32)
        disc = b * b - (ccmr - 0.25)
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t = jnp.where(-b - sq >= 0.0, -b - sq, sq - b)
        ok = (disc >= 0.0) & (t >= 0.0)
        t = jnp.where(ok, t, jnp.inf)
        return jnp.minimum(best, jnp.min(t, axis=1, keepdims=True))

    out_ref[:, :] = jax.lax.fori_loop(
        0, C // 128, chunk, jnp.full((512, 1), jnp.inf, jnp.float32))


def run(name, fn, in_specs, out_spec, out_shape, args, per):
    try:
        f = jax.jit(lambda *a: pl.pallas_call(
            fn, grid=(TILES,), in_specs=in_specs, out_specs=out_spec,
            out_shape=out_shape)(*a))
        out = _materialize(f(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {str(e)[:200]}")
        return None
    rtt = _rtt()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(16)]
        _materialize(outs[-1])
        ts.append((time.perf_counter() - t0 - rtt) / 16)
    dt = min(ts)
    print(f"{name}: {dt * 1e3:.2f} ms "
          f"({dt / (TILES * C) * 1e9:.1f} ns/cand/tile, "
          f"{dt * 0.94e9 / (TILES * C):.0f} cyc)")
    return f


def main():
    want = ref_result()
    vm = pltpu.VMEM
    tile = pl.BlockSpec((SUB, LANE), lambda i: (i, 0), memory_space=vm)
    tab2 = jnp.asarray(tabs.reshape(TILES * C, A))
    dx = jnp.asarray(dirs[:, :, 0].reshape(TILES * SUB, LANE))
    dy = jnp.asarray(dirs[:, :, 1].reshape(TILES * SUB, LANE))
    dz = jnp.asarray(dirs[:, :, 2].reshape(TILES * SUB, LANE))
    f32 = jax.ShapeDtypeStruct((TILES * SUB, LANE), jnp.float32)
    tab_spec = pl.BlockSpec((C, A), lambda i: (i, 0), memory_space=vm)

    f = run("S scalar", kern_s, [tab_spec, tile, tile, tile], tile, f32,
            (tab2, dx, dy, dz), C)
    if f is not None:
        got = np.asarray(f(tab2, dx, dy, dz)).reshape(TILES, SUB * LANE)
        print("  S max err:", np.nanmax(np.abs(
            np.where(np.isfinite(got), got, 0)
            - np.where(np.isfinite(want), want, 0))))

    f = run("E extract", kern_e, [tab_spec, tile, tile, tile], tile, f32,
            (tab2, dx, dy, dz), C)
    if f is not None:
        got = np.asarray(f(tab2, dx, dy, dz)).reshape(TILES, SUB * LANE)
        print("  E max err:", np.nanmax(np.abs(
            np.where(np.isfinite(got), got, 0)
            - np.where(np.isfinite(want), want, 0))))

    # R layout: tabT [A, C] per tile; rays [512, 8->pad 128] with xyz cols
    tabT = jnp.asarray(tabs.transpose(0, 2, 1).reshape(TILES * A, C))
    d3 = np.zeros((TILES, 512, 128), np.float32)
    # rays 0..4095 -> (sublane r//8? ) simplest: first 512 rays only per tile
    d3[:, :, 0:3] = dirs[:, :512, :]
    d3 = jnp.asarray(d3.reshape(TILES * 512, 128))
    tabT_spec = pl.BlockSpec((A, C), lambda i: (i, 0), memory_space=vm)
    d3_spec = pl.BlockSpec((512, 128), lambda i: (i, 0), memory_space=vm)
    out_spec = pl.BlockSpec((512, 1), lambda i: (i, 0), memory_space=vm)
    fo32 = jax.ShapeDtypeStruct((TILES * 512, 1), jnp.float32)
    f = run("R rays-sublane (512/4096 rays!)", kern_r, [tabT_spec, d3_spec],
            out_spec, fo32, (tabT, d3), C)
    if f is not None:
        got = np.asarray(f(tabT, d3)).reshape(TILES, 512)
        print("  R max err:", np.nanmax(np.abs(
            np.where(np.isfinite(got), got, 0)
            - np.where(np.isfinite(want[:, :512]), want[:, :512], 0))))


if __name__ == "__main__":
    main()
