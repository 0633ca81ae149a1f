"""MXU-friendly row gathers.

XLA lowers ``table[idx]`` per-ray gathers on TPU to slow scatter/gather
sequences; for the small tables this framework gathers from (primitive
params, material columns, solid-texture colors — tens to thousands of rows)
the fast TPU idiom is a one-hot matmul: ``one_hot(idx) @ table`` rides the
MXU as a dense [N, K] x [K, C] contraction. Above ``ONE_HOT_MAX_ROWS`` the
[N, K] one-hot would dominate HBM traffic, so we fall back to jnp.take.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

#: one-hot gather cutoff: [N, K] f32 at N=2M, K=1024 is 8 GB *logical* but
#: XLA fuses the iota==idx compare into the matmul operand, so the real cost
#: is the MXU pass ~ N*K*C MACs; past ~1k rows jnp.take wins again.
ONE_HOT_MAX_ROWS = 1024

#: ...except under autodiff, where the one-hot operand is SAVED as a VJP
#: residual — measured r3: a value_and_grad at 2.09M rays over 1002-row
#: prim tables compiled to 23.75 GB of HBM (8.4 GB per saved [N, K]
#: one-hot) and OOM'd the chip. Cap the LOGICAL one-hot size too: at 2M
#: rays that keeps K <= ~128 (material/texture tables ride the MXU,
#: thousand-row prim tables fall back to take/scatter).
ONE_HOT_MAX_ELEMS = 1 << 28

#: integer/bool columns roundtrip through the f32 matmul; f32 represents
#: integers exactly only below 2^24, so larger stored values would silently
#: corrupt. Checked statically for concrete tables in _check_int_exact.
INT_EXACT_MAX = 1 << 24


def _check_int_exact(t: Array) -> None:
    """Static guard for the int-through-f32 one-hot roundtrip.

    Raises if a *concrete* integer/bool table stores values the f32 matmul
    cannot represent exactly (|v| >= 2^24). Traced tables can't be value-
    checked; every integer table in this framework stores indices into
    scene-sized tables (< 2^24 by construction), and this assert catches a
    concrete violation at trace time before it silently corrupts.
    """
    if not (jnp.issubdtype(t.dtype, jnp.integer) or t.dtype == jnp.bool_):
        return
    if isinstance(t, jax.core.Tracer) or t.dtype == jnp.bool_:
        return
    import numpy as np

    v = np.asarray(t)
    if v.size and (np.abs(v).max() >= INT_EXACT_MAX):
        raise ValueError(
            f"gather one-hot roundtrip: int table holds values >= 2^24 "
            f"(max {np.abs(v).max()}); f32 matmul would corrupt them")


def gather_rows(table: Array, idx: Array) -> Array:
    """``table[idx]`` for a [K, C...] table and [N] int idx -> [N, C...].

    One-hot matmul for small K (MXU), jnp.take otherwise.
    """
    import math

    k = table.shape[0]
    if k == 0:
        raise ValueError("empty table")
    n = math.prod(idx.shape) if idx.shape else 1
    if k > ONE_HOT_MAX_ROWS or n * k > ONE_HOT_MAX_ELEMS or table.ndim > 2:
        return jnp.take(table, idx, axis=0)
    tab2 = table[:, None] if table.ndim == 1 else table
    oh = jax.nn.one_hot(idx, k, dtype=tab2.dtype)          # [N, K]
    # HIGHEST: default TPU matmul precision rounds the table operand to
    # bf16 (0.6 -> 0.6015625), silently corrupting float columns; the
    # 3-pass f32 split reproduces one-hot selection exactly
    out = jnp.matmul(oh, tab2, precision=jax.lax.Precision.HIGHEST)
    return out[..., 0] if table.ndim == 1 else out


def gather_cols(idx: Array, *tables: Array) -> tuple:
    """Gather the same [N] idx from several [K]/[K,C] tables, sharing the
    one-hot operand so XLA computes it once."""
    import math

    if not tables:
        return ()
    k = tables[0].shape[0]
    n = math.prod(idx.shape) if idx.shape else 1
    if k > ONE_HOT_MAX_ROWS or n * k > ONE_HOT_MAX_ELEMS:
        return tuple(jnp.take(t, idx, axis=0) for t in tables)
    # concatenate as columns -> single matmul -> split
    cols = []
    widths = []
    for t in tables:
        _check_int_exact(t)
        t2 = t[:, None] if t.ndim == 1 else t
        cols.append(t2.astype(jnp.float32))
        widths.append(t2.shape[1])
    cat = jnp.concatenate(cols, axis=1)                    # [K, sum]
    oh = jax.nn.one_hot(idx, k, dtype=jnp.float32)
    # HIGHEST: see gather_rows — exact f32 selection on the MXU
    out = jnp.matmul(oh, cat, precision=jax.lax.Precision.HIGHEST)
    res = []
    off = 0
    for t, w in zip(tables, widths):
        piece = out[:, off:off + w]
        off += w
        if t.ndim == 1:
            piece = piece[:, 0]
        if jnp.issubdtype(t.dtype, jnp.integer) or t.dtype == jnp.bool_:
            piece = jnp.round(piece).astype(t.dtype)
        else:
            piece = piece.astype(t.dtype)
        res.append(piece)
    return tuple(res)
