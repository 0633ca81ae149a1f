"""Multi-chip parallelism.

The reference is single-threaded browser JS with zero parallelism
(SURVEY.md §2 "Parallelism & distributed-communication components"); every
capability here is new, mandated by BASELINE.json: ray/tile data parallelism
over a device mesh, replicated scene, psum gradient all-reduce.
"""
from .sharding import (
    float_partition,
    make_mesh,
    render_hdr_sharded,
    sharded_fit_step,
)

__all__ = [
    "float_partition",
    "make_mesh",
    "render_hdr_sharded",
    "sharded_fit_step",
]
