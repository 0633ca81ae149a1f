"""Inverse-rendering fit loop (new capability; BASELINE.json config 5).

The reference engine is forward-only; differentiability is the point of this
re-design: pixel loss -> gradients on material colors, entity geometry and
camera pose (SURVEY.md §2 #13 "differentiable leaves"), optimized with optax.

Multi-view batching: config 5 renders an 8-view batch per step; views vmap
over cameras, and under a device mesh the (view, ray) space is sharded via
:mod:`raytracer_js_tpu.parallel.sharding` with psum-reduced gradients.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..config import RenderConfig
from ..models.camera import Camera, pixel_rays
from ..models.scene import Scene
from ..parallel.sharding import RAY_AXIS, float_partition, shard_map
from ..render import render_rays

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class FitConfig:
    steps: int = 100
    lr: float = 1e-2
    optimizer: str = "adam"   # "adam" | "sgd"
    #: checkpoint every N steps into ``ckpt_dir`` (0 = off); a fit restarted
    #: with the same ckpt_dir resumes from the newest snapshot.
    save_every: int = 0
    ckpt_dir: str | None = None
    #: path-replay gradients: re-record the discrete trace structure
    #: (ops/trace.record_paths) every N steps and differentiate the
    #: search-free REPLAY in between (0 = off). One recording costs one
    #: plain forward; every step in between skips the nearest-hit search
    #: entirely — the steady-state speedup for big-scene inverse rendering.
    #: Between recordings the winner sets are slightly stale as geometry
    #: moves (the usual amortized-replay approximation; gradients remain
    #: exact for the recorded structure). replay_every=1 is EXACTLY the
    #: search path's gradient at every step.
    replay_every: int = 0
    #: accel staleness policy for the OCTREE backend: rebuild the octree
    #: from the CURRENT geometry every N steps (0 = never; the accel then
    #: goes stale as leaves move — the nearest-hit search may pick a wrong
    #: primitive near moved geometry, though gradients stay well-defined
    #: through the analytic surface recompute). Rebuilds are host-side and
    #: shape-pinned (accel/octree.build_octree ``like=``) so jit caches
    #: survive. Measured pinned-rebuild cost at depth 8 (native scenekit
    #: CSR): ~2.4 s at 100k prims, ~8.3 s at 1M prims — dominated by the
    #: 16.7M-cell offsets pass, so amortize with accel_every >> 1.
    accel_every: int = 0


@dataclasses.dataclass
class FitResult:
    scene: Scene
    losses: list


def _make_opt(cfg: FitConfig):
    if cfg.optimizer == "adam":
        return optax.adam(cfg.lr)
    if cfg.optimizer == "sgd":
        return optax.sgd(cfg.lr)
    raise ValueError(cfg.optimizer)


def multiview_loss(scene: Scene, cfg: RenderConfig, cameras: Sequence[Camera],
                   targets: Array, key: Array, accel=None) -> Array:
    """Mean-squared pixel loss over a view batch.

    ``targets`` is [V, h*w, 3] (flattened per view). Views share the scene;
    each view's rays get distinct global ids so RNG stays sharding-stable.
    """
    total = jnp.zeros((), jnp.float32)
    n_pix = 0
    for v, cam in enumerate(cameras):
        org, dirs = pixel_rays(cam)
        rid = jnp.arange(org.shape[0], dtype=jnp.int32) + v * org.shape[0]
        colors = render_rays(scene, cfg, org, dirs, key, rid, accel=accel)
        total = total + jnp.sum((colors - targets[v]) ** 2)
        n_pix += org.shape[0]
    return total / n_pix


def fit(scene: Scene, cfg: RenderConfig, cameras: Sequence[Camera],
        targets: Array, fit_cfg: FitConfig = FitConfig(),
        key: Optional[Array] = None,
        trainable: Optional[Callable[[int, Array], bool]] = None,
        mesh=None, accel=None) -> FitResult:
    """Optimize the scene's float leaves to match ``targets``.

    ``trainable(i, leaf)`` masks which float leaves receive updates (by
    zeroing their gradients) — e.g. train texture colors only. With ``mesh``
    the per-step gradient runs ray-sharded with an implicit psum (see
    parallel/sharding.sharded_fit_step notes).

    ``accel`` (OCTREE backend) follows the ``FitConfig.accel_every``
    staleness policy: rebuilt host-side from the current geometry every N
    steps with shapes pinned to the initial build, so the step stays
    jit-cached across rebuilds.
    """
    if key is None:
        key = jax.random.key(0)
    params, rebuild = float_partition(scene)
    opt = _make_opt(fit_cfg)
    opt_state = opt.init(params)

    def loss_fn(params, key, accel):
        return multiview_loss(rebuild(params), cfg, cameras, targets, key,
                              accel=accel)

    from ..ops.trace import record_paths, trace_rays
    from ..render import start_substance

    view_rays = [pixel_rays(cam) for cam in cameras]

    def record_fn(params, key, accel):
        sc = rebuild(params)
        recs = []
        for v, (org, dirs) in enumerate(view_rays):
            rid = (jnp.arange(org.shape[0], dtype=jnp.int32)
                   + v * org.shape[0])
            refr0 = jnp.broadcast_to(start_substance(sc, org[0]),
                                     (org.shape[0],))
            recs.append(record_paths(sc, cfg, org, dirs, key, rid,
                                     start_refr=refr0, accel=accel))
        return recs

    def loss_replay(params, key, recs):
        sc = rebuild(params)
        total = jnp.zeros((), jnp.float32)
        n_pix = 0
        for v, (org, dirs) in enumerate(view_rays):
            rid = (jnp.arange(org.shape[0], dtype=jnp.int32)
                   + v * org.shape[0])
            refr0 = jnp.broadcast_to(start_substance(sc, org[0]),
                                     (org.shape[0],))
            st = trace_rays(sc, cfg, org, dirs, key, rid,
                            start_refr=refr0, pid_seq=recs[v])
            total = total + jnp.sum((st.color - targets[v]) ** 2)
            n_pix += org.shape[0]
        return total / n_pix

    if fit_cfg.replay_every and cfg.spp != 1:
        raise ValueError("replay_every requires spp == 1 (one recorded "
                         "structure per ray)")

    if mesh is None:
        record_jit = jax.jit(record_fn)
        replay_grad = jax.jit(jax.value_and_grad(loss_replay, argnums=0))
        grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=0))
    else:
        # Sharded path: every view's rays split over the RAY_AXIS (scene,
        # accel and camera poses replicated; targets [V, N, 3] shard over
        # N). Replay composes with the mesh by recording per shard —
        # pid_seq is sharding-stable because the RNG streams key off the
        # GLOBAL ray id — and replaying inside the shard_map body; the
        # implicit psum of replicated-param cotangents all-reduces the
        # gradients exactly as in the search path (see
        # parallel.sharding.sharded_fit_step NOTE).
        from jax.sharding import PartitionSpec as P

        from ..config import HitBackend

        orgs = jnp.stack([o for o, _ in view_rays])          # [V, N, 3]
        dirss = jnp.stack([d for _, d in view_rays])
        n_views, n_view = orgs.shape[0], orgs.shape[1]
        n_dev = mesh.devices.size
        if n_view % n_dev:
            raise ValueError(
                f"rays per view ({n_view}) must divide over {n_dev} devices")
        rids = (jnp.arange(n_view, dtype=jnp.int32)[None, :]
                + jnp.arange(n_views, dtype=jnp.int32)[:, None] * n_view)
        n_total = n_views * n_view
        # PALLAS kernels have no shard_map batching rule on the CPU mesh;
        # the dense search is the safe in-shard default for off-TILED runs.
        shard_cfg = cfg
        if cfg.backend == HitBackend.TILED:
            shard_cfg = dataclasses.replace(cfg, backend=HitBackend.BRUTE)

        def _local_loss(params, o, d, rid, tgt, key, accel, recs):
            sc = rebuild(params)
            total = jnp.zeros((), jnp.float32)
            for v in range(n_views):
                refr0 = jnp.broadcast_to(start_substance(sc, o[v, 0]),
                                         (o.shape[1],))
                st = trace_rays(sc, shard_cfg, o[v], d[v], key, rid[v],
                                start_refr=refr0, accel=accel,
                                pid_seq=None if recs is None else recs[v])
                total = total + jnp.sum((st.color - tgt[v]) ** 2)
            return total / n_total

        ray_sp = P(None, RAY_AXIS)

        def _search_step(params, o, d, rid, tgt, key, accel):
            loss, grads = jax.value_and_grad(_local_loss)(
                params, o, d, rid, tgt, key, accel, None)
            return jax.lax.psum(loss, RAY_AXIS), grads

        def _replay_step(params, o, d, rid, tgt, recs, key):
            loss, grads = jax.value_and_grad(_local_loss)(
                params, o, d, rid, tgt, key, None, recs)
            return jax.lax.psum(loss, RAY_AXIS), grads

        def _record_local(params, o, d, rid, key, accel):
            sc = rebuild(params)
            outs = []
            for v in range(n_views):
                refr0 = jnp.broadcast_to(start_substance(sc, o[v, 0]),
                                         (o.shape[1],))
                outs.append(record_paths(sc, shard_cfg, o[v], d[v], key,
                                         rid[v], start_refr=refr0,
                                         accel=accel))
            return jnp.stack(outs)                   # [V, n_shard, refmax]

        search_sh = shard_map(
            _search_step, mesh=mesh,
            in_specs=(P(), ray_sp, ray_sp, ray_sp, ray_sp, P(), P()),
            out_specs=(P(), P()))
        replay_sh = shard_map(
            _replay_step, mesh=mesh,
            in_specs=(P(), ray_sp, ray_sp, ray_sp, ray_sp, ray_sp, P()),
            out_specs=(P(), P()))
        record_sh = shard_map(
            _record_local, mesh=mesh,
            in_specs=(P(), ray_sp, ray_sp, ray_sp, P(), P()),
            out_specs=ray_sp)
        grad_fn = jax.jit(
            lambda p, k, accel: search_sh(p, orgs, dirss, rids, targets,
                                          k, accel))
        record_jit = jax.jit(
            lambda p, k, accel: record_sh(p, orgs, dirss, rids, k, accel))
        replay_grad = jax.jit(
            lambda p, k, recs: replay_sh(p, orgs, dirss, rids, targets,
                                         recs, k))

    start_step = 0
    if fit_cfg.ckpt_dir:
        from ..utils import checkpoint as ckpt

        newest = ckpt.latest(fit_cfg.ckpt_dir)
        if newest is not None:
            (params, opt_state), start_step, _ = ckpt.restore(
                newest, (params, opt_state))

    losses = []
    for step in range(start_step, fit_cfg.steps):
        if (accel is not None and fit_cfg.accel_every
                and step > start_step
                and (step - start_step) % fit_cfg.accel_every == 0):
            from ..accel.octree import build_octree
            from ..config import OctreeConfig

            accel = build_octree(
                rebuild(params), OctreeConfig(max_depth=accel.max_depth),
                l_cut=accel.l_cut, like=accel)
        k = jax.random.fold_in(key, step)
        if fit_cfg.replay_every:
            if ((step - start_step) % fit_cfg.replay_every == 0
                    or step == start_step):
                recs = record_jit(params, k, accel)
            loss, grads = replay_grad(params, k, recs)
        else:
            loss, grads = grad_fn(params, k, accel)
        if trainable is not None:
            grads = [g if trainable(i, p) else jnp.zeros_like(g)
                     for i, (g, p) in enumerate(zip(grads, params))]
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
        if (fit_cfg.ckpt_dir and fit_cfg.save_every
                and (step + 1) % fit_cfg.save_every == 0):
            from ..utils import checkpoint as ckpt

            import pathlib

            pathlib.Path(fit_cfg.ckpt_dir).mkdir(parents=True, exist_ok=True)
            ckpt.save(pathlib.Path(fit_cfg.ckpt_dir) / f"ckpt_{step + 1}",
                      (params, opt_state), step=step + 1)
    return FitResult(scene=rebuild(params), losses=losses)
