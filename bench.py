"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): primary rays/s per chip at 1080p, 2-bounce.
``vs_baseline`` is the ratio against the 1e9 rays/s/chip north-star target
(the reference publishes no numbers of its own — BASELINE.md §"Published").

Usage:
    python bench.py [--small] [--backward]   # headline 1080p 2-bounce
    python bench.py --config N               # BASELINE.md config 1..5

Config modes (BASELINE.md "Benchmark configs"):
    1: 64x64, 3 spheres + ground, 1 bounce (the CPU-oracle class)
    2: 256x256, 50 spheres, 2 bounces
    3: 512x512, 5k-triangle mesh + spheres, image textures + image sky,
       3 bounces (PALLAS hit kernel + XLA shading — image textures are
       outside the fused-kernel class)
    4: 1080p, 100k primitives, full reflection path, depth-8 octree
    5: 8-view batch inverse-rendering step at the STATED shape (1080p x
       8 views, 1M primitives): TILED-forward recording (with_record) +
       path-replay gradients in --c5-slices ray slices per view
       (--c5-record octree keeps the r3 OCTREE-DDA recording)
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: first compiles over the remote-TPU tunnel
# run minutes; identical programs then load in <1s.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def build_scene(n_spheres: int, seed: int = 42):
    from raytracer_js_tpu import ResponseType, SceneBuilder

    b = SceneBuilder()
    sky = b.add_solid_texture((0.35, 0.45, 0.65))
    b.set_sky(sky)
    grey = b.add_solid_texture((0.6, 0.6, 0.6))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((0.0, 0.0, -51.0), 100.0, diffuse, grey)
    rng = np.random.default_rng(seed)
    centers = rng.uniform([2.0, -6.0, -0.5], [14.0, 6.0, 5.0], (n_spheres, 3))
    radii = rng.uniform(0.15, 0.6, n_spheres)
    palette = [b.add_solid_texture(rng.uniform(0.2, 1.0, 3)) for _ in range(8)]
    for i in range(n_spheres):
        b.add_sphere(centers[i], float(radii[i]),
                     mirror if i % 3 == 0 else diffuse, palette[i % 8])
    b.add_sphere((8.0, 0.5, 6.0), 1.0, light, white)
    return b.build()


def build_config3_scene(subdiv: int = 4, seed: int = 3):
    """512x512 class: 5k-triangle mesh + spheres, image-textured, image sky."""
    from raytracer_js_tpu import ResponseType, SceneBuilder
    from raytracer_js_tpu.utils.mesh import icosphere

    b = SceneBuilder(atlas_hw=(64, 64))
    yy = np.linspace(0.0, 1.0, 64)[:, None] * np.ones((1, 64))
    sky_img = np.stack([0.35 + 0.25 * yy, 0.45 + 0.25 * yy,
                        0.65 + 0.2 * yy], -1).astype(np.float32)
    b.set_sky(b.add_image_texture(sky_img))
    check = (np.indices((64, 64)).sum(0) % 2).astype(np.float32)[..., None]
    checker = (check * [0.55, 0.1, 0.1] + [0.25, 0.3, 0.35]).astype(np.float32)
    tex_check = b.add_image_texture(checker)
    grey = b.add_solid_texture((0.55, 0.55, 0.6))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    gold = b.add_solid_texture((0.9, 0.75, 0.3))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((0.0, 0.0, -51.0), 100.0, diffuse, grey)
    v, f = icosphere(subdiv, radius=1.2, center=(6.0, 0.0, 1.0))  # 5120 tris
    b.add_mesh(v, f, mirror, gold)
    b.add_sphere((4.0, -2.0, 0.6), 0.8, mirror, white)
    b.add_sphere((4.0, 2.2, 0.7), 0.9, diffuse, tex_check)
    b.add_sphere((6.0, 1.0, 5.0), 1.2, light, white)
    return b.build()


def build_config4_scene(n_prims: int = 100_000, seed: int = 7):
    """1080p class: n_prims primitives, full reflection path.

    Uniform sphere field over a slab in front of the camera, a ground box,
    and an emissive sphere; every 3rd sphere is a mirror so multi-bounce
    reflection paths stay hot.
    """
    from raytracer_js_tpu import ResponseType, SceneBuilder

    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.35, 0.45, 0.65)))
    grey = b.add_solid_texture((0.6, 0.6, 0.6))
    white = b.add_solid_texture((1.0, 1.0, 1.0))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((20.0, 0.0, -52.0), 100.0, diffuse, grey)
    rng = np.random.default_rng(seed)
    n_s = n_prims - 2
    centers = rng.uniform([4.0, -20.0, -1.0], [44.0, 20.0, 7.0], (n_s, 3))
    radii = rng.uniform(0.05, 0.18, n_s)
    palette = [b.add_solid_texture(rng.uniform(0.2, 1.0, 3))
               for _ in range(16)]
    for i in range(n_s):
        b.add_sphere(centers[i], float(radii[i]),
                     mirror if i % 3 == 0 else diffuse, palette[i % 16])
    b.add_sphere((24.0, 0.0, 14.0), 3.0, light, white)
    return b.build()


def _materialize(out):
    """Force true device completion by pulling one element to the host.

    On the axon tunnel ``jax.block_until_ready`` does NOT reliably wait for
    execution (measured: an 8192^3 bf16 matmul "completed" in 0.1 ms where
    the arithmetic floor is 5.6 ms), and it also adds per-buffer overhead.
    A host materialization of any element of the LAST output of an in-order
    device queue is an exact completion barrier for everything before it.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def _rtt(repeats=5):
    """Host<->device materialization round-trip (subtracted from bursts)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    v = jnp.zeros((8, 128), jnp.float32)
    _materialize(tiny(v))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _materialize(tiny(v))
        times.append(time.perf_counter() - t0)
    return min(times)


def _time_best(fn, arg, repeats):
    """Per-dispatch latency: best of ``repeats`` synchronous calls
    (includes one materialization round trip — reported as ``sync_s``)."""
    _materialize(fn(arg))                    # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _materialize(fn(arg))
        times.append(time.perf_counter() - t0)
    return min(times), times


def _time_sustained(fn, arg, burst=64, repeats=3):
    """Sustained per-frame time: ``burst`` frames queued back-to-back, ONE
    host materialization of the last output (an exact barrier on an
    in-order device queue), minus the measured round trip. This is the
    production-serving shape; per-dispatch sync would add ~24 ms RTT per
    frame over the tunnel and bury any sub-30 ms kernel.
    """
    _materialize(fn(arg))                    # compile + warm
    rtt = _rtt()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [fn(arg) for _ in range(burst)]
        _materialize(outs[-1])
        times.append((time.perf_counter() - t0 - rtt) / burst)
    return min(times), times


def run_config(args):
    """BASELINE.md benchmark configs 1-5; prints one JSON line."""
    import jax
    import jax.numpy as jnp

    from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
    from raytracer_js_tpu.config import HitBackend, OctreeConfig

    n = args.config
    detail = {"config": n, "device": str(jax.devices()[0])}
    if n == 1:
        from tests.scenes import config1_scene

        scene, (w, h) = config1_scene(), (64, 64)
        cfg = RenderConfig(refmax=1, backend=HitBackend.FUSED)
        accel = None
    elif n == 2:
        scene, (w, h) = build_scene(50), (256, 256)
        cfg = RenderConfig(refmax=2, backend=HitBackend.FUSED)
        accel = None
    elif n == 3:
        scene, (w, h) = build_config3_scene(), (512, 512)
        # Default: the TILED request goes through render_hdr's measured
        # prim-count crossover (render.TILED_MIN_PRIMS), which picks the
        # PALLAS wavefront path at this 5k-prim scale. --c3-backend
        # tiled/pallas forces a side for crossover measurements.
        backend = (HitBackend.PALLAS if args.c3_backend == "pallas"
                   else HitBackend.TILED)
        cfg = RenderConfig(refmax=3, backend=backend)
        if args.c3_backend == "auto":
            from raytracer_js_tpu.render import TILED_MIN_PRIMS

            detail["dispatch"] = ("tiled" if scene.n_prims > TILED_MIN_PRIMS
                                  else "pallas")
        accel = None
        detail["n_tris"] = scene.n_tris
    elif n == 4:
        scene, (w, h) = build_config4_scene(args.c4_prims), (1920, 1088)
        if args.c4_backend == "octree":
            from raytracer_js_tpu.accel.octree import build_octree

            cfg = RenderConfig(refmax=2, backend=HitBackend.OCTREE)
            accel = build_octree(scene, OctreeConfig(max_depth=8))
            detail.update(n_prims=scene.n_prims, octree_depth=8,
                          max_per_cell=accel.max_per_cell)
        else:
            cfg = RenderConfig(refmax=2, backend=HitBackend.TILED)
            accel = None
            detail.update(n_prims=scene.n_prims)
    elif n == 5:
        return run_config5(args)
    else:
        raise SystemExit(f"unknown --config {n}")

    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    from raytracer_js_tpu.render import TILED_MIN_PRIMS

    use_tiled = cfg.backend == HitBackend.TILED and (
        scene.n_prims > TILED_MIN_PRIMS
        or (n == 3 and args.c3_backend == "tiled"))
    if use_tiled:
        from raytracer_js_tpu.render_tiled import frame_tables

        tab, cnts, c_max, grid = frame_tables(scene, cam)
        detail.update(c_max=c_max, grid_c_max=grid.c_max,
                      cand_mean=float(np.asarray(cnts)[:, :3].sum(1).mean()))
        fn = jax.jit(lambda s, tb, ct, gr: render_hdr(
            s, cam, cfg, tables=(tb, ct, c_max, gr)))
        fn = functools.partial(fn, tb=tab, ct=cnts, gr=grid)
        from raytracer_js_tpu.render_tiled import render_frame_tiled

        _, diag = jax.jit(lambda s, tb, ct, gr: render_frame_tiled(
            s, cfg, cam, tables=(tb, ct, c_max, gr), with_diag=True))(
                scene, tab, cnts, grid)
        detail["unresolved"] = int(diag["unresolved"])  # 0 == exact frame
    elif n in (1, 2):
        # small frames are DISPATCH-bound one at a time (0.15-0.2 ms/frame
        # vs a ~24 ms tunnel RTT amortized over the burst — r3's config 1/2
        # numbers swung 2x run-to-run on tunnel noise). Batch K frames into
        # ONE dispatch so the JSON reflects chip throughput: the K cameras
        # get per-frame 1e-5 position jitter purely so XLA cannot CSE the
        # K identical kernel calls into one.
        kf = args.frames_per_dispatch
        offs = jnp.asarray(
            np.arange(kf, dtype=np.float32)[:, None] * [1e-5, 0, 0])
        poss = cam.pos[None, :] + offs

        def batch(s, poss):
            return jnp.stack([
                render_hdr(s, cam.replace(pos=poss[i]), cfg)
                for i in range(kf)])

        fn = jax.jit(functools.partial(batch, poss=poss))
        detail["frames_per_dispatch"] = kf
    else:
        fn = jax.jit(lambda s: render_hdr(s, cam, cfg, accel=accel))
    img = fn(scene)
    assert np.isfinite(np.asarray(img)).all()
    dt, times = _time_sustained(fn, scene, burst=args.burst)
    sync_dt, _ = _time_best(fn, scene, args.repeats)
    rays = w * h * cfg.spp
    if n in (1, 2):
        rays *= args.frames_per_dispatch
    detail.update(w=w, h=h, refmax=cfg.refmax, sustained_s=dt,
                  times_s=times, sync_s=sync_dt, backend=str(cfg.backend))
    print(json.dumps({
        "metric": f"config{n}_rays_per_s_per_chip",
        "value": rays / dt,
        "unit": "rays/s",
        "vs_baseline": None,
        "detail": detail,
    }))


def run_config5(args):
    """Config 5 at its STATED shape: 1080p x 8 views, 1M primitives,
    inverse-rendering step (single chip; N>=2-host sharding of the same
    step is validated by __graft_entry__.dryrun_multichip + bench_scaling).

    The production step is record + path-replay (optim/fit.replay_every):
    a forward pass records each view's discrete winners (amortized over
    ``--c5-replay-every`` steps), and the per-step gradient differentiates
    the search-free replay — prim-count-independent. Recording runs on the
    TILED frame path by default (render_frame_tiled with_record — the
    winners the frame kernel already computes; r3's OCTREE-DDA recording
    cost 1198 s per 8-view pass and stays available via
    ``--c5-record octree``). Reported value = steady-state replay-backward
    rays/s; ``amortized`` folds the recording in. Host-side candidate
    tables are camera-pose-keyed and reused across recordings (same
    staleness policy as the octree rebuild), reported as ``setup_s``.
    """
    import jax
    import jax.numpy as jnp

    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.config import HitBackend
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.ops.trace import record_paths, trace_rays
    from raytracer_js_tpu.parallel.sharding import float_partition
    from raytracer_js_tpu.render import start_substance

    w, h = args.c5_res
    views = 8
    scene = build_config4_scene(args.c5_prims)
    cams = [make_camera((0.0, float(v - views // 2), 0.5), w, h,
                        np.pi / 2, np.pi / 2 * h / w) for v in range(views)]
    rays_dirs = [pixel_rays(c) for c in cams]
    key = jax.random.key(0)
    params, rebuild = float_partition(scene)
    n_pix = w * h
    n_slc = max(1, args.c5_slices)
    assert n_pix % n_slc == 0, (n_pix, n_slc)
    ns = n_pix // n_slc
    setup_s = 0.0

    def slices():
        for v in range(views):
            o, d = rays_dirs[v]
            for s in range(n_slc):
                sl = slice(s * ns, (s + 1) * ns)
                rid = (jnp.arange(s * ns, (s + 1) * ns, dtype=jnp.int32)
                       + v * n_pix)
                yield v, o[sl], d[sl], rid

    if args.c5_record == "tiled":
        from raytracer_js_tpu.accel import candidates as cand
        from raytracer_js_tpu.kernels import trace_tiled as tt
        from raytracer_js_tpu.render_tiled import render_frame_tiled

        import raytracer_js_tpu.render_tiled as rtl

        cfg_t = RenderConfig(refmax=2, backend=HitBackend.TILED)
        # record frames in SWEEP mode even at 1M prims: the whole-table
        # kernel rounds (VMEM-legal since the scoped-limit raise) measured
        # far cheaper than the packet-round machinery at this scale
        # (r4: packet recording was ~100 s/view)
        rtl.SWEEP_MAX_PRIMS = max(rtl.SWEEP_MAX_PRIMS, scene.n_prims)
        t0 = time.perf_counter()
        grid = cand.build_cell_grid(scene, c_sel=4096)
        # ship only (pid, t_lo) lists per view — the packed 20-attr tables
        # are 1.6 GB/view and the device tunnel moves ~20 MB/s (r4: they
        # dominated setup+record); rows are gathered ON DEVICE from
        # prim_attr_table_jnp inside rec_fn
        tabs = []
        c_bkt = 8192
        for c in cams:
            pid_t, tlo_t, cnts, c_raw = cand.frame_candidates(
                scene, c, tt.TILE_SUB, tt.LANE, raw=True)
            c_pad = -(-c_raw // c_bkt) * c_bkt
            pid_t = np.pad(pid_t, ((0, 0), (0, c_pad - c_raw)),
                           constant_values=-1)
            tlo_t = np.pad(tlo_t, ((0, 0), (0, c_pad - c_raw)),
                           constant_values=np.inf)
            tabs.append((pid_t, tlo_t, np.asarray(cnts), c_pad))
        setup_s = time.perf_counter() - t0

        @functools.partial(jax.jit, static_argnames=("c_max",))
        def rec_fn(sc, cam, pid_t, tlo_t, cnts, grid_, c_max):
            tab = cand.pack_candidate_attrs_jnp(
                sc, pid_t.reshape(-1), tlo_t.reshape(-1))
            return render_frame_tiled(sc, cfg_t, cam,
                                      tables=(tab, cnts, c_max, grid_),
                                      with_record=True)[1]

        def record_all(params):
            sc = rebuild(params)
            out = []
            for v in range(views):
                pid_t, tlo_t, cnts, c_pad = tabs[v]
                rec = rec_fn(sc, cams[v], pid_t, tlo_t, cnts, grid,
                             c_max=c_pad)
                out.extend(rec[s * ns:(s + 1) * ns]
                           for s in range(n_slc))
            return out
    else:
        from raytracer_js_tpu.accel.octree import build_octree
        from raytracer_js_tpu.config import OctreeConfig

        cfg = RenderConfig(refmax=2, backend=HitBackend.OCTREE)
        t0 = time.perf_counter()
        accel = build_octree(scene, OctreeConfig(max_depth=8))
        setup_s = time.perf_counter() - t0

        # each view is processed in --c5-slices ray slices: one 2M-ray x
        # 1M-prim DDA record crashes the TPU worker (r3: reproducible
        # between 262k and 522k rays — tools/repro_record_crash.py);
        # production would tile identically, and rid offsets keep the RNG
        # streams global either way
        if ns > 262_144:
            print(f"warning: octree record slices of {ns} rays exceed the "
                  "largest known-good 262144 (see "
                  "tools/repro_record_crash.py); raise --c5-slices",
                  file=sys.stderr)
        def record_slice(params, org, dirs, rid):
            sc = rebuild(params)
            refr0 = jnp.broadcast_to(start_substance(sc, org[0]), (ns,))
            return record_paths(sc, cfg, org, dirs, key, rid,
                                start_refr=refr0, accel=accel)

        rec_jit = jax.jit(record_slice)

        def record_all(params):
            return [rec_jit(params, o, d, rid)
                    for _, o, d, rid in slices()]

    t0 = time.perf_counter()
    recs = record_all(params)
    _materialize(recs[-1])
    dt_rec = time.perf_counter() - t0          # one full 8-view recording

    # replay ignores the backend (pid_seq supplies the winners)
    cfg_replay = RenderConfig(refmax=2, backend=HitBackend.BRUTE)

    def slice_loss(params, org, dirs, rid, rec):
        sc = rebuild(params)
        refr0 = jnp.broadcast_to(start_substance(sc, org[0]), (ns,))
        st = trace_rays(sc, cfg_replay, org, dirs, key, rid,
                        start_refr=refr0, pid_seq=rec)
        return jnp.sum(st.color ** 2) / (views * n_pix)

    vg_jit = jax.jit(jax.value_and_grad(slice_loss))
    add = jax.jit(lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))

    def replay_step(params):
        loss = jnp.zeros((), jnp.float32)
        grads = None
        for i, (_, o, d, rid) in enumerate(slices()):
            l, g = vg_jit(params, o, d, rid, recs[i])
            loss = loss + l
            grads = g if grads is None else add(grads, g)
        return loss, grads

    dt, times = _time_sustained(replay_step, params, burst=2,
                                repeats=max(2, args.repeats // 2))
    rays = views * n_pix
    every = max(1, args.c5_replay_every)
    amort = rays / (dt + dt_rec / every)
    print(json.dumps({
        "metric": "config5_backward_rays_per_s_per_chip",
        "value": rays / dt,
        "unit": "rays/s",
        "vs_baseline": None,
        "detail": {"config": 5, "views": views, "w": w, "h": h,
                   "n_prims": scene.n_prims, "mode": "record+replay",
                   "slices_per_view": n_slc,
                   "replay_step_s": dt, "times_s": times,
                   "record_s": dt_rec, "setup_s": setup_s,
                   "record_mode": args.c5_record,
                   "replay_every": every,
                   "amortized_rays_per_s": amort,
                   "device": str(jax.devices()[0]),
                   "note": "single-chip; N>=2-host sharding of this step "
                           "is dryrun_multichip + bench_scaling.py"},
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="256x256 smoke configuration")
    ap.add_argument("--spheres", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--burst", type=int, default=64,
                    help="frames per sustained-throughput burst")
    ap.add_argument("--frames-per-dispatch", type=int, default=32,
                    help="config 1/2: frames batched into one dispatch")
    ap.add_argument("--backward", action="store_true",
                    help="measure backward (gradient) rays/s instead")
    ap.add_argument("--config", type=int, default=0,
                    help="run BASELINE.md config N (1..5) instead")
    ap.add_argument("--c4-prims", type=int, default=100_000)
    # measured on chip: PALLAS 1.17e6 rays/s vs TILED 2.9e5 at 512^2/5k
    # prims — the tiled round machinery only pays off at big scenes
    ap.add_argument("--c3-backend", default="auto",
                    choices=["auto", "tiled", "pallas"])
    ap.add_argument("--c4-backend", default="tiled",
                    choices=["tiled", "octree"])
    ap.add_argument("--c5-prims", type=int, default=1_000_000)
    ap.add_argument("--c5-res", type=int, nargs=2, default=(1920, 1088),
                    metavar=("W", "H"))
    ap.add_argument("--c5-replay-every", type=int, default=8,
                    help="recording amortization horizon for config 5")
    ap.add_argument("--c5-slices", type=int, default=8,
                    help="ray slices per view for config 5 (memory bound)")
    ap.add_argument("--c5-record", default="tiled",
                    choices=["tiled", "octree"],
                    help="config-5 recording pass: TILED frame forward "
                         "(with_record) or the r3 OCTREE-DDA slices")
    args = ap.parse_args()

    if args.config:
        return run_config(args)

    import jax

    from raytracer_js_tpu import RenderConfig, make_camera, render_hdr

    if args.small:
        w, h = 256, 256
    else:
        w, h = 1920, 1088  # 1080p rounded to a tile multiple of 8 rows

    from raytracer_js_tpu.config import HitBackend

    scene = build_scene(args.spheres)
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2,
                      np.pi / 2 * h / w)
    # FUSED: whole-trace Pallas kernel (falls back to BRUTE off-class)
    cfg = RenderConfig(refmax=2, backend=HitBackend.FUSED)

    if args.backward:
        return bench_backward(scene, cam, args, w, h)

    fn = jax.jit(lambda s: render_hdr(s, cam, cfg))
    img = jax.block_until_ready(fn(scene))            # compile + warm
    assert np.isfinite(np.asarray(img)).all()

    dt, times = _time_sustained(fn, scene, burst=args.burst,
                                repeats=args.repeats)
    sync_dt, _ = _time_best(fn, scene, args.repeats)
    rays = w * h * cfg.spp
    rays_per_s = rays / dt

    target = 1.0e9  # BASELINE.md north-star rays/s/chip
    print(json.dumps({
        "metric": "primary_rays_per_s_per_chip",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / target,
        "detail": {
            "w": w, "h": h, "refmax": cfg.refmax, "spheres": args.spheres,
            "sustained_s": dt, "times_s": times, "sync_s": sync_dt,
            "burst": args.burst,
            "backend": str(cfg.backend), "device": str(jax.devices()[0]),
        },
    }))


def bench_backward(scene, cam, args, w, h):
    """Backward (gradient) rays/s, both gradient modes (BASELINE.md
    metric 2):

    * SEARCH — value_and_grad through the trace with the PALLAS nearest-hit
      in the VJP graph (stop_gradient'ed result, but the search itself
      re-runs in the forward of every grad step);
    * REPLAY — record the discrete winners once (ops/trace.record_paths,
      any forward backend), then differentiate the search-free replay: the
      steady-state inverse-rendering step. The headline value is the replay
      grad step; ``record_s`` is the amortized recording cost.
    """
    import jax
    import jax.numpy as jnp

    from raytracer_js_tpu import RenderConfig
    from raytracer_js_tpu.config import HitBackend
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.ops.trace import record_paths, trace_rays
    from raytracer_js_tpu.parallel.sharding import float_partition
    from raytracer_js_tpu.render import render_rays, start_substance

    import dataclasses

    # unroll: the rolled while-loop VJP stacks T(8,128)-padded carries per
    # iteration — measured r4: 2.5x backward cost at this shape (see
    # tools/bench_results_r4/exp_backward.jsonl and the trace_rays replay
    # auto-unroll note)
    cfg = RenderConfig(refmax=2, backend=HitBackend.PALLAS, unroll=True)
    cfg_search = cfg
    if args.spheres > 384:
        # SEARCH-mode grad at big prim tables: XLA sometimes fails to fuse
        # the [N, K] one-hot into its jvp dot (measured r4: two
        # materialized 8.4 GB one-hots OOM'd the 1000-sphere search graph;
        # remat+unroll still missed HBM by 84 MB) — remat + rolled bounds
        # the live set to one bounce. The REPLAY graph (the steady-state
        # step) fuses fine and stays non-remat+unrolled: measured r4
        # 31.5 ms vs 169 ms remat-rolled at 1000 prims.
        cfg_search = dataclasses.replace(cfg, remat=True, unroll=False)
    org, dirs = pixel_rays(cam)
    n = org.shape[0]
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    params, rebuild = float_partition(scene)
    target = jnp.zeros((n, 3), jnp.float32)

    def loss(params):
        colors = render_rays(rebuild(params), cfg_search, org, dirs, key,
                             rid)
        return jnp.sum((colors - target) ** 2) / n

    fn = jax.jit(jax.value_and_grad(loss))
    dt_s, times_s = _time_sustained(fn, params, burst=8,
                                    repeats=args.repeats)

    # --- replay mode: record once, differentiate the replay --------------
    def record(params):
        sc = rebuild(params)
        refr0 = jnp.broadcast_to(start_substance(sc, org[0]), (n,))
        return record_paths(sc, cfg, org, dirs, key, rid, start_refr=refr0)

    rec_fn = jax.jit(record)
    dt_rec, _ = _time_sustained(rec_fn, params, burst=8,
                                repeats=max(2, args.repeats // 2))
    pid_seq = rec_fn(params)

    from raytracer_js_tpu.kernels import replay_grad

    tile_lists = None
    if replay_grad.supports_listed(scene, cfg):
        # per-tile compact sphere-id lists: the in-kernel pick/scatter
        # costs O(distinct-per-tile) (~6 at 50 prims, ~33 at 1000), not
        # O(P); rebuilt host-side from each concrete recording
        tile_lists = replay_grad.build_tile_lists(np.asarray(pid_seq),
                                                  scene.n_spheres)
    use_kernel = (tile_lists is not None
                  or replay_grad.supports(scene, cfg))

    def loss_replay(params, pid_seq):
        sc = rebuild(params)
        if use_kernel:
            # fused forward+backward Pallas replay kernels (custom VJP)
            colors = replay_grad.replay_colors(sc, cfg, org, dirs, pid_seq,
                                               tile_lists=tile_lists)
        else:
            refr0 = jnp.broadcast_to(start_substance(sc, org[0]), (n,))
            st = trace_rays(sc, cfg, org, dirs, key, rid, start_refr=refr0,
                            pid_seq=pid_seq)
            colors = st.color
        return jnp.sum((colors - target) ** 2) / n

    fn_r = jax.jit(jax.value_and_grad(loss_replay))
    dt_r, times_r = _time_sustained(lambda p: fn_r(p, pid_seq), params,
                                    burst=8, repeats=args.repeats)
    print(json.dumps({
        "metric": "backward_rays_per_s_per_chip",
        "value": w * h / dt_r,
        "unit": "rays/s",
        "vs_baseline": None,   # BASELINE: "measured & reported"
        "detail": {"w": w, "h": h, "refmax": cfg.refmax,
                   "spheres": args.spheres, "mode": "replay",
                   "replay_kernel": bool(use_kernel),
                   "replay_s": dt_r, "replay_times_s": times_r,
                   "record_s": dt_rec,
                   "search_rays_per_s": w * h / dt_s,
                   "search_s": dt_s, "search_times_s": times_s,
                   "backend": str(cfg.backend)},
    }))


if __name__ == "__main__":
    sys.exit(main())
