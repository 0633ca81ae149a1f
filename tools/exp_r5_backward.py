"""r5 backward decomposition: where does the replay grad step spend time?

Measures, at the headline wavefront (1080p = 2,088,960 rays, refmax 2):
  vg50/vg1k      - current replay value_and_grad (baseline re-measure)
  fwd50/fwd1k    - replay forward only
  elem50/elem1k  - vg with the gather mocked (row 0 broadcast): the
                   elementwise + loop + loss cost without any one-hot
  gat_hi/gat_s3/gat_bf - raw one-hot gather vg cost at P=128/1024:
                   HIGHEST vs 3-pass bf16 table split vs plain bf16
  gat2l          - two-level (group-8) gather vg cost
Run: python tools/exp_r5_backward.py [--prims 50 1000]
"""
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import _materialize, _time_sustained, build_scene

OUT = []


def rec(name, ms, extra=None):
    row = {"name": name, "ms": ms * 1e3}
    if extra:
        row.update(extra)
    OUT.append(row)
    print(json.dumps(row), flush=True)


def main():
    from raytracer_js_tpu import RenderConfig, make_camera
    from raytracer_js_tpu.config import HitBackend
    from raytracer_js_tpu.models.camera import pixel_rays
    from raytracer_js_tpu.ops.trace import record_paths, trace_rays, prim_rows
    from raytracer_js_tpu.parallel.sharding import float_partition
    from raytracer_js_tpu.render import start_substance

    w, h = 1920, 1088
    n = w * h
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    org, dirs = pixel_rays(cam)
    rid = jnp.arange(n, dtype=jnp.int32)
    key = jax.random.key(0)
    cfg = RenderConfig(refmax=2, backend=HitBackend.PALLAS, unroll=True)

    for n_sph in [50, 1000]:
        tag = "50" if n_sph == 50 else "1k"
        scene = build_scene(n_sph)
        params, rebuild = float_partition(scene)
        refr0 = jnp.broadcast_to(start_substance(scene, org[0]), (n,))
        rec_fn = jax.jit(lambda p: record_paths(
            rebuild(p), cfg, org, dirs, key, rid, start_refr=refr0))
        pid_seq = rec_fn(params)
        _materialize(pid_seq)

        def loss_replay(params, pid_seq):
            sc = rebuild(params)
            st = trace_rays(sc, cfg, org, dirs, key, rid, start_refr=refr0,
                            pid_seq=pid_seq)
            return jnp.sum(st.color ** 2) / n

        # forward only
        f_fwd = jax.jit(loss_replay)
        dt, _ = _time_sustained(lambda p: f_fwd(p, pid_seq), params, burst=8)
        rec(f"fwd{tag}", dt)
        # vg baseline
        f_vg = jax.jit(jax.value_and_grad(loss_replay))
        dt, _ = _time_sustained(lambda p: f_vg(p, pid_seq), params, burst=8)
        rec(f"vg{tag}", dt)

        # elementwise-only: mock the gather with a row-0 broadcast
        import raytracer_js_tpu.ops.trace as tr
        orig_pair = tr.gather_rows_pair

        def mock_pair(g, d, idx):
            shp = idx.shape
            return (jnp.broadcast_to(g[0], (*shp, g.shape[1])) +
                    0.0 * idx.astype(jnp.float32)[..., None],
                    jnp.broadcast_to(d[0], (*shp, d.shape[1])))
        tr.gather_rows_pair = mock_pair
        try:
            f_el = jax.jit(jax.value_and_grad(loss_replay))
            dt, _ = _time_sustained(lambda p: f_el(p, pid_seq), params,
                                    burst=8)
            rec(f"elem{tag}", dt)
        finally:
            tr.gather_rows_pair = orig_pair

    # --- raw gather costs -------------------------------------------------
    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, 1000, n).astype(np.int32)
    for P in [128, 1024]:
        tab = jnp.asarray(rng.uniform(-1, 1, (P, 16)).astype(np.float32))
        idx = jnp.asarray(np.minimum(idx_np, P - 1))
        wgt = jnp.asarray(rng.uniform(-1, 1, (n, 16)).astype(np.float32))

        def g_hi(tab, idx):
            oh = (idx[:, None] == jax.lax.iota(jnp.int32, P)[None, :]
                  ).astype(jnp.float32)
            return jnp.matmul(oh, tab, precision=jax.lax.Precision.HIGHEST)

        def g_s3(tab, idx):
            oh = (idx[:, None] == jax.lax.iota(jnp.int32, P)[None, :]
                  ).astype(jnp.bfloat16)
            hi = tab.astype(jnp.bfloat16)
            r1 = tab - hi.astype(jnp.float32)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            dn = (((1,), (0,)), ((), ()))
            dot = functools.partial(jax.lax.dot_general,
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
            return dot(oh, hi) + dot(oh, mid) + dot(oh, lo)

        def g_bf(tab, idx):
            oh = (idx[:, None] == jax.lax.iota(jnp.int32, P)[None, :]
                  ).astype(jnp.bfloat16)
            return jax.lax.dot_general(
                oh, tab.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def g_2l(tab, idx):
            # group-8: stage1 matmul over P/8 groups, stage2 fused select
            G = P // 8
            tabw = tab.reshape(G, 8 * 16)
            ohg = (jnp.right_shift(idx, 3)[:, None]
                   == jax.lax.iota(jnp.int32, G)[None, :]).astype(
                       jnp.float32)
            tmp = jnp.matmul(ohg, tabw,
                             precision=jax.lax.Precision.HIGHEST)  # [n,128]
            lo = jnp.bitwise_and(idx, 7)
            sel = (lo[:, None] == jax.lax.iota(jnp.int32, 8)[None, :]
                   ).astype(jnp.float32)                           # [n, 8]
            return jnp.sum(tmp.reshape(n, 8, 16) * sel[:, :, None], axis=1)

        def g_take(tab, idx):
            return jnp.take(tab, idx, axis=0)

        for name, fn in [("hi", g_hi), ("s3", g_s3), ("bf", g_bf),
                         ("2l", g_2l), ("take", g_take)]:
            def loss(tab):
                return jnp.sum(fn(tab, idx) * wgt)
            f = jax.jit(jax.value_and_grad(loss))
            _materialize(f(tab))
            # check correctness vs take
            got = jax.jit(lambda t: fn(t, idx))(tab)
            ref = np.asarray(tab)[np.asarray(idx)]
            err = float(np.abs(np.asarray(got) - ref).max())
            dt, _ = _time_sustained(f, tab, burst=8)
            rec(f"gat_{name}_P{P}", dt, {"max_err": err})
            ff = jax.jit(lambda t: jnp.sum(fn(t, idx) * wgt))
            dt, _ = _time_sustained(ff, tab, burst=8)
            rec(f"gatf_{name}_P{P}", dt)

    with open("/root/repo/tools/bench_results_r5/exp_backward.jsonl",
              "w") as f:
        for row in OUT:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    os.makedirs("/root/repo/tools/bench_results_r5", exist_ok=True)
    main()
