"""Stage-wise honest timing of the config-4 tiled path on TPU."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from bench import build_config4_scene, _materialize, _rtt
from raytracer_js_tpu import RenderConfig, make_camera
from raytracer_js_tpu.accel import candidates as cand
from raytracer_js_tpu.config import HitBackend, RayStatus
from raytracer_js_tpu.kernels import trace_tiled as tt
from raytracer_js_tpu import render_tiled as rtl


def honest(fn, args, burst=8):
    _materialize(fn(*args))
    rtt = _rtt()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(burst)]
        _materialize(outs[-1])
        ts.append((time.perf_counter() - t0 - rtt) / burst)
    return min(ts)


def main():
    scene = build_config4_scene(100_000)
    w, h = 1920, 1088
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    cfg = RenderConfig(refmax=2, backend=HitBackend.TILED)
    t0 = time.perf_counter()
    tab, cnts, c_max, grid = rtl.frame_tables(scene, cam)
    print(f"host tables: {time.perf_counter()-t0:.1f}s c_max={c_max}")

    # A: bounce-0 frame kernel only
    fA = jax.jit(lambda s, tb, ct: tt.frame_bounce0(
        s, cam, tb, ct, c_max, interpret=False)["cr"])
    print(f"A bounce0 kernel: {honest(fA, (scene, tab, cnts))*1e3:.1f} ms")

    # B: full refmax=1 render (kernel + epilogue)
    cfg1 = RenderConfig(refmax=1, backend=HitBackend.TILED)
    fB = jax.jit(lambda s, tb, ct: rtl.render_frame_tiled(
        s, cfg1, cam, tables=(tb, ct, c_max)))
    print(f"B refmax1 full: {honest(fB, (scene, tab, cnts))*1e3:.1f} ms")

    # C: packet prep stages on a realistic post-bounce0 state
    st = jax.jit(lambda s, tb, ct: tt.frame_bounce0(
        s, cam, tb, ct, c_max, interpret=False))(scene, tab, cnts)
    names = ("ox", "oy", "oz", "dx", "dy", "dz", "cr", "cg", "cb",
             "path", "status")
    hp, wp = np.asarray(st["cr"]).shape
    rows = hp * wp // tt.LANE
    cols = [jnp.asarray(st[k]).reshape(rows, tt.LANE) for k in names]
    alive_frac = float((np.asarray(st["status"]) == 0).mean())
    print(f"alive after b0: {alive_frac:.3f}")

    def prep_sort(*cs):
        flat = [c.reshape(-1) for c in cs]
        org = jnp.stack(flat[0:3], -1)
        dirs = jnp.stack(flat[3:6], -1)
        alive = flat[10] == int(RayStatus.ALIVE)
        key = (rtl._pos_cell(scene, org) * 64
               + rtl._dir_bin(dirs)).astype(jnp.int32)
        key = jnp.where(alive, key, jnp.int32(1 << 30))
        order = jnp.argsort(key)
        return [f[order] for f in flat]

    fS = jax.jit(prep_sort)
    print(f"C1 bin+argsort+permute: {honest(fS, tuple(cols))*1e3:.1f} ms")

    flat_s = fS(*cols)
    org_s = jnp.stack(flat_s[0:3], -1)
    dir_s = jnp.stack(flat_s[3:6], -1)
    alive_s = flat_s[10] == int(RayStatus.ALIVE)

    fC = jax.jit(lambda o, d, a: cand.packet_candidates(
        scene, o, d, a, rtl.PACKET, 4096)[0])
    print(f"C2 packet_candidates: {honest(fC, (org_s, dir_s, alive_s))*1e3:.1f} ms")

    tab2, cnts2, ovf = jax.jit(lambda o, d, a: cand.packet_candidates(
        scene, o, d, a, rtl.PACKET, 4096))(org_s, dir_s, alive_s)
    print("overflow packets:", int(jnp.sum(ovf.astype(jnp.int32))),
          "cand mean:", float(jnp.mean(jnp.sum(cnts2[:, :3], 1))))

    cols_s = [f.reshape(rows, tt.LANE) for f in flat_s]
    fW = jax.jit(lambda cs, tb, ct: tt.wave_bounce(
        scene, cs, tb, ct, 4096, interpret=False)[6])
    print(f"C3 wave kernel: {honest(fW, (tuple(cols_s), tab2, cnts2))*1e3:.1f} ms")

    # D: full refmax=2
    fD = jax.jit(lambda s, tb, ct: rtl.render_frame_tiled(
        s, cfg, cam, tables=(tb, ct, c_max)))
    print(f"D refmax2 full: {honest(fD, (scene, tab, cnts), burst=4)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
