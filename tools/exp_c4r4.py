"""r4 config-4 breakdown: where do the 0.75 s go with the listed cull?

  full_listed   — render_frame_tiled, SWEEP_LISTED on (the default)
  full_dense    — SWEEP_LISTED off (whole-table sweep rounds)
  bounce0       — refmax=1 frame (frame kernel + epilogue only)
  rounds        — sweep while-loop iterations of the full frame
"""
import json, os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/.axon_site")
import numpy as np, jax, jax.numpy as jnp
from bench import build_config4_scene, _time_sustained
from raytracer_js_tpu import RenderConfig, make_camera
from raytracer_js_tpu.config import HitBackend
import raytracer_js_tpu.render_tiled as rtl
from raytracer_js_tpu.render_tiled import frame_tables, render_frame_tiled

def main():
    scene = build_config4_scene(100_000)
    w, h = 1920, 1088
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    tab, cnts, c_max, grid = frame_tables(scene, cam)
    out = {}

    cfg2 = RenderConfig(refmax=2, backend=HitBackend.TILED)
    fn = jax.jit(lambda s: render_frame_tiled(
        s, cfg2, cam, tables=(tab, cnts, c_max, grid), with_diag=True))
    img, diag = fn(scene)
    out["rounds"] = int(diag["rounds"]); out["unresolved"] = int(diag["unresolved"])
    dt, _ = _time_sustained(fn, scene, burst=8)
    out["full_listed_ms"] = dt * 1e3

    rtl.SWEEP_LISTED = False
    fnD = jax.jit(lambda s: render_frame_tiled(
        s, cfg2, cam, tables=(tab, cnts, c_max, grid), with_diag=True))
    dt, _ = _time_sustained(fnD, scene, burst=8)
    out["full_dense_ms"] = dt * 1e3
    rtl.SWEEP_LISTED = True

    cfg1 = RenderConfig(refmax=1, backend=HitBackend.TILED)
    fn1 = jax.jit(lambda s: render_frame_tiled(
        s, cfg1, cam, tables=(tab, cnts, c_max, grid)))
    dt, _ = _time_sustained(fn1, scene, burst=8)
    out["bounce0_ms"] = dt * 1e3
    print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
    sel_stats()


def sel_stats():
    """Selectivity of the listed cull on the REAL post-bounce0 state."""
    import raytracer_js_tpu.kernels.trace_tiled as tt
    from raytracer_js_tpu.config import RayStatus

    scene = build_config4_scene(100_000)
    w, h = 1920, 1088
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    tab, cnts, c_max, grid = frame_tables(scene, cam)

    @jax.jit
    def stats(scene):
        st = tt.frame_bounce0(scene, cam, tab, cnts, c_max)
        flat = {k: st[k].reshape(-1) for k in st}
        org = jnp.stack([flat["ox"], flat["oy"], flat["oz"]], -1)
        dirs = jnp.stack([flat["dx"], flat["dy"], flat["dz"]], -1)
        working = flat["status"] == int(RayStatus.ALIVE)
        key = (rtl._pos_cell(scene, org) * 64
               + rtl._dir_bin(dirs)).astype(jnp.int32)
        key = jnp.where(working, key, jnp.int32(1 << 30))
        n = org.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        _, _, ox, oy, oz, dx, dy, dz, wk = jax.lax.sort(
            (key, idx, org[:, 0], org[:, 1], org[:, 2],
             dirs[:, 0], dirs[:, 1], dirs[:, 2],
             working.astype(jnp.int32)), num_keys=1)
        cap = min(n, rtl.SWEEP_SLICE)
        orgs = jnp.stack([ox, oy, oz], -1)[:cap]
        dirss = jnp.stack([dx, dy, dz], -1)[:cap]
        wks = wk[:cap].astype(bool)
        sweep_tab = rtl._sweep_perm(scene)
        _sc, _perm, tb = sweep_tab
        ids, cnt = rtl._block_tile_select(orgs, dirss, wks, tb)
        from raytracer_js_tpu.kernels.nearest_hit import BLOCK_R
        blk_live = wks.reshape(-1, BLOCK_R).sum(1)
        return (jnp.sum(working), cnt, blk_live, tb.shape[0])

    n_work, cnt, blk_live, T = stats(scene)
    cnt = np.asarray(cnt); blk_live = np.asarray(blk_live)
    live_blocks = blk_live > 0
    print(json.dumps(dict(
        n_working=int(n_work), tiles=int(T),
        mean_cnt_live=float(cnt[live_blocks].mean()),
        p50=float(np.percentile(cnt[live_blocks], 50)),
        p90=float(np.percentile(cnt[live_blocks], 90)),
        full_blocks_frac=float((cnt[live_blocks] >= int(T)).mean()),
    )), flush=True)
