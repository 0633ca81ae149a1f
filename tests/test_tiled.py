"""Tiled candidate-list kernel vs the BRUTE wavefront (golden parity).

The tiled path (render_tiled + kernels/trace_tiled + accel/candidates) must
reproduce ops/trace exactly: identical nearest hits (up to exact-tie
order), identical shading state machine. Runs in Pallas interpret mode on
the CPU mesh — interpret mode executes the kernel's chunk loops in Python,
so this file takes ~1 h of CPU; it is marked ``slow`` (excluded from the
default ``pytest`` run, included via ``-m ""``). The tiled path's on-chip
exactness is additionally checked by bench.py --config 4's ``unresolved``
diagnostic on every driver run.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from raytracer_js_tpu import RenderConfig, ResponseType, SceneBuilder, make_camera
from raytracer_js_tpu.accel import candidates as cand
from raytracer_js_tpu.config import HitBackend
from raytracer_js_tpu.kernels import trace_tiled as tt
from raytracer_js_tpu.ops.trace import nearest_hit_brute
from raytracer_js_tpu.render import render_hdr
from raytracer_js_tpu.render_tiled import render_frame_tiled


def _mixed_scene(n=120, seed=5):
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.35, 0.45, 0.65)))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    rng = np.random.default_rng(seed)
    pal = [b.add_solid_texture(rng.uniform(0.2, 1.0, 3)) for _ in range(6)]
    b.add_box((0.0, 0.0, -21.0), 40.0, diffuse, pal[0])   # ground
    for i in range(n):
        c = rng.uniform([2.0, -4.0, -0.5], [10.0, 4.0, 4.0], 3)
        m = [diffuse, mirror, diffuse][i % 3]
        if i % 5 == 4:
            b.add_box(c, float(rng.uniform(0.2, 0.6)), m, pal[i % 6])
        elif i % 7 == 6:
            v0 = c
            v1 = c + rng.uniform(-0.6, 0.6, 3)
            v2 = c + rng.uniform(-0.6, 0.6, 3)
            b.add_triangle(v0, v1, v2, m, pal[i % 6])
        else:
            b.add_sphere(c, float(rng.uniform(0.15, 0.5)), m, pal[i % 6])
    b.add_sphere((6.0, 0.0, 6.0), 1.0, light, pal[1])
    return b.build()


def test_frame_candidates_cover_brute_winners():
    """Exactness of the cone culling: every BRUTE nearest-hit winner of a
    tile's rays appears in that tile's candidate list."""
    scene = _mixed_scene(80)
    cam = make_camera((0.0, 0.0, 0.5), 2 * tt.LANE, 2 * tt.TILE_SUB,
                      np.pi / 2, np.pi / 2 * (2 * tt.TILE_SUB) / (2 * tt.LANE))
    tab, cnts, c_max = cand.frame_candidates(scene, cam, tt.TILE_SUB, tt.LANE)
    from raytracer_js_tpu.models.camera import pixel_rays

    org, dirs = pixel_rays(cam)
    _, pid = nearest_hit_brute(scene, org, dirs)
    pid = np.asarray(pid).reshape(cam.h, cam.w)
    tabn = np.asarray(tab).reshape(-1, c_max, cand.N_ATTR)
    nbx = cam.w // tt.LANE
    for by in range(cam.h // tt.TILE_SUB):
        for bx in range(nbx):
            tile_pids = set(
                tabn[by * nbx + bx, :, 1][np.isfinite(
                    tabn[by * nbx + bx, :, 0])].astype(int))
            winners = set(pid[by * tt.TILE_SUB:(by + 1) * tt.TILE_SUB,
                              bx * tt.LANE:(bx + 1) * tt.LANE].ravel())
            winners.discard(-1)
            assert winners <= tile_pids, (by, bx, winners - tile_pids)


@pytest.mark.parametrize("refmax,mode", [(1, "sweep"), (3, "sweep"),
                                         (3, "packet")])
def test_render_tiled_matches_brute(refmax, mode, monkeypatch):
    """Both bounce>=1 regimes: SWEEP (whole-table rescue rounds — the
    <=262k-prim default) and PACKET (candidate rounds + marching retries +
    rescue — the big-scene path, forced by zeroing the sweep threshold)."""
    import raytracer_js_tpu.render_tiled as rtl

    if mode == "packet":
        monkeypatch.setattr(rtl, "SWEEP_MAX_PRIMS", 0)
    scene = _mixed_scene(120)
    w, h = 2 * tt.LANE, 2 * tt.TILE_SUB
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    cfg_b = RenderConfig(refmax=refmax, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg_b))
    got, diag = render_frame_tiled(scene, cfg_b, cam, with_diag=True)
    got = np.asarray(got)
    assert int(diag["unresolved"]) == 0
    mism = (~np.isclose(got, want, rtol=1e-4, atol=1e-5)).any(axis=-1)
    # exact nearest-hit ties may pick a different prim on isolated pixels
    assert mism.mean() < 0.002, f"{mism.sum()} mismatching pixels"


def test_render_tiled_tiny_scene():
    """Regression: candidate counts below one early-exit CHUNK must still
    scan (n_chunks was floor-div once — whole segments were skipped)."""
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.35, 0.45, 0.65)))
    diffuse = b.add_material(ResponseType.REFLECTION)
    b.add_sphere((4.0, 0.0, 0.0), 1.0, diffuse,
                 b.add_solid_texture((0.9, 0.2, 0.1)))
    b.add_box((0.0, 0.0, -21.0), 40.0, diffuse,
              b.add_solid_texture((0.5, 0.5, 0.5)))
    scene = b.build()
    cam = make_camera((0.0, 0.0, 0.5), 128, 128, np.pi / 2, np.pi / 2)
    cfg = RenderConfig(refmax=2, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg))
    got = np.asarray(render_frame_tiled(scene, cfg, cam))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_render_tiled_image_textures_and_sky():
    """Image textures + image sky ride the tiled path: the kernel emits
    (u, v) and the XLA glue samples the atlas / sky (VERDICT r1 task 3)."""
    rng = np.random.default_rng(9)
    b = SceneBuilder(atlas_hw=(16, 16))
    sky_img = rng.uniform(0.1, 0.9, (16, 16, 3)).astype(np.float32)
    b.set_sky(b.add_image_texture(sky_img))
    check = rng.uniform(0.0, 1.0, (16, 16, 3)).astype(np.float32)
    tex_img = b.add_image_texture(check)
    grey = b.add_solid_texture((0.5, 0.5, 0.5))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    b.add_box((0.0, 0.0, -21.0), 40.0, diffuse, tex_img)     # textured ground
    b.add_sphere((4.0, 0.0, 0.5), 1.0, diffuse, tex_img)
    b.add_sphere((4.0, 2.0, 0.5), 0.8, mirror, grey)
    v0 = np.array([3.0, -2.5, 0.0])
    b.add_triangle(v0, v0 + [0, 1.5, 0.2], v0 + [0, 0.6, 1.8],
                   diffuse, tex_img)
    scene = b.build()
    w, h = 2 * tt.LANE, 2 * tt.TILE_SUB
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    for refmax in (1, 3):
        cfg = RenderConfig(refmax=refmax, backend=HitBackend.BRUTE)
        want = np.asarray(render_hdr(scene, cam, cfg))
        got = np.asarray(render_frame_tiled(scene, cfg, cam))
        mism = (~np.isclose(got, want, rtol=1e-4, atol=1e-5)).any(axis=-1)
        assert mism.mean() < 0.002, (refmax, mism.sum())


def test_render_tiled_partial_tiles():
    """Non-multiple frame sizes: padded lanes are cropped and do not
    disturb valid pixels."""
    scene = _mixed_scene(40)
    w, h = 100, 50
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    cfg = RenderConfig(refmax=2, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg))
    got = np.asarray(render_frame_tiled(scene, cfg, cam))
    assert got.shape == want.shape
    mism = (~np.isclose(got, want, rtol=1e-4, atol=1e-5)).any(axis=-1)
    assert mism.mean() < 0.002, f"{mism.sum()} mismatching pixels"


def test_render_tiled_truncated_packets_resolve_via_rounds(monkeypatch):
    """Tiny packet_c_max forces heavy candidate truncation in PACKET mode:
    the resolution bound keeps every advanced ray exact, marching retry
    rounds make progress, and the whole-table rescue rounds finish
    whatever the truncated rounds could not (diag reports 0 left)."""
    import raytracer_js_tpu.render_tiled as rtl

    monkeypatch.setattr(rtl, "SWEEP_MAX_PRIMS", 0)
    scene = _mixed_scene(120)
    w, h = 2 * tt.LANE, 2 * tt.TILE_SUB
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    cfg = RenderConfig(refmax=3, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg))
    got, diag = render_frame_tiled(scene, cfg, cam, packet_c_max=96,
                                   with_diag=True)
    got = np.asarray(got)
    assert int(diag["unresolved"]) == 0
    mism = (~np.isclose(got, want, rtol=1e-4, atol=1e-5)).any(axis=-1)
    assert mism.mean() < 0.002, f"{mism.sum()} mismatching pixels"


def _ext_scene(trans=False, rough=0.0, n=60, seed=4):
    """Mixed extended-class scene for the tiled glue: ground box, mirrors,
    glass with defined/undefined substances, emissive."""
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((.35, .45, .65)))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True,
                            roughness=rough)
    light = b.add_material(ResponseType.REFLECTION, light=True)
    b.add_box((0, 0, -51.0), 100.0, diffuse, b.add_solid_texture((.6,) * 3))
    rng = np.random.default_rng(seed)
    gs = b.add_substance(1.5) if trans else None
    glass = b.add_material(ResponseType.TRANSMISSION) if trans else None
    for i in range(n):
        c = rng.uniform([3, -4, -0.5], [10, 4, 3])
        r = float(rng.uniform(0.2, 0.5))
        tex = b.add_solid_texture(rng.uniform(0.2, 1, 3))
        if trans and i % 4 == 0:
            b.add_sphere(c, r, glass, tex,
                         substance=gs if i % 8 == 0 else -1)
        else:
            b.add_sphere(c, r, mirror if i % 3 == 0 else diffuse, tex)
    b.add_sphere((6, .5, 5.0), 1.0, light, b.add_solid_texture((1.,) * 3))
    return b.build()


def test_render_tiled_transmission_matches_brute():
    """Transmission on the tiled path: the glue's grid substance query +
    Snell/TIR reproduces the XLA wavefront (near-exact — no RNG)."""
    scene = _ext_scene(trans=True)
    cam = make_camera((0.0, 0.0, 0.5), 128, 64, np.pi / 2, np.pi / 4)
    cfg = RenderConfig(refmax=3, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg))
    got = np.asarray(render_frame_tiled(scene, cfg, cam))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_render_tiled_rough_matches_brute():
    """Roughness on the tiled path: identical counter-RNG streams, so the
    scattered paths match the XLA wavefront up to isolated boundary flips
    (ULP-different reflected inputs at silhouettes)."""
    key = jax.random.key(3)
    scene = _ext_scene(rough=0.5)
    cam = make_camera((0.0, 0.0, 0.5), 128, 64, np.pi / 2, np.pi / 4)
    cfg_b = RenderConfig(refmax=2, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg_b, key=key))
    got = np.asarray(render_frame_tiled(scene, cfg_b, cam, key=key))
    mism = (~np.isclose(got, want, rtol=1e-4, atol=1e-5)).any(axis=-1)
    assert mism.mean() < 0.002, f"{mism.sum()} mismatching pixels"


def test_render_tiled_rough_transmission_combined_with_accel(monkeypatch):
    """Both extensions together, substance query through the octree grid,
    forced onto the PACKET path (glue coverage at the big-scene shape)."""
    from raytracer_js_tpu.accel.octree import build_octree
    from raytracer_js_tpu.config import OctreeConfig
    import raytracer_js_tpu.render_tiled as rtl

    monkeypatch.setattr(rtl, "SWEEP_MAX_PRIMS", 0)

    key = jax.random.key(9)
    scene = _ext_scene(trans=True, rough=0.4)
    accel = build_octree(scene, OctreeConfig(max_depth=4))
    cam = make_camera((0.0, 0.0, 0.5), 128, 64, np.pi / 2, np.pi / 4)
    cfg_b = RenderConfig(refmax=3, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg_b, key=key))
    got = np.asarray(render_frame_tiled(scene, cfg_b, cam, key=key,
                                        accel=accel))
    mism = (~np.isclose(got, want, rtol=1e-4, atol=1e-5)).any(axis=-1)
    assert mism.mean() < 0.002, f"{mism.sum()} mismatching pixels"


def test_render_tiled_sweep_cull_many_spheres(monkeypatch):
    """SWEEP mode with the block-cone tile cull force-enabled (off by
    default — measured slower at config-4 scale, kept opt-in): winners
    map back to global ids, parity with BRUTE holds."""
    import raytracer_js_tpu.render_tiled as rtl

    monkeypatch.setattr(rtl, "SWEEP_CULL", True)
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.35, 0.45, 0.65)))
    diffuse = b.add_material(ResponseType.REFLECTION)
    mirror = b.add_material(ResponseType.REFLECTION, mirror=True)
    rng = np.random.default_rng(11)
    pal = [b.add_solid_texture(rng.uniform(0.2, 1.0, 3)) for _ in range(6)]
    b.add_box((0.0, 0.0, -21.0), 40.0, diffuse, pal[0])
    for i in range(700):
        c = rng.uniform([2.0, -4.0, -0.5], [10.0, 4.0, 4.0], 3)
        b.add_sphere(c, float(rng.uniform(0.05, 0.2)),
                     mirror if i % 3 == 0 else diffuse, pal[i % 6])
    scene = b.build()
    w, h = 2 * tt.LANE, tt.TILE_SUB
    cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
    cfg = RenderConfig(refmax=2, backend=HitBackend.BRUTE)
    want = np.asarray(render_hdr(scene, cam, cfg))
    got, diag = render_frame_tiled(scene, cfg, cam, with_diag=True)
    got = np.asarray(got)
    assert int(diag["unresolved"]) == 0
    mism = (~np.isclose(got, want, rtol=1e-4, atol=1e-5)).any(axis=-1)
    assert mism.mean() < 0.002, f"{mism.sum()} mismatching pixels"
