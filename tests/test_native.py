"""Native scenekit (C++ via ctypes) vs NumPy-specification parity."""
import numpy as np
import pytest

from raytracer_js_tpu import native


def _aabbs(n=200, seed=0):
    rng = np.random.default_rng(seed)
    lo = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    hi = lo + rng.uniform(0.01, 1.2, (n, 3)).astype(np.float32)
    return lo, hi


def test_native_builds():
    assert native.available(), "scenekit failed to build (g++ missing?)"


def test_grid_csr_native_matches_numpy():
    lo, hi = _aabbs()
    fine = (np.arange(lo.shape[0]) % 5 != 0)
    root_lo = np.full(3, -4.0, np.float32)
    off_n, ids_n, mpc_n = native.grid_csr(lo, hi, fine, root_lo, 9.0, 4)
    off_p, ids_p, mpc_p = native._grid_csr_numpy(lo, hi, fine, root_lo, 9.0, 4)
    np.testing.assert_array_equal(off_n, off_p)
    np.testing.assert_array_equal(ids_n, ids_p)
    assert mpc_n == mpc_p


def test_covering_levels_native_matches_numpy():
    from raytracer_js_tpu.accel.octree import covering_levels

    lo, hi = _aabbs(100, seed=2)
    root_lo = np.full(3, -4.0)
    out = native.covering_levels_native(lo, hi, root_lo, 9.0, 5)
    assert out is not None
    lv_n, cell_n = out
    lv_p, cell_p = covering_levels(lo.astype(np.float64),
                                   hi.astype(np.float64), root_lo, 9.0, 5)
    np.testing.assert_array_equal(lv_n, lv_p)
    np.testing.assert_array_equal(cell_n, cell_p)


OBJ_TEXT = """# demo
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
f 1 2 3 4
f 1 2 5
f -3 -2 -1
"""


def test_obj_load_roundtrip(tmp_path):
    p = tmp_path / "mesh.obj"
    p.write_text(OBJ_TEXT)
    v_n, f_n = native.load_obj(p)
    v_p, f_p = native._load_obj_python(p)
    np.testing.assert_allclose(v_n, v_p)
    np.testing.assert_array_equal(f_n, f_p)
    assert v_n.shape == (5, 3)
    # quad fan-triangulated: (0,1,2), (0,2,3); tri (0,1,4); negative idx tri
    assert f_n.shape == (4, 3)
    np.testing.assert_array_equal(f_n[0], [0, 1, 2])
    np.testing.assert_array_equal(f_n[1], [0, 2, 3])
    np.testing.assert_array_equal(f_n[2], [0, 1, 4])
    np.testing.assert_array_equal(f_n[3], [2, 3, 4])


def test_obj_into_scene(tmp_path):
    from raytracer_js_tpu import ResponseType, SceneBuilder

    p = tmp_path / "mesh.obj"
    p.write_text(OBJ_TEXT)
    v, f = native.load_obj(p)
    b = SceneBuilder()
    b.set_sky(b.add_solid_texture((0.1, 0.1, 0.1)))
    m = b.add_material(ResponseType.REFLECTION)
    b.add_mesh(v, f, m, b.add_solid_texture((1, 0, 0)))
    scene = b.build()
    assert scene.n_tris == 4
