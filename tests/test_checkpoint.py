"""Checkpoint/resume tests: bit-exact fit resumption."""
import jax
import jax.numpy as jnp
import numpy as np

from raytracer_js_tpu import RenderConfig, ResponseType, SceneBuilder, make_camera
from raytracer_js_tpu.optim import FitConfig, fit
from raytracer_js_tpu.utils import checkpoint as ckpt

from test_fit import _scene, _targets


def test_pytree_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6.0).reshape(2, 3),
            "b": (jnp.zeros(4, jnp.int32), jnp.ones(())),
            "c": [jnp.asarray(2.5)]}
    p = ckpt.save(tmp_path / "x", tree, step=7, meta={"k": "v"})
    out, step, meta = ckpt.restore(p, tree)
    assert step == 7 and meta == {"k": "v"}
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_rejects_wrong_structure(tmp_path):
    p = ckpt.save(tmp_path / "x", {"a": jnp.zeros(3)})
    try:
        ckpt.restore(p, {"a": jnp.zeros(3), "b": jnp.zeros(2)})
        assert False, "expected structure mismatch"
    except ValueError:
        pass


def test_latest(tmp_path):
    for s in (5, 20, 10):
        ckpt.save(tmp_path / f"ckpt_{s}", {"a": jnp.zeros(1)}, step=s)
    newest = ckpt.latest(tmp_path)
    assert newest is not None and newest.stem == "ckpt_20"


def test_fit_resume_bit_exact(tmp_path):
    """A fit killed at step 4 and resumed must land exactly where an
    uninterrupted 8-step fit lands."""
    cfg = RenderConfig(refmax=1)
    cams = [make_camera((0, 0, 0), 8, 8, np.pi / 2, np.pi / 2)]
    key = jax.random.key(3)
    targets = _targets(_scene((0.9, 0.2, 0.1)), cams, cfg, key)
    start = _scene((0.5, 0.5, 0.5))

    full = fit(start, cfg, cams, targets, FitConfig(steps=8, lr=1e-2),
               key=key)

    d = tmp_path / "ck"
    fit(start, cfg, cams, targets,
        FitConfig(steps=4, lr=1e-2, save_every=4, ckpt_dir=str(d)), key=key)
    resumed = fit(start, cfg, cams, targets,
                  FitConfig(steps=8, lr=1e-2, save_every=4, ckpt_dir=str(d)),
                  key=key)
    np.testing.assert_allclose(
        np.asarray(resumed.scene.textures.solid_rgb),
        np.asarray(full.scene.textures.solid_rgb), rtol=0, atol=0)
    assert resumed.losses == full.losses[4:]
