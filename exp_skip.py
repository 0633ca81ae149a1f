import json, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import numpy as np, jax
from bench import build_scene, _time_sustained
from raytracer_js_tpu import RenderConfig, make_camera, render_hdr
from raytracer_js_tpu.config import HitBackend
w, h = 1920, 1088
scene = build_scene(50)
cam = make_camera((0.0, 0.0, 0.5), w, h, np.pi / 2, np.pi / 2 * h / w)
for refmax in (2, 4):
    cfg = RenderConfig(refmax=refmax, backend=HitBackend.FUSED)
    fn = jax.jit(lambda s, cfg=cfg: render_hdr(s, cam, cfg))
    img = jax.block_until_ready(fn(scene))
    assert np.isfinite(np.asarray(img)).all()
    dt, _ = _time_sustained(fn, scene, burst=16)
    print(json.dumps({"refmax": refmax, "ms": dt * 1e3,
                      "mrays_s": w * h / dt / 1e6}), flush=True)
