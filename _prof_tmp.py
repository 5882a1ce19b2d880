import time, functools
import jax, jax.numpy as jnp, numpy as np
from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import _preprocess, _track, _coarse_intensity
from elasticfusion_tpu.ops.splat import predict_indices, combined_predict
from elasticfusion_tpu.ops.fuse import fuse, clean
from elasticfusion_tpu.surfels import init_map_from_frame
from elasticfusion_tpu.utils.synthetic import make_scene, render_frame, pose_from_xyzrpy

cam = CameraConfig(); cfg = EngineConfig(camera=cam, max_surfels=1<<20, confidence_threshold=0.3)
scene = make_scene(n_side=1000)
d0, r0 = render_frame(scene[0], scene[1], np.eye(4), cam)
d1, r1 = render_frame(scene[0], scene[1], pose_from_xyzrpy(x=0.01), cam)
d0, r0, d1, r1 = map(jnp.asarray, (d0, r0, d1, r1))
raw0, filt0 = _preprocess(d0, cfg)
m = init_map_from_frame(cfg.max_surfels, raw0, filt0, r0, cam, cfg.depth_cutoff)
so3 = _coarse_intensity(r0, cfg)
I4 = jnp.eye(4, dtype=jnp.float32)

jpred_idx = jax.jit(lambda m, T, t: predict_indices(m, T, cam, t, cfg.time_delta, cfg.max_depth_processed))
jcp = jax.jit(lambda m, T, t: combined_predict(m, T, cam, t, t, cfg.time_delta, cfg.confidence_threshold, cfg.max_depth_processed))
jfuse = jax.jit(lambda m, p, T, t, rgb, raw, filt: fuse(m, p, T, t, rgb, raw, filt, cam, cfg.max_depth_processed, 1.0))
jclean = jax.jit(lambda m, p, T, t: clean(m, p, T, t, cam, cfg.confidence_threshold, cfg.time_delta, cfg.max_depth_processed, cfg.unstable_age))

raw1, filt1 = _preprocess(d1, cfg)
cp = jcp(m, I4, jnp.float32(1.0))

def tm(name, f, n=5):
    r = f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    print(f"{name:18s} {(time.perf_counter()-t0)/n*1000:8.1f} ms")
    return r

tm("preprocess", lambda: _preprocess(d1, cfg))
tm("track", lambda: _track(cp.vertex, cp.normal, cp.image, filt1, r1, so3, I4, cfg, False))
pi = tm("predict_indices", lambda: jpred_idx(m, I4, jnp.float32(2.0)))
mf = tm("fuse", lambda: jfuse(m, pi, I4, jnp.float32(2.0), r1, raw1, filt1))[0]
tm("clean", lambda: jclean(mf, pi, I4, jnp.float32(2.0)))
tm("combined_predict", lambda: jcp(m, I4, jnp.float32(2.0)))
