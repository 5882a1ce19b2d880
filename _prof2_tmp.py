import time, functools
import jax, jax.numpy as jnp, numpy as np
from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import _preprocess, _coarse_intensity
from elasticfusion_tpu.ops.splat import predict_indices, combined_predict
from elasticfusion_tpu.ops.fuse import fuse, clean
from elasticfusion_tpu.ops.odometry import icp_step, compute_rgb_residual, rgb_step, so3_step
from elasticfusion_tpu.surfels import init_map_from_frame, compact
from elasticfusion_tpu.tracking import build_current_frame_pyramids, build_model_pyramids
from elasticfusion_tpu.utils.synthetic import make_scene, render_frame, pose_from_xyzrpy

cam = CameraConfig(); cfg = EngineConfig(camera=cam, max_surfels=1<<20, confidence_threshold=0.3)
scene = make_scene(n_side=1000)
d0, r0 = render_frame(scene[0], scene[1], np.eye(4), cam)
d0, r0 = jnp.asarray(d0), jnp.asarray(r0)
raw0, filt0 = _preprocess(d0, cfg)
m = init_map_from_frame(cfg.max_surfels, raw0, filt0, r0, cam, cfg.depth_cutoff)
I4 = jnp.eye(4, dtype=jnp.float32)
print("live surfels:", int(m.count))

def tm(name, f, n=5):
    r = f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1000:8.1f} ms")
    return r

# --- clean sub-parts ---
pi = jax.jit(lambda m,T,t: predict_indices(m,T,cam,t,cfg.time_delta,cfg.max_depth_processed))(m, I4, jnp.float32(2.0))
jax.block_until_ready(pi)
keepfn = jax.jit(lambda m: (jnp.arange(m.capacity) % 7 != 0))
keep = keepfn(m)
tm("compact alone", lambda: jax.jit(compact)(m, keep))
jclean = jax.jit(lambda m,p,T,t: clean(m,p,T,t,cam,cfg.confidence_threshold,cfg.time_delta,cfg.max_depth_processed,cfg.unstable_age))
tm("clean full", lambda: jclean(m, pi, I4, jnp.float32(2.0)))

# --- track sub-parts ---
vm, nm, im, dp = jax.jit(functools.partial(build_current_frame_pyramids, cfg=cfg))(filt0, r0)
jax.block_until_ready(vm)
tm("build_current_pyramids", lambda: jax.jit(functools.partial(build_current_frame_pyramids, cfg=cfg))(filt0, r0))
cp = jax.jit(lambda m,T: combined_predict(m,T,cam,1.,1.,cfg.time_delta,0.3,cfg.max_depth_processed))(m, I4)
jax.block_until_ready(cp)
tm("build_model_pyramids", lambda: jax.jit(functools.partial(build_model_pyramids, cfg=cfg))(cp.vertex, cp.normal, cp.image, I4))
vg, ng, img_m, dpm = jax.jit(functools.partial(build_model_pyramids, cfg=cfg))(cp.vertex, cp.normal, cp.image, I4)

jicp = jax.jit(lambda T: icp_step(T, vm[0], nm[0], I4, vg[0], ng[0], cam.fx, cam.fy, cam.cx, cam.cy))
tm("icp_step L0 (1 iter)", lambda: jicp(I4), n=10)
K = jnp.array([[cam.fx,0,cam.cx],[0,cam.fy,cam.cy],[0,0,1]], jnp.float32)
jrgbres = jax.jit(lambda: compute_rgb_residual(25.0/ (0.015625), jnp.zeros((480,640)), jnp.zeros((480,640)), dpm[0], dp[0], img_m[0], im[0], jnp.zeros(3), jnp.eye(3)))
tm("compute_rgb_residual L0", lambda: jrgbres(), n=10)
cloud = jax.jit(lambda: jnp.zeros((3,480,640)))()
corres = jrgbres()
jrgbstep = jax.jit(lambda c: rgb_step(c, jnp.float32(1.0), cloud, cam.fx, cam.fy, jnp.zeros((480,640)), jnp.zeros((480,640))))
tm("rgb_step L0", lambda: jrgbstep(corres), n=10)
jso3 = jax.jit(lambda: so3_step(im[2], im[2], jnp.eye(3), jnp.eye(3), K))
tm("so3_step L2 (1 iter)", lambda: jso3(), n=10)

# --- fuse / predict sub-parts ---
jfuse = jax.jit(lambda m,p,T,t: fuse(m,p,T,t,r0,raw0,filt0,cam,cfg.max_depth_processed,1.0))
tm("fuse", lambda: jfuse(m, pi, I4, jnp.float32(2.0)))
tm("predict_indices", lambda: jax.jit(lambda m,T: predict_indices(m,T,cam,2.,cfg.time_delta,cfg.max_depth_processed))(m, I4))
tm("combined_predict", lambda: jax.jit(lambda m,T: combined_predict(m,T,cam,2.,2.,cfg.time_delta,0.3,cfg.max_depth_processed))(m, I4))
