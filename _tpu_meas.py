import os, time, json, functools
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import _preprocess, _coarse_intensity, slam_step
from elasticfusion_tpu.ops.splat import predict_indices, combined_predict
from elasticfusion_tpu.ops import fuse as fuse_mod
from elasticfusion_tpu.surfels import init_map_from_frame, compact
from elasticfusion_tpu.utils.synthetic import make_scene, render_frame, pose_from_xyzrpy
print("imports done", flush=True)

cam = CameraConfig(); cfg = EngineConfig(camera=cam, max_surfels=1<<20, confidence_threshold=0.3)
scene = make_scene(n_side=1000)
frames = []
for i in range(13):
    T = pose_from_xyzrpy(x=0.01*i, yaw=0.004*i, z=0.004*i)
    d, r = render_frame(scene[0], scene[1], T, cam)
    frames.append((jnp.asarray(d), jnp.asarray(r)))
print("frames rendered", flush=True)

d0, r0 = frames[0]
raw0, filt0 = _preprocess(d0, cfg)
m = init_map_from_frame(1<<20, raw0, filt0, r0, cam, cfg.depth_cutoff)
jax.block_until_ready(m.pos)
print("map init, live:", int(m.count), flush=True)

def tm(name, f, n=5):
    r = f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)
    return r

I4 = jnp.eye(4, dtype=jnp.float32)
pi = jax.jit(lambda m,T,t: predict_indices(m,T,cam,t,cfg.time_delta,cfg.max_depth_processed))(m, I4, jnp.float32(2.0))
jax.block_until_ready(pi.index); print("pi done", flush=True)

# === clean bisect (monkeypatching the window weights) ===
jclean = jax.jit(lambda m,p,T,t: fuse_mod.clean(m,p,T,t,cam,cfg.confidence_threshold,cfg.time_delta,cfg.max_depth_processed,cfg.unstable_age))
tm("clean 3x3 window", lambda: jclean(m, pi, I4, jnp.float32(2.0)))
fuse_mod._W3 = (4.0,)
jclean1 = jax.jit(lambda m,p,T,t: fuse_mod.clean(m,p,T,t,cam,cfg.confidence_threshold,cfg.time_delta,cfg.max_depth_processed,cfg.unstable_age))
tm("clean 1x1 window", lambda: jclean1(m, pi, I4, jnp.float32(2.0)))
fuse_mod._W3 = ()
jclean0 = jax.jit(lambda m,p,T,t: fuse_mod.clean(m,p,T,t,cam,cfg.confidence_threshold,cfg.time_delta,cfg.max_depth_processed,cfg.unstable_age))
tm("clean 0 window", lambda: jclean0(m, pi, I4, jnp.float32(2.0)))
fuse_mod._W3 = (1.0, 2.0, 1.0)

# === full step fps (bucketed size 1<<20) ===
so3 = _coarse_intensity(r0, cfg)
cp = jax.jit(lambda m,T: combined_predict(m,T,cam,1.,1.,cfg.time_delta,cfg.confidence_threshold,cfg.max_depth_processed))(m, I4)
T = I4; fill = (cp.vertex, cp.normal, cp.image)
def step(m, T, so3, fill, fr, tick):
    d, r = fr
    return slam_step(m, T, so3, fill[0], fill[1], fill[2], d, r, jnp.float32(tick), jnp.float32(1.0), cfg=cfg)
for i in range(3):
    m, T, so3, fill, cp_, dense, res = step(m, T, so3, fill, frames[i+1], i+2)
jax.block_until_ready(m.pos)
t0 = time.perf_counter()
for i in range(3, 12):
    m, T, so3, fill, cp_, dense, res = step(m, T, so3, fill, frames[i+1], i+2)
jax.block_until_ready(m.pos)
dt = (time.perf_counter()-t0)/9
print(f"slam_step: {dt*1000:.1f} ms/frame = {1/dt:.2f} fps", flush=True)
