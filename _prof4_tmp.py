import time, functools
import jax, jax.numpy as jnp, numpy as np
from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import _preprocess
from elasticfusion_tpu.ops.splat import predict_indices
from elasticfusion_tpu.ops import fuse as fuse_mod
from elasticfusion_tpu.surfels import init_map_from_frame, compact
from elasticfusion_tpu.utils.synthetic import make_scene, render_frame
print("setup", flush=True)
cam = CameraConfig(); cfg = EngineConfig(camera=cam, max_surfels=1<<20, confidence_threshold=0.3)
scene = make_scene(n_side=800)
d0, r0 = render_frame(scene[0], scene[1], np.eye(4), cam)
raw0, filt0 = _preprocess(jnp.asarray(d0), cfg)
m = init_map_from_frame(cfg.max_surfels, raw0, filt0, jnp.asarray(r0), cam, cfg.depth_cutoff)
I4 = jnp.eye(4, dtype=jnp.float32)
pi = jax.jit(lambda m,T,t: predict_indices(m,T,cam,t,cfg.time_delta,cfg.max_depth_processed))(m, I4, jnp.float32(2.0))
jax.block_until_ready(pi)
print("live:", int(m.count), flush=True)

def tm(name, f, n=5):
    r = f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

jclean = jax.jit(lambda m,p,T,t: fuse_mod.clean(m,p,T,t,cam,cfg.confidence_threshold,cfg.time_delta,cfg.max_depth_processed,cfg.unstable_age))
tm("clean full", lambda: jclean(m, pi, I4, jnp.float32(2.0)))

# clean without the window loop: monkeypatch _W3 to single zero tap? simpler:
# time a synthetic variant = projection + masks + compact only
@jax.jit
def clean_nowin(m, T_wc, tick):
    cap = m.capacity
    T_cw_R = T_wc[:3,:3].T; t = T_wc[:3,3]
    lp = T_cw_R @ (m.pos - t[:,None])
    keep = ~(((tick - m.last_t) > 20) & (m.conf < 10.0))
    keep |= (m.last_t > 0) & ((tick - m.last_t) > 200)
    return compact(m, keep)
tm("proj+mask+compact only", lambda: clean_nowin(m, I4, jnp.float32(2.0)))

# one window tap in isolation
@jax.jit
def one_tap(m, p, T_wc):
    cap = m.capacity
    H, W = cam.height, cam.width
    T_cw_R = T_wc[:3,:3].T; t = T_wc[:3,3]
    lp = T_cw_R @ (m.pos - t[:,None])
    sz = jnp.where(jnp.abs(lp[2])>1e-12, lp[2], 1.0)
    px = jnp.round(lp[0]*cam.fx/sz + cam.cx).astype(jnp.int32)
    py = jnp.round(lp[1]*cam.fy/sz + cam.cy).astype(jnp.int32)
    flat = jnp.clip(py,0,H-1)*W + jnp.clip(px,0,W-1)
    acc = jnp.zeros((cap,))
    vert_flat = p.vert.reshape(3,-1); conf_flat = p.conf.reshape(-1)
    for k in range(9):
        cz = jnp.take(vert_flat[2], flat)
        cc = jnp.take(conf_flat, flat)
        acc += jnp.where((cz > lp[2]) & (cc > 10.0), 1.0, 0.0)
    return acc
tm("9x 2-gather taps", lambda: one_tap(m, pi, I4))

fuse_mod._W3 = ()   # empty window loop -> isolates the rest of clean
jclean2 = jax.jit(lambda m,p,T,t: fuse_mod.clean(m,p,T,t,cam,cfg.confidence_threshold,cfg.time_delta,cfg.max_depth_processed,cfg.unstable_age))
tm("clean without window loop", lambda: jclean2(m, pi, I4, jnp.float32(2.0)))
