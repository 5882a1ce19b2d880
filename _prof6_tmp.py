import time
import jax, jax.numpy as jnp, numpy as np
from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import _preprocess
from elasticfusion_tpu.ops.splat import predict_indices
from elasticfusion_tpu.surfels import init_map_from_frame, compact
from elasticfusion_tpu.utils.synthetic import make_scene, render_frame
cam = CameraConfig(); cfg = EngineConfig(camera=cam, max_surfels=1<<20, confidence_threshold=0.3)
scene = make_scene(n_side=800)
d0, r0 = render_frame(scene[0], scene[1], np.eye(4), cam)
raw0, filt0 = _preprocess(jnp.asarray(d0), cfg)
m = init_map_from_frame(cfg.max_surfels, raw0, filt0, jnp.asarray(r0), cam, cfg.depth_cutoff)
I4 = jnp.eye(4, dtype=jnp.float32)
pi = jax.jit(lambda m,T,t: predict_indices(m,T,cam,t,cfg.time_delta,cfg.max_depth_processed))(m, I4, jnp.float32(2.0))
jax.block_until_ready(pi)
print("live:", int(m.count), flush=True)
H, W = cam.height, cam.width
_W3 = (1.0, 2.0, 1.0)

def make_variant(level):
    def fn(m, pred, T_wc, tick):
        cap = m.capacity
        T_cw_R = T_wc[:3,:3].T; t = T_wc[:3,3]
        lp = T_cw_R @ (m.pos - t[:,None])
        ln = T_cw_R @ m.normal
        ln = ln / jnp.maximum(jnp.sqrt(jnp.sum(ln*ln,axis=0,keepdims=True)),1e-12)
        sz = jnp.where(jnp.abs(lp[2])>1e-12, lp[2], 1.0)
        x = lp[0]*cam.fx/sz + cam.cx; y = lp[1]*cam.fy/sz + cam.cy
        px = jnp.round(x).astype(jnp.int32); py = jnp.round(y).astype(jnp.int32)
        in_view = ((tick - m.last_t) < 200) & (lp[2] > 0) & (x>0)&(y>0)&(x<W)&(y<H)
        count = jnp.zeros((cap,)); zcount = jnp.zeros((cap,))
        iflat = pred.index.reshape(-1); vflat = pred.vert.reshape(3,-1)
        cflat = pred.conf.reshape(-1); itf = pred.init_t.reshape(-1); ltf = pred.last_t.reshape(-1)
        for iy, wy in zip((-1,0,1), _W3):
            for ix, wx in zip((-1,0,1), _W3):
                w = wx*wy
                qx = px+ix; qy = py+iy
                inb = (qx>=0)&(qx<W)&(qy>=0)&(qy<H)
                flat = jnp.clip(qy,0,H-1)*W + jnp.clip(qx,0,W-1)
                cand = jnp.where(inb, jnp.take(iflat, flat), -1)
                has = (cand>=0) & in_view
                c_z = jnp.take(vflat[2], flat); c_x = jnp.take(vflat[0], flat); c_y = jnp.take(vflat[1], flat)
                c_conf = jnp.take(cflat, flat); c_it = jnp.take(itf, flat); c_lt = jnp.take(ltf, flat)
                if level == 0:  # gathers only
                    count = count + w*(c_z + c_x + c_y + c_conf + c_it + c_lt + cand)
                    continue
                stable = c_conf > 10.0; behind = c_z > lp[2]; dz = c_z - lp[2]
                dxy = jnp.sqrt((c_x-lp[0])**2 + (c_y-lp[1])**2)
                if level == 1:  # predicates, only count
                    count += jnp.where(has & (c_it < m.init_t) & stable & behind & (dz<0.01) & (dxy < m.radius*1.4), w, 0.0)
                    continue
                count += jnp.where(has & (c_it < m.init_t) & stable & behind & (dz<0.01) & (dxy < m.radius*1.4), w, 0.0)
                zcount += jnp.where(has & (c_lt==tick) & stable & behind & (dz>0.01) & (jnp.abs(ln[2])>0.85), w, 0.0)
        keep = ~((count>8.)|(zcount>4.))
        keep &= ~(((tick-m.last_t)>20)&(m.conf<10.))
        keep |= (m.last_t>0)&((tick-m.last_t)>200)
        return compact(m, keep)
    return jax.jit(fn)

def tm(name, f, n=5):
    r = f(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f()
    jax.block_until_ready(r)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.1f} ms", flush=True)

for lvl, name in [(0,"gathers only"), (1,"pred+count"), (2,"full body")]:
    v = make_variant(lvl)
    tm(f"clean variant: {name}", lambda v=v: v(m, pi, I4, jnp.float32(2.0)))
