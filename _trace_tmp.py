import glob
import gzip
import json
import os
import time
from collections import defaultdict

os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/repo/.jax_cache"
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import _preprocess, _coarse_intensity, _track
from elasticfusion_tpu.ops.splat import combined_predict, predict_indices
from elasticfusion_tpu.ops import fuse as fuse_mod
from elasticfusion_tpu.surfels import init_map_from_frame
from elasticfusion_tpu.utils.synthetic import make_scene, render_frame, pose_from_xyzrpy

print("setup", flush=True)
cam = CameraConfig()
cfg = EngineConfig(camera=cam, max_surfels=1 << 20, confidence_threshold=0.3)
scene = make_scene(n_side=1000)
d0, r0 = render_frame(scene[0], scene[1], np.eye(4), cam)
d1, r1 = render_frame(scene[0], scene[1], pose_from_xyzrpy(x=0.01), cam)
d0, r0, d1, r1 = map(jnp.asarray, (d0, r0, d1, r1))
raw0, filt0 = _preprocess(d0, cfg)
raw1, filt1 = _preprocess(d1, cfg)
m = init_map_from_frame(1 << 20, raw0, filt0, r0, cam, cfg.depth_cutoff)
I4 = jnp.eye(4, dtype=jnp.float32)
so3 = _coarse_intensity(r0, cfg)
cp = jax.jit(lambda m, T: combined_predict(m, T, cam, 1.0, 1.0, cfg.time_delta, 0.3, cfg.max_depth_processed))(m, I4)
pi = jax.jit(lambda m, T: predict_indices(m, T, cam, 2.0, cfg.time_delta, cfg.max_depth_processed))(m, I4)
jclean = jax.jit(lambda m, p, T, t: fuse_mod.clean(m, p, T, t, cam, cfg.confidence_threshold, cfg.time_delta, cfg.max_depth_processed, cfg.unstable_age))
jfuse = jax.jit(lambda m, p, T, t: fuse_mod.fuse(m, p, T, t, r1, raw1, filt1, cam, cfg.max_depth_processed, 1.0))

def warm(f):
    r = f()
    jax.block_until_ready(r)
    return r

warm(lambda: _track(cp.vertex, cp.normal, cp.image, filt1, r1, so3, I4, cfg, False))
warm(lambda: jclean(m, pi, I4, jnp.float32(2.0)))
warm(lambda: jfuse(m, pi, I4, jnp.float32(2.0)))
print("warm done", flush=True)

TRACE = "/tmp/efv/trace"
with jax.profiler.trace(TRACE):
    for _ in range(3):
        r = _track(cp.vertex, cp.normal, cp.image, filt1, r1, so3, I4, cfg, False)
    jax.block_until_ready(r)
    for _ in range(3):
        r = jclean(m, pi, I4, jnp.float32(2.0))
    jax.block_until_ready(r)
    for _ in range(3):
        r = jfuse(m, pi, I4, jnp.float32(2.0))
    jax.block_until_ready(r)
print("trace captured", flush=True)

# summarize: sum durations by event name from the perfetto trace
files = glob.glob(TRACE + "/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
agg = defaultdict(float)
for fn in files:
    with gzip.open(fn, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            # keep device-lane events only (pid names include TPU)
            agg[ev.get("name", "?")] += ev["dur"]
items = sorted(agg.items(), key=lambda kv: -kv[1])
for name, us in items[:45]:
    print(f"{us/1000/3:9.2f} ms  {name[:110]}", flush=True)
