import time, sys, functools
import jax, jax.numpy as jnp, numpy as np
from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.surfels import empty_map, compact
print("start", flush=True)
cap = 1<<20
m = empty_map(cap)._replace(count=jnp.int32(300000))
keep = jnp.arange(cap) % 7 != 0
t0=time.perf_counter()
r = jax.jit(compact)(m, keep); jax.block_until_ready(r)
print(f"compact compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(5):
    r = jax.jit(compact)(m, keep)
jax.block_until_ready(r)
print(f"compact steady: {(time.perf_counter()-t0)/5*1000:.1f} ms", flush=True)
