import time
import jax, jax.numpy as jnp, numpy as np
N = 1<<20; HW = 480*640
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, HW, N))
src1 = jnp.asarray(rng.normal(size=(HW,)), jnp.float32)
src8 = jnp.asarray(rng.normal(size=(HW, 8)), jnp.float32)

def tm(name, f, *a, n=10):
    r = f(*a); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

tm("1 scalar gather", jax.jit(lambda s,i: jnp.take(s,i)), src1, idx)
tm("6 gathers same idx", jax.jit(lambda s,i: sum(jnp.take(s,i+k) for k in range(6))), src1, idx)
tm("9 taps x 6 gathers (w/ +-W)", jax.jit(lambda s,i: sum(jnp.take(s, i+dx+dy*640+c) for dy in (-1,0,1) for dx in (-1,0,1) for c in range(6))), src1, idx)
tm("row gather [HW,8]", jax.jit(lambda s,i: jnp.take(s,i,axis=0)), src8, idx)
tm("9 taps row gather [HW,8]", jax.jit(lambda s,i: sum(jnp.take(s, i+dx+dy*640, axis=0).sum(-1) for dy in (-1,0,1) for dx in (-1,0,1))), src8, idx)
