#!/usr/bin/env python
"""Per-program breakdown of a SLAM frame on the real chip.

Builds a realistic engine state (a few warmup frames), then times each jitted
device program in isolation with block_until_ready.  Run on the TPU chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import Engine, _frame_main, _preprocess, _track
from elasticfusion_tpu.ops.fuse import clean, fuse
from elasticfusion_tpu.ops.fillin import fill_all
from elasticfusion_tpu.ops.splat import combined_predict, predict_indices
from elasticfusion_tpu.surfels import compact
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


def timeit(name, fn, n=10):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:38s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    cam = CameraConfig()
    cfg = EngineConfig(camera=cam, max_surfels=1 << 21,
                       confidence_threshold=0.3, closeLoops=True)
    eng = Engine(cfg)
    scene = make_scene(n_side=1400)
    frames = []
    for i in range(5):
        T = pose_from_xyzrpy(x=0.008 * i, yaw=0.003 * i, z=0.002 * i)
        frames.append(render_frame(scene[0], scene[1], T, cam))
    for i in range(4):
        d, r = frames[i]
        eng.process_frame(r, d, timestamp=i)
    eng.flush()

    m = eng.map
    print(f"map capacity={m.capacity} count={int(m.count)}", flush=True)
    depth_d = jnp.asarray(frames[4][0])
    rgb_d = jnp.asarray(frames[4][1])
    T_dev = jnp.asarray(eng.T_wc, jnp.float32)
    tick = jnp.float32(eng.tick)
    raw_m, filt_m = _preprocess(depth_d, cfg)
    jax.block_until_ready((raw_m, filt_m))
    ff, fr = eng._fern_tables()
    dbc, dbg, dbt, dbn = eng._fern_db()

    def run_main():
        mm = jax.tree.map(lambda x: x + 0, m)
        return _frame_main(
            mm, T_dev, eng._so3_hist,
            eng._pred.vertex, eng._pred.normal, eng._pred.image,
            eng._fill[0], eng._fill[1], eng._fill[2],
            eng._dense_dev, depth_d, rgb_d,
            tick, tick, jnp.bool_(False), jnp.float32(1.0), ff, fr,
            dbc, dbg, dbt, dbn, cfg)
    timeit("_frame_main (whole frame) +copy", run_main, n=5)

    timeit("preprocess", lambda: _preprocess(depth_d, cfg))
    timeit("_track", lambda: _track(
        eng._pred.vertex, eng._pred.normal, eng._pred.image,
        filt_m, rgb_d, eng._so3_hist, T_dev, cfg, False))
    pi_j = jax.jit(lambda m, T, t: predict_indices(
        m, T, cam, t, cfg.time_delta, cfg.max_depth_processed))
    pred_idx = pi_j(m, T_dev, tick)
    jax.block_until_ready(pred_idx)
    timeit("predict_indices", lambda: pi_j(m, T_dev, tick))
    fuse_j = jax.jit(lambda m, p, T, t: fuse(
        m, p, T, t, rgb_d, raw_m, filt_m, cam, cfg.max_depth_processed,
        jnp.float32(1.0)))
    timeit("fuse", lambda: fuse_j(m, pred_idx, T_dev, tick))
    clean_j = jax.jit(lambda m, p, T, t: clean(
        m, p, T, t, cam, cfg.confidence_threshold, cfg.time_delta,
        cfg.max_depth_processed, cfg.unstable_age))
    timeit("clean (incl compact)", lambda: clean_j(m, pred_idx, T_dev, tick))
    cp_j = jax.jit(lambda m, T, t: combined_predict(
        m, T, cam, t, t, cfg.time_delta, cfg.confidence_threshold,
        cfg.max_depth_processed))
    pred = cp_j(m, T_dev, tick)
    jax.block_until_ready(pred)
    timeit("combined_predict (pallas)", lambda: cp_j(m, T_dev, tick))
    fi_j = jax.jit(lambda p: fill_all(
        p, filt_m, rgb_d, cam, cfg.max_depth_processed, jnp.bool_(False), False))
    timeit("fill_all", lambda: fi_j(pred))
    comp_j = jax.jit(lambda m: compact(m, m.conf >= 0))
    timeit("compact", lambda: comp_j(m))


if __name__ == "__main__":
    main()
