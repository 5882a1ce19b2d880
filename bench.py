#!/usr/bin/env python
"""Headline benchmark: full SLAM frames/second per chip at sensor resolution
(640x480), against the reference's 30 Hz real-time requirement
(BASELINE.md: README.md:116-118, frame budget 33.3 ms MainController.cpp:249).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from elasticfusion_tpu.config import CameraConfig, EngineConfig
    from elasticfusion_tpu.engine import _coarse_intensity, _preprocess, slam_step
    from elasticfusion_tpu.ops.splat import combined_predict
    from elasticfusion_tpu.surfels import init_map_from_frame
    from elasticfusion_tpu.utils.synthetic import (
        make_scene,
        pose_from_xyzrpy,
        render_frame,
    )

    cam = CameraConfig()  # 640x480, fx=fy=528
    cfg = EngineConfig(
        camera=cam, max_surfels=1 << 20, confidence_threshold=0.3
    )

    # pre-render a camera sweep on the host (log decode is not the metric)
    scene = make_scene(n_side=1400)
    n_warm, n_bench = 3, 20
    frames = []
    for i in range(n_warm + n_bench):
        T = pose_from_xyzrpy(x=0.01 * i, yaw=0.004 * i, z=0.004 * i)
        depth_mm, rgb = render_frame(scene[0], scene[1], T, cam)
        frames.append((jnp.asarray(depth_mm), jnp.asarray(rgb)))

    # bootstrap: frame 0 initialises the map (as Engine.process_frame tick 1)
    d0, r0 = frames[0]
    raw0, filt0 = _preprocess(d0, cfg)
    m = init_map_from_frame(cfg.max_surfels, raw0, filt0, r0, cam, cfg.depth_cutoff)
    so3 = _coarse_intensity(r0, cfg)
    pred = combined_predict(
        m, jnp.eye(4, dtype=jnp.float32), cam, jnp.float32(1.0), jnp.float32(1.0),
        cfg.time_delta, cfg.confidence_threshold, cfg.max_depth_processed,
    )
    T = jnp.eye(4, dtype=jnp.float32)
    fill = (pred.vertex, pred.normal, pred.image)

    def step(m, T, so3, fill, frame, tick):
        d, r = frame
        return slam_step(
            m, T, so3, fill[0], fill[1], fill[2], d, r,
            jnp.float32(tick), jnp.float32(1.0), cfg=cfg,
        )

    # warmup (compile)
    for i in range(n_warm):
        m, T, so3, fill, pred, dense, res = step(m, T, so3, fill, frames[i + 1], i + 2)
    jax.block_until_ready(m.pos)

    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_bench - 1):
        m, T, so3, fill, pred, dense, res = step(m, T, so3, fill, frames[i + 1], i + 2)
    jax.block_until_ready(m.pos)
    dt = time.perf_counter() - t0

    fps = (n_bench - 1) / dt
    print(
        json.dumps(
            {
                "metric": "slam_frames_per_second_640x480",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
