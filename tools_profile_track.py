#!/usr/bin/env python
"""Breakdown of the tracking solve on the real chip: pyramid builds, the SO3
pre-align, per-level GN iteration cost (icp / rgb split).  Companion to
tools_profile.py; run on the TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import Engine, _preprocess, _track
from elasticfusion_tpu.ops.odometry import (
    compute_rgb_residual, icp_prev_table, icp_step, project_to_point_cloud,
    rgb_last_table, rgb_static_gates, rgb_step,
)
from elasticfusion_tpu.ops.preprocess import SOBEL_SCALE, compute_derivatives
from elasticfusion_tpu.tracking import (
    _so3_prealign, build_current_frame_pyramids, build_model_pyramids,
    get_incremental_transformation, OdometryInputs,
)
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


def timeit(name, fn, n=20):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    cam = CameraConfig()
    cfg = EngineConfig(camera=cam, max_surfels=1 << 21,
                       confidence_threshold=0.3, closeLoops=False)
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

    depth_d = jnp.asarray(frames[4][0])
    rgb_d = jnp.asarray(frames[4][1])
    T_dev = jnp.asarray(eng.T_wc, jnp.float32)
    raw_m, filt_m = _preprocess(depth_d, cfg)
    jax.block_until_ready((raw_m, filt_m))

    timeit("_track (whole)", lambda: _track(
        eng._pred.vertex, eng._pred.normal, eng._pred.image,
        filt_m, rgb_d, eng._so3_hist, T_dev, cfg, False))

    bcur = jax.jit(lambda d, r: build_current_frame_pyramids(d, r, cfg))
    bmod = jax.jit(lambda v, n, i, T: build_model_pyramids(v, n, i, T, cfg))
    timeit("build_current_frame_pyramids", lambda: bcur(filt_m, rgb_d))
    timeit("build_model_pyramids", lambda: bmod(
        eng._pred.vertex, eng._pred.normal, eng._pred.image, T_dev))

    vc, nc, ic, dc = bcur(filt_m, rgb_d)
    vg, ng, im, dm = bmod(eng._pred.vertex, eng._pred.normal, eng._pred.image, T_dev)
    jax.block_until_ready((vc, vg))

    so3 = jax.jit(lambda a, b: _so3_prealign(cam, a, b, cfg.so3_iterations))
    timeit("so3_prealign (10 iters w/ exits)", lambda: so3(eng._so3_hist, ic[2]))

    inputs = OdometryInputs(
        vmaps_curr=vc, nmaps_curr=nc, vmaps_prev_g=vg, nmaps_prev_g=ng,
        last_images=im, next_images=ic, last_depths=dm, next_depths=dc,
        so3_last_image=eng._so3_hist, T_prev=T_dev)
    timeit("get_incremental_transformation", lambda:
           get_incremental_transformation(inputs, cfg))
    nos = cfg.with_(so3=False)
    timeit("  same, so3=False", lambda:
           get_incremental_transformation(inputs, nos))
    noee = cfg.with_(so3=False, gn_early_exit=0.0)
    timeit("  same, no early exit (full 10/5/4)", lambda:
           get_incremental_transformation(inputs, noee))

    # single GN iteration pieces at each level
    for lvl in range(3):
        c = cam.scaled(lvl)
        mg = cfg.rgb_grad_thresholds[lvl] / (SOBEL_SCALE * SOBEL_SCALE)

        def one_icp(lvl=lvl, c=c):
            tbl = icp_prev_table(vg[lvl], ng[lvl])
            return icp_step(T_dev, vc[lvl], nc[lvl], T_dev, vg[lvl], ng[lvl],
                            c.fx, c.fy, c.cx, c.cy,
                            cfg.dist_threshold, cfg.angle_threshold_sin,
                            prev_table=tbl)
        timeit(f"  icp_step lvl{lvl} (incl table pack)", jax.jit(one_icp))

        def one_rgb(lvl=lvl, c=c, mg=mg):
            dIdx, dIdy = compute_derivatives(ic[lvl])
            cloud = project_to_point_cloud(dm[lvl], c.fx, c.fy, c.cx, c.cy)
            tbl = rgb_last_table(dm[lvl], im[lvl], cloud)
            gates = rgb_static_gates(mg, dIdx, dIdy, dc[lvl], ic[lvl])
            corres = compute_rgb_residual(
                mg, dIdx, dIdy, dm[lvl], dc[lvl], im[lvl], ic[lvl],
                jnp.zeros(3), jnp.eye(3), last_table=tbl, static_gates=gates)
            return rgb_step(corres, jnp.sqrt(jnp.maximum(corres.count, 1.0)),
                            cloud, c.fx, c.fy, dIdx, dIdy)
        timeit(f"  rgb resid+step lvl{lvl} (incl tables)", jax.jit(one_rgb))


if __name__ == "__main__":
    main()
