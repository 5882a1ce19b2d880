"""End-to-end odometry: recover a known SE(3) motion between two synthetic
renders (SURVEY.md §4's closed-form-scene strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.ops.preprocess import metricise_depth, compute_vmap, compute_nmap
from elasticfusion_tpu.tracking import (
    OdometryInputs,
    build_current_frame_pyramids,
    build_model_pyramids,
    get_incremental_transformation,
)
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


def _frame_inputs(scene, cfg, T0, T1):
    pts, cols = scene
    cam = cfg.camera
    d0_mm, rgb0 = render_frame(pts, cols, T0, cam)
    d1_mm, rgb1 = render_frame(pts, cols, T1, cam)

    depth0 = metricise_depth(jnp.array(d0_mm.astype(np.float32)), cfg.max_depth_processed)
    depth1 = metricise_depth(jnp.array(d1_mm.astype(np.float32)), cfg.max_depth_processed)

    # current frame (frame 1): raw-depth pyramids
    vmaps1, nmaps1, images1, _ = build_current_frame_pyramids(
        depth1, jnp.array(rgb1), cfg
    )
    # "model" side = frame 0 (T_prev = T0); mirrors initICPModel/initRGBModel
    pred_vmap = compute_vmap(depth0, cam, cfg.max_depth_processed)
    pred_nmap = compute_nmap(pred_vmap)
    vmaps_g, nmaps_g, images0, depths0 = build_model_pyramids(
        pred_vmap, pred_nmap, jnp.array(rgb0), jnp.array(T0, dtype=jnp.float32), cfg
    )

    # next_depths: in frame-to-model mode the reference derives these from the
    # *prediction* (vmaps_tmp quirk, RGBDOdometry.cpp:240-244) — same here.
    _, _, images0_cur, _ = build_current_frame_pyramids(depth0, jnp.array(rgb0), cfg)

    return OdometryInputs(
        vmaps_curr=vmaps1,
        nmaps_curr=nmaps1,
        vmaps_prev_g=vmaps_g,
        nmaps_prev_g=nmaps_g,
        last_images=images0,
        next_images=images1,
        last_depths=depths0,
        next_depths=depths0,
        so3_last_image=images0_cur[2],
        T_prev=jnp.array(T0, dtype=jnp.float32),
    )


def _pose_errors(T_est, T_true):
    T_est = np.asarray(T_est, dtype=np.float64)
    dt = np.linalg.norm(T_est[:3, 3] - T_true[:3, 3])
    dR = T_est[:3, :3].T @ T_true[:3, :3]
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    return dt, ang


@pytest.mark.parametrize(
    "motion,tol",
    [
        (dict(x=0.015), 4e-3),
        (dict(z=-0.01, yaw=np.deg2rad(0.8)), 4e-3),
        # y+pitch is the classic translation/rotation-ambiguous pair for a
        # frontal wall: at this test's 160x120 resolution the solver trades
        # ~4.1 mm of t_y against pitch even on a noise-free analytic render;
        # the same motion at the real 640x480 resolution recovers to 2.2 mm /
        # 0.0 deg (measured), so the looser bound pins the low-res ambiguity,
        # not a solver defect.
        (dict(y=0.01, pitch=np.deg2rad(0.6)), 5e-3),
    ],
)
def test_recovers_small_motion(scene, small_cfg, motion, tol):
    cfg = small_cfg
    T0 = np.eye(4)
    T1 = pose_from_xyzrpy(**motion)
    inputs = _frame_inputs(scene, cfg, T0, T1)
    res = get_incremental_transformation(inputs, cfg)
    dt, ang = _pose_errors(res.T_curr, T1)
    assert dt < tol, f"translation error {dt*1000:.2f} mm"
    assert ang < np.deg2rad(0.4), f"rotation error {np.rad2deg(ang):.3f} deg"
    assert float(res.icp_count) > 5000


def test_identity_motion_stays_put(scene, small_cfg):
    cfg = small_cfg
    T0 = np.eye(4)
    inputs = _frame_inputs(scene, cfg, T0, T0)
    res = get_incremental_transformation(inputs, cfg)
    dt, ang = _pose_errors(res.T_curr, T0)
    assert dt < 1e-3
    assert ang < np.deg2rad(0.1)


def test_icp_only_mode(scene, small_cfg):
    cfg = small_cfg.with_(icp_weight=100.0, so3=False)
    T0 = np.eye(4)
    T1 = pose_from_xyzrpy(x=0.01, z=-0.005)
    inputs = _frame_inputs(scene, cfg, T0, T1)
    res = get_incremental_transformation(inputs, cfg)
    dt, ang = _pose_errors(res.T_curr, T1)
    assert dt < 4e-3
    assert ang < np.deg2rad(0.3)


def test_nonidentity_start_pose(scene, small_cfg):
    """Track with T_prev ≠ I: world frame differs from camera frame."""
    cfg = small_cfg
    T0 = pose_from_xyzrpy(x=0.3, y=-0.2, yaw=np.deg2rad(10))
    delta = pose_from_xyzrpy(x=0.012, yaw=np.deg2rad(0.5))
    T1 = T0 @ delta
    inputs = _frame_inputs(scene, cfg, T0, T1)
    res = get_incremental_transformation(inputs, cfg)
    dt, ang = _pose_errors(res.T_curr, T1)
    assert dt < 4e-3
    assert ang < np.deg2rad(0.3)


@pytest.mark.slow
def test_full_res_recovers_ambiguous_motion():
    """Pins the 640x480 claim the y+pitch comment above cites: at the real
    sensor resolution the translation/rotation-ambiguous motion recovers to
    <= 2.5 mm (measured 2.2 mm; RGBDOdometry.cpp:371-373 iteration budget).
    Slow: one full-resolution solve on the CPU test mesh."""
    cam = CameraConfig()  # 640x480
    cfg = EngineConfig(camera=cam)
    scene = make_scene(n_side=1400)
    T0 = np.eye(4)
    T1 = pose_from_xyzrpy(y=0.01, pitch=np.deg2rad(0.6))
    inputs = _frame_inputs(scene, cfg, T0, T1)
    res = get_incremental_transformation(inputs, cfg)
    dt, ang = _pose_errors(res.T_curr, T1)
    assert dt < 2.5e-3, f"translation error {dt*1000:.2f} mm"
    assert ang < np.deg2rad(0.3), f"rotation error {np.rad2deg(ang):.3f} deg"
