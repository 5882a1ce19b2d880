"""Odometry accuracy on noise-free analytic renders: tight error bounds that
the point-splat renderer's ~mm sampling noise would mask (SURVEY.md §4 —
'synthetic closed-form scenes (known SE3 motion) for open-loop odometry')."""

import numpy as np
import pytest

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.utils.synthetic import pose_from_xyzrpy, render_analytic


@pytest.fixture(scope="module")
def cam():
    return CameraConfig(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


def _track_pair(cam, T0, T1, **cfg_kw):
    import jax.numpy as jnp

    from elasticfusion_tpu.engine import _coarse_intensity, _preprocess, _track

    cfg = EngineConfig(camera=cam, closeLoops=False, **cfg_kw)
    d0, r0 = render_analytic(T0, cam)
    d1, r1 = render_analytic(T1, cam)
    # model side = frame 0's raw maps (open-loop frame-to-frame)
    raw0, filt0 = _preprocess(jnp.asarray(d0), cfg)
    from elasticfusion_tpu.ops.preprocess import compute_nmap, compute_vmap

    vm0 = compute_vmap(filt0, cam, cfg.max_depth_processed)
    nm0 = compute_nmap(vm0)
    _, filt1 = _preprocess(jnp.asarray(d1), cfg)
    so3_hist = _coarse_intensity(jnp.asarray(r0), cfg)
    res, _ = _track(
        vm0, nm0, jnp.asarray(r0, jnp.float32),
        filt1, jnp.asarray(r1), so3_hist,
        jnp.asarray(T0, jnp.float32), cfg, False,
    )
    return np.asarray(res.T_curr, np.float64)


@pytest.mark.parametrize("motion", [
    dict(x=0.01),
    dict(z=0.008),
    dict(yaw=0.01),
    dict(x=0.006, y=-0.004, yaw=0.006, pitch=-0.004),
])
def test_icp_accuracy_tight(cam, motion):
    """Depth-only (icpWeight=100) recovers known SE(3) motion to sub-mm on
    noise-free renders — the geometric solver has no systematic bias."""
    T0 = np.eye(4)
    T1 = pose_from_xyzrpy(**motion)
    T_est = _track_pair(cam, T0, T1, icp_weight=100.0)
    terr = np.linalg.norm(T_est[:3, 3] - T1[:3, 3])
    R_err = T_est[:3, :3].T @ T1[:3, :3]
    ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
    assert terr < 1e-3, f"translation error {terr*1000:.2f} mm"
    assert ang < 1.5e-3, f"rotation error {np.degrees(ang):.3f} deg"


def test_mixed_accuracy(cam):
    """Default ICP+RGB (icpWeight=10) on the same pair: the photometric term
    carries the reference-inherent tx/ry aperture ambiguity on near-planar
    scenes (its one-step solve couples +tx with -ry ~ tx/z), so the bound is
    looser — the ICP term keeps it anchored."""
    T0 = np.eye(4)
    T1 = pose_from_xyzrpy(x=0.01)
    T_est = _track_pair(cam, T0, T1)
    terr = np.linalg.norm(T_est[:3, 3] - T1[:3, 3])
    assert terr < 5e-3, f"translation error {terr*1000:.2f} mm"


def test_analytic_render_depth_is_clean(cam):
    d, rgb = render_analytic(np.eye(4), cam)
    assert (d > 0).mean() > 0.9
    # centre pixel depth matches the height field evaluated at the hit point
    v, u = cam.height // 2, cam.width // 2
    assert abs(int(d[v, u]) - 2000) < 350  # wall is at z≈2 m ±0.35
