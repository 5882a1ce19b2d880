"""End-to-end engine test: frame-to-model SLAM on a synthetic sequence with
known ground-truth motion (SURVEY.md §4 strategy — the reference has no
tests; golden-trajectory bounds are our acceptance check)."""

import numpy as np
import pytest

from elasticfusion_tpu.config import EngineConfig
from elasticfusion_tpu.engine import Engine
from elasticfusion_tpu.io.trajectory import ate_rmse
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


@pytest.fixture(scope="module")
def run(scene, small_cam):
    # low confidence threshold so young surfels render and the frame-to-MODEL
    # path engages within the short test sequence
    cfg = EngineConfig(
        camera=small_cam, max_surfels=1 << 17, confidence_threshold=0.3
    )
    eng = Engine(cfg)
    n = 12
    gt = []
    for i in range(n):
        T = pose_from_xyzrpy(
            x=0.015 * i, y=-0.004 * i, z=0.006 * i,
            yaw=0.008 * i, pitch=0.004 * i,
        )
        gt.append((i * 0.033, T))
        depth_mm, rgb = render_frame(scene[0], scene[1], T, small_cam)
        eng.process_frame(rgb, depth_mm, timestamp=int(i * 0.033 * 1e6))
    return eng, gt


def test_engine_tracks_synthetic_motion(run):
    eng, gt = run
    est = [(t_us / 1e6, T) for (t_us, T) in [(p[0], p[1]) for p in eng.poses]]
    est = [(i * 0.033, T) for i, (_, T) in enumerate(eng.poses)]
    # per-step tracker noise at 160x120 is ~2 mm (test_odometry bounds); a
    # 12-frame drift budget of 20 mm keeps this a regression tripwire while
    # accuracy tuning happens against real TUM sequences
    r = ate_rmse(gt, est, align=False)
    assert r < 0.02, f"ATE {r*1000:.1f} mm too large"


def test_engine_map_stays_bounded(run):
    eng, _ = run
    # 12 overlapping views of the same wall: map must not blow up
    assert eng.surfel_count < 40000
    assert eng.surfel_count > 5000


def test_engine_outputs(run, tmp_path):
    eng, _ = run
    eng.save_trajectory(tmp_path / "out.freiburg")
    lines = (tmp_path / "out.freiburg").read_text().strip().splitlines()
    assert len(lines) == 12
    assert len(lines[0].split()) == 8
    n = eng.save_ply(tmp_path / "map.ply")
    assert n > 1000  # well-observed surfels exceed the confidence threshold


def test_engine_accepts_external_pose(scene, small_cam):
    cfg = EngineConfig(camera=small_cam, max_surfels=1 << 16)
    eng = Engine(cfg)
    for i in range(3):
        T = pose_from_xyzrpy(x=0.02 * i)
        depth_mm, rgb = render_frame(scene[0], scene[1], T, small_cam)
        res = eng.process_frame(
            rgb, depth_mm, timestamp=i, in_T_wc=T
        )
        np.testing.assert_allclose(res.T_wc, T, atol=1e-9)
    assert eng.surfel_count > 1000


def test_engine_timings_populated(run):
    eng, _ = run
    for k in ("Run", "Preprocess", "dispatch", "drain"):
        assert k in eng.stopwatch.timings
        assert eng.stopwatch.timings[k] >= 0.0
