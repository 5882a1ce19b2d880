"""Checkpoint/resume: run N frames, checkpoint, resume, and confirm the
resumed engine tracks on and the state round-trips."""

import numpy as np
import pytest

from elasticfusion_tpu.checkpoint import load_checkpoint, save_checkpoint
from elasticfusion_tpu.config import EngineConfig
from elasticfusion_tpu.engine import Engine
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


def test_checkpoint_roundtrip(scene, small_cam, tmp_path):
    cfg = EngineConfig(camera=small_cam, max_surfels=1 << 16,
                       confidence_threshold=0.3)
    eng = Engine(cfg)
    frames = []
    for i in range(6):
        T = pose_from_xyzrpy(x=0.015 * i, yaw=0.006 * i)
        dmm, rgb = render_frame(scene[0], scene[1], T, small_cam)
        frames.append((T, dmm, rgb))
        eng.process_frame(rgb, dmm, timestamp=i * 33000)

    p = tmp_path / "ck.npz"
    save_checkpoint(p, eng)
    eng2 = load_checkpoint(p, cfg)

    assert eng2.tick == eng.tick
    assert eng2.surfel_count == eng.surfel_count
    np.testing.assert_allclose(eng2.T_wc, eng.T_wc)
    assert len(eng2.tick_poses) == len(eng.tick_poses)
    assert len(eng2.ferns.frames) == len(eng.ferns.frames)
    n = eng.surfel_count
    np.testing.assert_allclose(
        np.asarray(eng2.map.pos[:, :n]), np.asarray(eng.map.pos[:, :n])
    )

    # resumed engine keeps tracking accurately
    for i in range(6, 9):
        T = pose_from_xyzrpy(x=0.015 * i, yaw=0.006 * i)
        dmm, rgb = render_frame(scene[0], scene[1], T, small_cam)
        res = eng2.process_frame(rgb, dmm, timestamp=i * 33000)
    err = np.linalg.norm(eng2.T_wc[:3, 3] - T[:3, 3])
    assert err < 0.02, f"post-resume drift {err*1000:.1f} mm"


def test_checkpoint_carries_loop_closure_state(scene, small_cam, tmp_path):
    """relative constraints + deformation clocks survive a round trip
    (EF.cpp:529-531 carry semantics — VERDICT r1 found these dropped)."""
    from elasticfusion_tpu.deformation import HostConstraint

    cfg = EngineConfig(camera=small_cam, max_surfels=1 << 16,
                       confidence_threshold=0.3)
    eng = Engine(cfg)
    for i in range(3):
        T = pose_from_xyzrpy(x=0.01 * i)
        dmm, rgb = render_frame(scene[0], scene[1], T, small_cam)
        eng.process_frame(rgb, dmm, timestamp=i * 33000)
    # inject carried loop-closure state as a closure event would leave it
    eng.relative_cons = [
        HostConstraint([0.1, 0.2, 1.9], [0.11, 0.19, 1.9], 2, 1, relative=True),
        HostConstraint([-0.3, 0.0, 2.1], [-0.29, 0.01, 2.1], 3, 1, relative=True),
    ]
    eng.local_deformation.last_deform_time = 2
    eng.local_deformation.deforms = 1
    eng.deforms = 1

    p = tmp_path / "ck2.npz"
    save_checkpoint(p, eng)
    eng2 = load_checkpoint(p, cfg)

    assert len(eng2.relative_cons) == 2
    np.testing.assert_allclose(eng2.relative_cons[0].src, [0.1, 0.2, 1.9])
    assert eng2.relative_cons[1].relative
    assert eng2.relative_cons[1].src_time == 3
    assert eng2.local_deformation.last_deform_time == 2
    assert eng2.local_deformation.deforms == 1
    assert eng2.deforms == 1


def test_checkpoint_version_gate(tmp_path):
    np.savez_compressed(tmp_path / "bad.npz", version=99, tick=1)
    with pytest.raises(ValueError, match="version"):
        load_checkpoint(tmp_path / "bad.npz")
