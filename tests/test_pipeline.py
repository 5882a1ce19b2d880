"""Pipelined-engine tests (pipeline_depth > 0) — the mode bench.py and the
driver dryrun actually run in.

Covers the deferred-closure machinery that only exists under pipelining
(VERDICT r2 weak #2 / ADVICE r2): the `_apply_closure` repair, the
`_pose_fixes` in-flight-window composition (a fix applied outside its window
double-corrects every post-closure pose), and fern-teleport relocalization
with the per-frame recovery flag.

Reference semantics being matched: ElasticFusion.cpp:410-534 (closure applied
in-frame) — the pipelined engine must converge to the same trajectory within
a small bound despite learning of closures pipeline_depth frames late.
"""

import numpy as np
import pytest

from elasticfusion_tpu.config import EngineConfig
from elasticfusion_tpu.engine import Engine
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


def _closure_cfg(small_cam, depth: int) -> EngineConfig:
    # mirrors test_closeloop.test_engine_local_loop_closure: tiny time window
    # so the there-and-back revisit must register active-vs-inactive + deform
    return EngineConfig(
        camera=small_cam,
        max_surfels=1 << 17,
        confidence_threshold=0.3,
        time_delta=6,
        icp_count_threshold=2000,
        icp_error_threshold=5e-4,
        cov_threshold=1e-4,
        fern_min_age=1000,            # local closures only
        def_graph_sample_rate=500,
        pipeline_depth=depth,
    )


def _there_back(n=16):
    gt = []
    for i in range(n):
        s = i if i < n // 2 else (n - i - 1)
        gt.append(pose_from_xyzrpy(x=0.035 * s, yaw=0.012 * s))
    return gt


def _run_closure_traj(scene, small_cam, depth: int):
    cfg = _closure_cfg(small_cam, depth)
    eng = Engine(cfg)
    gt = _there_back()
    for i, T in enumerate(gt):
        depth_mm, rgb = render_frame(scene[0], scene[1], T, small_cam)
        eng.process_frame(rgb, depth_mm, timestamp=i * 33000)
    eng.flush()
    return eng, gt


def test_pipeline_depth_trajectory_agreement(scene, small_cam):
    """The headline perf mode (depth 2) must produce the same trajectory as
    the reference-ordered synchronous mode (depth 0) on a closure-bearing
    sequence, up to the 2-frame-deferred repair."""
    eng0, gt = _run_closure_traj(scene, small_cam, depth=0)
    eng2, _ = _run_closure_traj(scene, small_cam, depth=2)

    assert eng0.deforms >= 1, "depth-0 run never closed the loop"
    assert eng2.deforms >= 1, "depth-2 run never closed the loop"

    p0 = [T for _, T in eng0.poses]
    p2 = [T for _, T in eng2.poses]
    assert len(p0) == len(p2) == len(gt)

    # Per-frame translation difference between the two pipelines.  Around
    # the closure frames a transient is expected (depth 2 learns of the
    # closure 2 frames late and repairs deferred — measured ~16-21 mm on this
    # trajectory); what must NOT happen is a persistent offset (the r2
    # double-correction bug left every post-closure pose off by T_fix).
    diffs = [np.linalg.norm(a[:3, 3] - b[:3, 3]) for a, b in zip(p0, p2)]
    assert max(diffs) < 0.03, (
        f"depth-0 vs depth-2 trajectories diverge: max {max(diffs)*1000:.1f} mm"
    )
    tail = diffs[-3:]
    assert float(np.mean(tail)) < 0.01, (
        f"post-closure tail did not re-converge: {[f'{d*1000:.1f}' for d in tail]} mm"
    )

    # and both must still end near ground truth (the double-correction bug
    # left every post-closure pose off by T_fix — this catches it)
    for eng in (eng0, eng2):
        t_err = np.linalg.norm(eng.T_wc[:3, 3] - gt[-1][:3, 3])
        assert t_err < 0.06, f"end-pose error {t_err*1000:.0f} mm"


def test_pose_fix_window_scoped(scene, small_cam):
    """After a closure at depth 0 (empty in-flight queue), NO host-side pose
    fix may remain outstanding: subsequent frames carry the corrected device
    pose already (ADVICE r2 finding #1)."""
    eng, _ = _run_closure_traj(scene, small_cam, depth=0)
    assert eng.deforms >= 1
    assert eng._pose_fixes == [], (
        "pose fixes must drain once no in-flight frame needs them"
    )


@pytest.mark.parametrize("depth", [0, 2])
def test_fern_teleport_recovery(scene, small_cam, depth):
    """Lost -> fern-retrieval teleport -> one confirming frame clears `lost`
    (ElasticFusion.cpp:326-365, 411-413), at both pipeline depths.  The
    recovery flag must be consumed per-frame (ADVICE r2 finding #2: reading
    the engine attribute at finish time left reloc permanently lost)."""
    cfg = EngineConfig(
        camera=small_cam,
        max_surfels=1 << 17,
        confidence_threshold=0.3,
        reloc_mode=True,
        fern_min_age=3,
        fern_inlier_count=100,
        lost_inlier_relax=50,
        fern_threshold=0.12,          # small views: keep several keyframes
        fern_icp_error=2e-3,          # 20x15 fern views: looser than 80x60
        pipeline_depth=depth,
    )
    eng = Engine(cfg)

    # phase 1: map + fern keyframes over a short sweep
    views = []
    for i in range(8):
        T = pose_from_xyzrpy(x=0.03 * i, yaw=0.01 * i)
        d, r = render_frame(scene[0], scene[1], T, small_cam)
        views.append((T, d, r))
        eng.process_frame(r, d, timestamp=i)
    eng.flush()
    assert not eng.lost
    assert len(eng.ferns.frames) >= 1, "no fern keyframes collected"

    # phase 2: sensor blackout -> tracking-failure gates trip -> lost
    blank_d = np.zeros_like(views[0][1])
    blank_r = np.zeros_like(views[0][2])
    for i in range(14):
        eng.process_frame(blank_r, blank_d, timestamp=100 + i)
    eng.flush()
    assert eng.lost, "blackout must set lost after >10 bad frames"

    # phase 3: show the very first view again -> fern teleport + confirm
    T0, d0, r0 = views[0]
    recovered = False
    for i in range(4 + depth):
        eng.process_frame(r0, d0, timestamp=200 + i)
        eng.flush()
        if not eng.lost:
            recovered = True
            break
    assert recovered, "engine stayed lost after revisiting a fern keyframe"
    t_err = np.linalg.norm(eng.T_wc[:3, 3] - T0[:3, 3])
    assert t_err < 0.05, f"teleported pose off by {t_err*1000:.0f} mm"
