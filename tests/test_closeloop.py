"""Loop closure tests: fern retrieval standalone, and the full engine
running global+local closures over a there-and-back synthetic trajectory."""

import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.config import EngineConfig
from elasticfusion_tpu.engine import Engine
from elasticfusion_tpu.ferns import Ferns
from elasticfusion_tpu.ops.preprocess import compute_nmap, compute_vmap, metricise_depth
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


def _view(scene, cam, T):
    depth_mm, rgb = render_frame(scene[0], scene[1], T, cam)
    depth = metricise_depth(jnp.asarray(depth_mm, jnp.float32), 20.0)
    vmap = compute_vmap(depth, cam, 20.0)
    nmap = compute_nmap(vmap)
    img = jnp.asarray(rgb, jnp.float32)
    return img, vmap, nmap


@pytest.fixture()
def fern_cfg(small_cam):
    # fern resolution at 160x120 / 8 = 20x15 = 300 px; scale inlier gates
    return EngineConfig(
        camera=small_cam,
        fern_min_age=5,
        fern_inlier_count=100,
        lost_inlier_relax=60,
    )


def test_ferns_add_and_find(scene, fern_cfg):
    cam = fern_cfg.camera
    ferns = Ferns(fern_cfg)

    views = []
    for i in range(6):
        T = pose_from_xyzrpy(x=0.25 * i, yaw=0.10 * i)
        views.append((T, *_view(scene, cam, T)))

    added = 0
    for i, (T, img, vmap, nmap) in enumerate(views):
        added += ferns.add_frame(img, vmap, nmap, T, src_time=i + 1)
    assert added >= 2, "distinct views should become keyframes"
    assert len(ferns.frames) == added

    # revisit view 0 (slightly perturbed) much later
    T_re = pose_from_xyzrpy(x=0.01, yaw=0.004)
    img, vmap, nmap = _view(scene, cam, T_re)
    T_found, cons = ferns.find_frame(img, vmap, nmap, T_re, time=100, lost=False)
    assert ferns.last_closest == 0
    assert T_found is not None
    assert len(cons) > 10
    # recovered pose close to the revisit pose (keyframe 0 + fern ICP)
    err = np.linalg.norm(T_found[:3, 3] - T_re[:3, 3])
    assert err < 0.02, f"fern ICP pose error {err*1000:.1f} mm"


def test_ferns_min_age_gate(scene, fern_cfg):
    cam = fern_cfg.camera
    ferns = Ferns(fern_cfg)
    T = np.eye(4)
    img, vmap, nmap = _view(scene, cam, T)
    ferns.add_frame(img, vmap, nmap, T, src_time=1)
    # too recent: age gate (Ferns.cpp:218) rejects
    T_found, cons = ferns.find_frame(img, vmap, nmap, T, time=3, lost=False)
    assert ferns.last_closest == -1 and T_found is None


def test_engine_local_loop_closure(scene, small_cam):
    """There-and-back trajectory with a small time window: on return the
    active model must register against the inactive one and deform."""
    cfg = EngineConfig(
        camera=small_cam,
        max_surfels=1 << 17,
        confidence_threshold=0.3,
        time_delta=6,                 # tiny window -> early map goes inactive
        icp_count_threshold=2000,     # scaled from 40000 @ 640x480
        icp_error_threshold=5e-4,
        cov_threshold=1e-4,
        fern_min_age=1000,            # keep ferns out of this test
        def_graph_sample_rate=500,    # enough nodes on a small map
    )
    eng = Engine(cfg)
    n = 16
    gt = []
    for i in range(n):
        # out for 8 frames, back for 8
        s = i if i < 8 else (2 * 8 - i - 1)
        T = pose_from_xyzrpy(x=0.035 * s, yaw=0.012 * s)
        gt.append(T)
        depth_mm, rgb = render_frame(scene[0], scene[1], T, small_cam)
        eng.process_frame(rgb, depth_mm, timestamp=i * 33000)

    assert eng.deforms >= 1, "local loop closure never fired"
    # map must stay sane after deformation
    assert eng.surfel_count > 5000
    pos = np.asarray(eng.map.pos[:, : eng.surfel_count])
    assert np.isfinite(pos).all()
    # trajectory should still be close to ground truth at the end
    t_err = np.linalg.norm(eng.T_wc[:3, 3] - gt[-1][:3, 3])
    assert t_err < 0.06, f"end-pose error {t_err*1000:.0f} mm"
