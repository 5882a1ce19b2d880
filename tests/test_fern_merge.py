"""Cross-host fern retrieval merge semantics (parallel/distributed.
PartitionedFerns.find_frame_scored): one global winner, owner-side accept,
identical constraints on every rank — without real processes, by faking the
two `process_allgather` rounds (the real 2-process path is covered by
tests/test_distributed.py).  Reference behavior matched: one DB, one winner
(/root/reference/Core/Ferns.cpp:162-298)."""

import numpy as np
import pytest

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.ferns import Ferns
from elasticfusion_tpu.parallel.distributed import PartitionedFerns


class _FakeMhu:
    """Simulates process_allgather for a fixed peer payload schedule."""

    def __init__(self, peer_payloads):
        self.peer_payloads = list(peer_payloads)
        self.calls = []

    def process_allgather(self, x):
        x = np.asarray(x)
        self.calls.append(x.copy())
        peer = np.asarray(self.peer_payloads.pop(0), x.dtype)
        return np.stack([x, peer])  # rank 0 = self, rank 1 = peer


@pytest.fixture()
def small_ferns(scene, small_cam):
    cfg = EngineConfig(
        camera=small_cam, fern_pyramid_factor=8, fern_min_age=0,
        fern_threshold=0.01, fern_inlier_count=10, fern_icp_error=1.0,
        photo_threshold=1e6,
    )
    f = Ferns(cfg)
    return cfg, f


def _views(scene, cam):
    from elasticfusion_tpu.ops.preprocess import (
        compute_nmap,
        compute_vmap,
        metricise_depth,
    )
    from elasticfusion_tpu.utils.synthetic import render_frame

    import jax.numpy as jnp

    d_mm, rgb = render_frame(scene[0], scene[1], np.eye(4), cam)
    depth = metricise_depth(jnp.asarray(d_mm, jnp.float32), 20.0)
    vmap = compute_vmap(depth, cam, 20.0)
    nmap = compute_nmap(vmap)
    return np.asarray(rgb, np.float32), np.asarray(vmap), np.asarray(nmap)


def test_merge_peer_wins_owner_accepts(monkeypatch, scene, small_cam,
                                       small_ferns):
    """The peer host offers a better candidate it owns: this rank must NOT
    run its local accept branch, must adopt the broadcast pose, and must
    emit constraints from its own (replicated) views."""
    cfg, f = small_ferns
    img, vtx, nrm = _views(scene, small_cam)
    # local DB: one keyframe owned by rank 0 (src_time 2)
    assert f.add_frame(img, vtx, nrm, np.eye(4), src_time=2)

    pf = PartitionedFerns(f, 2, 0)
    T_peer = np.eye(4)
    T_peer[0, 3] = 0.25
    fake = _FakeMhu([
        # round 1: peer offers (d=0.05, src_time=3 -> owner rank 1, hd=0.9)
        np.array([0.05, 3.0, 0.9]),
        # round 2: peer (the owner) broadcasts accept + its pose
        np.concatenate([[1.0], T_peer.reshape(-1), [3.0]]),
    ])
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.process_allgather",
        fake.process_allgather,
    )

    T_est, cons = pf.find_frame_scored(
        0, 0.5, 0.9, f.frames[0].codes, 40, (img, vtx, nrm),
        np.eye(4), 10, False,
    )
    assert len(fake.calls) == 2
    np.testing.assert_allclose(np.asarray(T_est), T_peer)
    assert pf.last_closest != -1
    assert pf.closest_src_time() == 3
    assert len(cons) > 0
    # constraint targets carry the merged (peer) pose's translation
    deltas = [c.target_point - c.source_point for c in cons]
    assert all(abs(d[0] - 0.25) < 1e-6 for d in deltas)


def test_merge_reject_is_symmetric(monkeypatch, scene, small_cam,
                                   small_ferns):
    """No host has a finite candidate -> both reject after ONE collective
    round (the second broadcast must not run, or ranks would deadlock)."""
    cfg, f = small_ferns
    img, vtx, nrm = _views(scene, small_cam)
    pf = PartitionedFerns(f, 2, 0)
    fake = _FakeMhu([np.array([np.inf, -1.0, 0.0])])
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.process_allgather",
        fake.process_allgather,
    )
    T_est, cons = pf.find_frame_scored(
        -1, np.inf, 0.0, None, 0, (img, vtx, nrm), np.eye(4), 10, False,
    )
    assert T_est is None and cons == []
    assert len(fake.calls) == 1
    assert pf.last_closest == -1


def test_merge_local_owner_runs_accept(monkeypatch, scene, small_cam,
                                       small_ferns):
    """This rank owns the global winner: the local accept branch (fern ICP +
    photometric check) runs and its verdict broadcasts."""
    cfg, f = small_ferns
    img, vtx, nrm = _views(scene, small_cam)
    assert f.add_frame(img, vtx, nrm, np.eye(4), src_time=2)

    pf = PartitionedFerns(f, 2, 0)
    fake = _FakeMhu([
        np.array([0.9, -1.0, 0.0]),        # peer has nothing
        np.zeros(18),                      # peer's (ignored) res slot
    ])
    monkeypatch.setattr(
        "jax.experimental.multihost_utils.process_allgather",
        fake.process_allgather,
    )
    T_est, cons = pf.find_frame_scored(
        0, 0.1, 0.9, f.frames[0].codes, 40, (img, vtx, nrm),
        np.eye(4), 10, False,
    )
    # src_time=2 -> owner = 2 % 2 = 0 = this rank; gates are wide open so
    # the same-scene revisit must accept against its own keyframe
    assert len(fake.calls) == 2
    assert pf.last_closest != -1
    assert pf.closest_src_time() == 2
    assert T_est is not None and len(cons) > 0
