"""Explicit shard_map scaling-path tests (parallel/shard_step.py): the
per-shard sub-map formulation must agree with the single-device step and
compile to single-digit collectives per frame (vs ~742 under naive GSPMD
propagation — SCALING.md:34-42)."""

import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import slam_step
from elasticfusion_tpu.ops.preprocess import metricise_depth
from elasticfusion_tpu.parallel.sharding import make_mesh, replicate
from elasticfusion_tpu.parallel.shard_step import (
    gather_shard_map,
    make_shardmap_step,
    shard_empty_map,
)
from elasticfusion_tpu.surfels import init_map_from_frame
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame

CAM = CameraConfig(width=64, height=48, fx=52.8, fy=52.8, cx=32.0, cy=24.0)


@pytest.fixture(scope="module")
def setup():
    cfg = EngineConfig(
        camera=CAM, max_surfels=1 << 15, closeLoops=False,
        confidence_threshold=0.3,
    )
    scene = make_scene(n_side=160)
    frames = []
    for i in range(6):
        T = pose_from_xyzrpy(x=0.01 * i, yaw=0.004 * i)
        frames.append(render_frame(scene[0], scene[1], T, CAM))
    raw0 = metricise_depth(
        jnp.asarray(frames[0][0], jnp.float32), cfg.depth_cutoff
    )
    m0 = init_map_from_frame(
        cfg.max_surfels, raw0, raw0, jnp.asarray(frames[0][1]), CAM,
        cfg.depth_cutoff,
    )
    return cfg, m0, frames


def _boot_sharded(cfg, m0, mesh):
    """First-frame bootstrap on the sharded layout: shard 0 owns the whole
    initial frame (ids match the single-device bootstrap exactly)."""
    ms = shard_empty_map(cfg.max_surfels, mesh)
    S = int(np.prod(mesh.devices.shape))
    cap_l = cfg.max_surfels // S
    n0 = int(m0.count)
    assert n0 <= cap_l, "test capacity: first frame must fit one shard"
    upd = {}
    for k in ("pos", "conf", "color", "init_t", "last_t", "normal", "radius"):
        full = np.zeros(getattr(ms, k).shape, np.float32)
        src = np.asarray(jax.device_get(getattr(m0, k)))
        full[..., :n0] = src[..., :n0]
        upd[k] = jax.device_put(jnp.asarray(full), getattr(ms, k).sharding)
    counts = np.zeros((S,), np.int32)
    counts[0] = n0
    upd["count"] = jax.device_put(jnp.asarray(counts), ms.count.sharding)
    return ms._replace(**upd)


def _run(step_fn, m, frames, cfg, mesh=None):
    H, W = CAM.height, CAM.width
    mk = (lambda x: replicate(x, mesh)) if mesh is not None else (lambda x: x)
    T = mk(jnp.eye(4, dtype=jnp.float32))
    so3 = mk(jnp.zeros((H >> 2, W >> 2), jnp.float32))
    pv = mk(jnp.zeros((3, H, W), jnp.float32))
    pn = mk(jnp.zeros((3, H, W), jnp.float32))
    pi = mk(jnp.zeros((H, W, 3), jnp.float32))
    poses = []
    for i, (d, r) in enumerate(frames[1:], start=2):
        out = step_fn(
            m, T, so3, pv, pn, pi, mk(jnp.asarray(d)), mk(jnp.asarray(r)),
            mk(jnp.float32(i)), mk(jnp.float32(1.0)),
        )
        m, T, so3, (pv, pn, pi) = out[0], out[1], out[2], out[3]
        poses.append(np.asarray(jax.device_get(T)))
    return m, poses


def test_shardmap_step_matches_single_device(setup):
    cfg, m0, frames = setup
    m1, poses1 = _run(
        lambda *a: slam_step(*a, cfg=cfg), jax.tree.map(jnp.copy, m0),
        frames, cfg,
    )
    mesh = make_mesh(8)
    step = make_shardmap_step(cfg, mesh)
    ms = _boot_sharded(cfg, m0, mesh)
    m8, poses8 = _run(step, ms, frames, cfg, mesh=mesh)

    # trajectories must agree to sub-mm (the only divergence source is the
    # raster tie-break among equal 2.4 mm z-buckets when append ids differ)
    for a, b in zip(poses1, poses8):
        assert np.linalg.norm(a[:3, 3] - b[:3, 3]) < 1e-3
        assert np.abs(a[:3, :3] - b[:3, :3]).max() < 1e-3

    # live surfel totals agree closely
    n1 = int(m1.count)
    n8 = int(np.asarray(jax.device_get(m8.count)).sum())
    assert abs(n1 - n8) <= max(0.01 * n1, 8), (n1, n8)

    # gathered sharded map covers the same space as the single-device map
    g = gather_shard_map(m8, mesh)
    c1 = np.sort(np.asarray(m1.pos[2][: n1]))
    c8 = np.sort(np.asarray(g.pos[2][: n8]))
    k = min(n1, n8)
    assert np.abs(c1[:k] - c8[:k]).mean() < 5e-3


def test_shardmap_collective_count(setup):
    """The explicit formulation must compile to single-digit collectives —
    the whole point vs GSPMD's ~742 (SCALING.md)."""
    cfg, m0, frames = setup
    mesh = make_mesh(8)
    step = make_shardmap_step(cfg, mesh)
    ms = _boot_sharded(cfg, m0, mesh)
    H, W = CAM.height, CAM.width
    mk = lambda x: replicate(x, mesh)  # noqa: E731
    args = (
        ms, mk(jnp.eye(4, dtype=jnp.float32)),
        mk(jnp.zeros((H >> 2, W >> 2), jnp.float32)),
        mk(jnp.zeros((3, H, W), jnp.float32)),
        mk(jnp.zeros((3, H, W), jnp.float32)),
        mk(jnp.zeros((H, W, 3), jnp.float32)),
        mk(jnp.asarray(frames[1][0])), mk(jnp.asarray(frames[1][1])),
        mk(jnp.float32(2.0)), mk(jnp.float32(1.0)),
    )
    txt = step.lower(*args).compile().as_text()
    colls = Counter(re.findall(
        r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)\b", txt))
    total = sum(colls.values())
    assert total <= 12, f"collective blow-up: {dict(colls)}"
