"""Multi-device sharding tests on the virtual 8-device CPU mesh: the sharded
whole-frame step must compile, run, and agree with the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.config import CameraConfig, EngineConfig
from elasticfusion_tpu.engine import slam_step
from elasticfusion_tpu.ops.preprocess import metricise_depth
from elasticfusion_tpu.parallel.sharding import (
    make_mesh,
    map_shardings,
    replicate,
    shard_surfel_map,
    sharded_slam_step,
)
from elasticfusion_tpu.surfels import init_map_from_frame
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


@pytest.fixture(scope="module")
def setup():
    cam = CameraConfig(width=64, height=48, fx=52.8, fy=52.8, cx=32.0, cy=24.0)
    cfg = EngineConfig(
        camera=cam, max_surfels=1 << 12, closeLoops=False,
        confidence_threshold=0.3,   # young surfels must render for the check
    )
    scene = make_scene(n_side=160)
    d0, r0 = render_frame(scene[0], scene[1], np.eye(4), cam)
    d1, r1 = render_frame(
        scene[0], scene[1], pose_from_xyzrpy(x=0.01), cam
    )
    raw0 = metricise_depth(jnp.asarray(d0, jnp.float32), cfg.depth_cutoff)
    m = init_map_from_frame(
        cfg.max_surfels, raw0, raw0, jnp.asarray(r0), cam, cfg.depth_cutoff
    )
    H, W = cam.height, cam.width
    args = (
        jnp.eye(4, dtype=jnp.float32),
        jnp.zeros((H >> 2, W >> 2), jnp.float32),
        jnp.zeros((3, H, W), jnp.float32),
        jnp.zeros((3, H, W), jnp.float32),
        jnp.zeros((H, W, 3), jnp.float32),
        jnp.asarray(d1),
        jnp.asarray(r1),
        jnp.float32(2.0),
        jnp.float32(1.0),
    )
    return cfg, m, args


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8, "conftest must force the 8-device CPU mesh"


def test_sharded_step_runs(setup):
    cfg, m, args = setup
    mesh = make_mesh(8)
    ms = shard_surfel_map(m, mesh)
    step = sharded_slam_step(cfg, mesh)
    rep_args = tuple(replicate(a, mesh) for a in args)
    out = step(ms, *rep_args)
    jax.block_until_ready(out)
    m2 = out[0]
    assert int(m2.count) > 0
    # output map keeps the sharded layout
    assert m2.pos.sharding.spec == map_shardings(mesh).pos.spec


def test_sharded_matches_single_device(setup):
    cfg, m, args = setup
    # single device
    m1_out = slam_step(jax.tree.map(jnp.copy, m), *args, cfg=cfg)
    # 8-way sharded
    mesh = make_mesh(8)
    step = sharded_slam_step(cfg, mesh)
    m8_out = step(
        shard_surfel_map(jax.tree.map(jnp.copy, m), mesh),
        *(replicate(a, mesh) for a in args),
    )
    T1, T8 = np.asarray(m1_out[1]), np.asarray(m8_out[1])
    np.testing.assert_allclose(T1, T8, atol=1e-5)
    c1, c8 = int(m1_out[0].count), int(m8_out[0].count)
    # fuse/clean decisions may differ at ulp level; counts must agree closely
    assert abs(c1 - c8) <= max(5, 0.01 * c1), (c1, c8)
    d1 = np.asarray(m1_out[4].depth)
    d8 = np.asarray(m8_out[4].depth)
    both = (d1 > 0) & (d8 > 0)
    assert both.mean() > 0.9
    assert np.median(np.abs(d1[both] - d8[both])) < 1e-4
