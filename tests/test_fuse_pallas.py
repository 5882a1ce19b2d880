"""Parity: fuse()'s Pallas window-search/contribution kernel (interpret mode)
must reproduce the XLA shifted-window formulation bit-for-bit-ish — same
association decisions, same merged map, same appended surfels.

Reference behavior under test: data.vert:123-158 (window search) +
update.vert:49-92 (merge accumulation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.config import CameraConfig
from elasticfusion_tpu.ops.fuse import fuse
from elasticfusion_tpu.ops.splat import predict_indices
from elasticfusion_tpu.surfels import init_map_from_frame


@pytest.fixture(scope="module")
def small_scene():
    # one 40x128 tile: exercises the kernel without padding-dominated grids
    cam = CameraConfig(width=128, height=40, fx=110.0, fy=110.0, cx=64.0, cy=20.0)
    H, W = cam.height, cam.width
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth0 = 1.5 + 0.3 * np.sin(xx / 19.0) + 0.2 * np.cos(yy / 9.0)
    # second frame: slightly different depth + colors (forces merges AND news)
    depth1 = depth0 + 0.004 * np.sin(xx / 7.0)
    depth1[:, :16] = 0.0        # a hole: measuring=False there
    depth1[:, 96:] = 0.9        # new surface: fails the 5 cm depth gate -> appends
    rng = np.random.default_rng(7)
    rgb0 = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
    rgb1 = np.clip(rgb0.astype(np.int32) + rng.integers(-20, 20, rgb0.shape), 0, 255).astype(np.uint8)
    return cam, depth0, depth1, rgb0, rgb1


def _run(small_scene, use_pallas: bool):
    cam, depth0, depth1, rgb0, rgb1 = small_scene
    raw0 = jnp.asarray(depth0)
    m = init_map_from_frame(1 << 13, raw0, raw0, jnp.asarray(rgb0), cam, 3.0)
    T = jnp.eye(4, dtype=jnp.float32)
    tick = jnp.float32(2.0)
    pred = predict_indices(m, T, cam, tick, 200, 20.0)
    raw1 = jnp.asarray(depth1)
    m2, stats, upd = fuse(
        m, pred, T, tick, jnp.asarray(rgb1), raw1, raw1, cam, 20.0,
        jnp.float32(1.0), return_updated_pred=True, use_pallas=use_pallas,
    )
    return m2, stats, upd


def test_fuse_window_kernel_parity(small_scene):
    m_x, s_x, u_x = _run(small_scene, use_pallas=False)
    m_p, s_p, u_p = _run(small_scene, use_pallas=True)

    # identical association decisions
    assert int(s_x.matched) == int(s_p.matched)
    assert int(s_x.added) == int(s_p.added)
    assert int(s_x.count) == int(s_p.count)
    assert int(s_x.matched) > 50, "scene produced too few merges to be a test"
    assert int(s_x.added) > 10, "scene produced no appends"

    # identical merged/appended map state
    n = int(s_x.count)
    np.testing.assert_allclose(
        np.asarray(m_x.pos[:, :n]), np.asarray(m_p.pos[:, :n]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_x.conf[:n]), np.asarray(m_p.conf[:n]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_x.normal[:, :n]), np.asarray(m_p.normal[:, :n]), atol=1e-5
    )

    # identical pixel-domain updated prediction
    np.testing.assert_array_equal(np.asarray(u_x.index), np.asarray(u_p.index))
    np.testing.assert_allclose(
        np.asarray(u_x.conf), np.asarray(u_p.conf), atol=1e-5
    )
