"""Surfel map slice tests: init -> predict -> fuse -> clean roundtrips on
synthetic frames (the reference has no tests — SURVEY.md §4 strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.ops.fillin import fill_all
from elasticfusion_tpu.ops.fuse import clean, fuse
from elasticfusion_tpu.ops.preprocess import bilateral_filter, metricise_depth
from elasticfusion_tpu.ops.splat import combined_predict, predict_indices
from elasticfusion_tpu.surfels import init_map_from_frame
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame

CAP = 1 << 16


def _frame(scene, cam, T):
    depth_mm, rgb = render_frame(scene[0], scene[1], T, cam)
    raw_m = metricise_depth(jnp.asarray(depth_mm, jnp.float32), 20.0)
    filt_m = (
        metricise_depth(
            bilateral_filter(jnp.asarray(depth_mm, jnp.float32), 20.0), 20.0
        )
    )
    return raw_m, filt_m, jnp.asarray(rgb)


@pytest.fixture(scope="module")
def first_map(scene, small_cam):
    T0 = np.eye(4, dtype=np.float32)
    raw, filt, rgb = _frame(scene, small_cam, T0)
    m = init_map_from_frame(CAP, raw, filt, rgb, small_cam, 3.0)
    return m, (raw, filt, rgb)


def test_init_map_counts(first_map, small_cam):
    m, (raw, _, _) = first_map
    n_valid = int(jnp.sum((raw > 0) & (raw <= 3.0)))
    # normals kill borders/edges but the bulk must survive
    assert int(m.count) > 0.8 * n_valid
    assert int(m.count) <= n_valid


def test_init_map_geometry(first_map, small_cam):
    m, (raw, _, _) = first_map
    n = int(m.count)
    pos = np.asarray(m.pos[:, :n])
    # all live surfels back-project inside the frustum with positive depth
    assert (pos[2] > 0).all()
    z = pos[2]
    u = pos[0] * small_cam.fx / z + small_cam.cx
    assert (u > -1).all() and (u < small_cam.width + 1).all()
    # radii are small positive numbers (mm..cm scale at ~2 m)
    rad = np.asarray(m.radius[:n])
    assert (rad > 0).all() and (rad < 0.1).all()


def test_predict_indices_roundtrip(first_map, small_cam):
    m, (raw, _, _) = first_map
    T0 = jnp.eye(4)
    pred = predict_indices(m, T0, small_cam, time=1, time_delta=200, max_depth=20.0)
    idx = np.asarray(pred.index)
    filled = (idx >= 0).mean()
    assert filled > 0.75  # map came from this exact view
    # winning surfels' depth agrees with the frame depth
    raw_np = np.asarray(raw)
    have = idx >= 0
    zc = np.asarray(pred.vert[2])[have]
    assert np.median(np.abs(zc - raw_np[have])) < 0.02


def test_combined_predict_roundtrip(first_map, small_cam):
    m, (raw, _, rgb) = first_map
    T0 = jnp.eye(4)
    pred = combined_predict(
        m, T0, small_cam, time=1, max_time=1, time_delta=200,
        conf_threshold=0.0, max_depth=20.0,
    )
    d = np.asarray(pred.depth)
    raw_np = np.asarray(raw)
    both = (d > 0) & (raw_np > 0)
    assert both.mean() > 0.7
    assert np.median(np.abs(d[both] - raw_np[both])) < 0.02
    img = np.asarray(pred.image)
    err = np.abs(img[both] - np.asarray(rgb, np.float32)[both])
    assert np.median(err) < 16.0  # color survives the splat roundtrip


def test_confidence_gate_hides_unstable(first_map, small_cam):
    m, _ = first_map
    pred = combined_predict(
        m, jnp.eye(4), small_cam, time=1, max_time=1, time_delta=200,
        conf_threshold=100.0, max_depth=20.0,
    )
    assert float(jnp.sum(pred.depth > 0)) == 0.0


def test_fuse_merges_static_frame(first_map, small_cam):
    m, (raw, filt, rgb) = first_map
    T0 = jnp.eye(4)
    pred = predict_indices(m, T0, small_cam, time=2, time_delta=200, max_depth=20.0)
    m2, stats = fuse(
        m, pred, T0, 2, rgb, raw, filt, small_cam, max_depth=20.0, weighting=1.0
    )
    # a static re-observation must mostly merge, not grow the map
    assert int(stats.matched) > 4 * int(stats.added)
    growth = (int(m2.count) - int(m.count)) / int(m.count)
    assert growth < 0.1
    # merged surfels gained confidence
    assert float(jnp.sum(m2.conf)) > float(jnp.sum(m.conf))
    # merged surfels were re-stamped
    n = int(m.count)
    assert float(jnp.max(m2.last_t[:n])) == 2.0


def test_fuse_new_area_appends(first_map, scene, small_cam):
    m, _ = first_map
    # rotate enough that a fresh part of the scene appears
    T1 = jnp.asarray(pose_from_xyzrpy(x=0.3, yaw=0.12), jnp.float32)
    raw, filt, rgb = _frame(scene, small_cam, np.asarray(T1))
    pred = predict_indices(m, T1, small_cam, time=2, time_delta=200, max_depth=20.0)
    m2, stats = fuse(
        m, pred, T1, 2, rgb, raw, filt, small_cam, max_depth=20.0, weighting=1.0
    )
    assert int(stats.added) > 100  # new geometry entered the view


def test_clean_drops_stale_unstable(first_map, small_cam):
    m, _ = first_map
    T0 = jnp.eye(4)
    # age the map far past the unstable timeout with conf below threshold
    tick = 60
    pred = predict_indices(m, T0, small_cam, time=tick, time_delta=200, max_depth=20.0)
    m2 = clean(
        m, pred, T0, tick, small_cam,
        conf_threshold=10.0, time_delta=200, max_depth=20.0,
    )
    # every surfel has conf < 10 (single observation) and age 59 > 20
    assert int(m2.count) == 0


def test_clean_keeps_out_of_window(first_map, small_cam):
    m, _ = first_map
    T0 = jnp.eye(4)
    tick = 500  # age > timeDelta=200: out-of-window surfels always survive
    pred = predict_indices(m, T0, small_cam, time=tick, time_delta=200, max_depth=20.0)
    m2 = clean(
        m, pred, T0, tick, small_cam,
        conf_threshold=10.0, time_delta=200, max_depth=20.0,
    )
    assert int(m2.count) == int(m.count)


def test_fillin_covers_holes(first_map, small_cam):
    m, (raw, filt, rgb) = first_map
    pred = combined_predict(
        m, jnp.eye(4), small_cam, time=1, max_time=1, time_delta=200,
        conf_threshold=0.0, max_depth=20.0,
    )
    vtx, nrm, img = fill_all(
        pred, filt, rgb, small_cam, max_depth=3.0,
        lost=jnp.bool_(False), frame_to_frame_rgb=False,
    )
    raw_np = np.asarray(filt)
    # anywhere the raw frame has depth, the filled vertex map has depth
    holes = (np.asarray(pred.vertex[2]) == 0) & (raw_np > 0) & (raw_np < 3.0)
    assert np.asarray(vtx[2])[holes].min() > 0 if holes.any() else True
    # passthrough forces raw everywhere
    vtx2, _, img2 = fill_all(
        pred, filt, rgb, small_cam, max_depth=3.0,
        lost=jnp.bool_(True), frame_to_frame_rgb=False,
    )
    np.testing.assert_allclose(
        np.asarray(vtx2[2]), np.asarray(raw_np * ((raw_np > 0) & (raw_np < 3.0))),
        atol=1e-5,
    )
    assert np.abs(np.asarray(img2) - np.asarray(rgb, np.float32)).max() < 1e-4
