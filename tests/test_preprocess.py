import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.config import CameraConfig
from elasticfusion_tpu.ops import preprocess as pp


def _np_bilateral(depth_mm, max_depth=20.0, radius=6):
    """NumPy golden mirroring depth_bilateral.frag exactly."""
    H, W = depth_mm.shape
    out = np.zeros_like(depth_mm, dtype=np.float32)
    ssp = 0.024691358
    scl = 0.000555556
    d = depth_mm.astype(np.float32)
    for y in range(H):
        for x in range(W):
            v = d[y, x]
            if v > max_depth * 1000.0 or v < 300:
                out[y, x] = 0
                continue
            s1 = s2 = 0.0
            for cy in range(max(y - radius, 0), min(y + radius + 1, H)):
                for cx in range(max(x - radius, 0), min(x + radius + 1, W)):
                    tmp = d[cy, cx]
                    space2 = float((x - cx) ** 2 + (y - cy) ** 2)
                    color2 = (v - tmp) ** 2
                    w = np.exp(-(space2 * ssp + color2 * scl))
                    s1 += tmp * w
                    s2 += w
            out[y, x] = np.round(s1 / s2)
    return out


def test_bilateral_matches_golden():
    rng = np.random.default_rng(0)
    depth = (rng.uniform(400, 3000, size=(16, 20))).astype(np.float32)
    depth[3, 4] = 0.0       # hole
    depth[5, 6] = 25000.0   # beyond max
    got = np.asarray(pp.bilateral_filter(jnp.array(depth), 20.0, 6))
    want = _np_bilateral(depth)
    np.testing.assert_allclose(got, want, atol=1.0)


def test_metricise_gates():
    d = jnp.array([[250.0, 500.0, 21000.0, 1000.0]])
    out = np.asarray(pp.metricise_depth(d, 20.0))
    np.testing.assert_allclose(out, [[0.0, 0.5, 0.0, 1.0]])


def test_vmap_backprojection():
    cam = CameraConfig(width=4, height=4, fx=2.0, fy=2.0, cx=2.0, cy=2.0)
    depth = jnp.full((4, 4), 1.0)
    vm = np.asarray(pp.compute_vmap(depth, cam, 10.0))
    # pixel (0,0): x = 1*(0-2)/2 = -1
    assert abs(vm[0, 0, 0] - (-1.0)) < 1e-6
    assert abs(vm[2, 0, 0] - 1.0) < 1e-6


def test_nmap_flat_plane_faces_camera():
    cam = CameraConfig(width=8, height=8, fx=4.0, fy=4.0, cx=4.0, cy=4.0)
    depth = jnp.full((8, 8), 2.0)
    vm = pp.compute_vmap(depth, cam, 10.0)
    nm = np.asarray(pp.compute_nmap(vm))
    # interior normals should be ±z (plane perpendicular to optical axis)
    inner = nm[:, 2:5, 2:5]
    assert np.all(np.abs(np.abs(inner[2]) - 1.0) < 1e-4)


def test_pyr_down_depth_shape_and_rejection():
    depth = np.full((8, 8), 2.0, np.float32)
    depth[0, 1] = 5.0  # outlier neighbour, >3σ from center 2.0
    out = np.asarray(pp.pyr_down_depth(jnp.array(depth)))
    assert out.shape == (4, 4)
    assert abs(out[0, 0] - 2.0) < 1e-5  # outlier rejected from average
    assert abs(out[2, 2] - 2.0) < 1e-5


def test_resize_nmap_normalized():
    nm = np.zeros((3, 4, 4), np.float32)
    nm[2] = 1.0
    out = np.asarray(pp.resize_nmap(jnp.array(nm)))
    assert out.shape == (3, 2, 2)
    np.testing.assert_allclose(np.sum(out * out, axis=0), 1.0, atol=1e-5)


def test_rgb_to_intensity_weights():
    rgb = np.zeros((1, 1, 3), np.uint8)
    rgb[0, 0] = [100, 50, 200]
    got = float(np.asarray(pp.rgb_to_intensity(jnp.array(rgb)))[0, 0])
    want = np.floor(0.299 * 100 + 0.587 * 50 + 0.114 * 200)
    assert got == want


def test_derivatives_horizontal_ramp():
    img = np.tile(np.arange(10, dtype=np.float32) * 10, (8, 1))
    dx, dy = pp.compute_derivatives(jnp.array(img))
    dx, dy = np.asarray(dx), np.asarray(dy)
    # interior: taps at x±1 differ by 2·10, so dx = 20·(2·0.52201+0.79451)
    expect = np.trunc(20 * (2 * 0.52201 + 0.79451))
    assert np.all(dx[1:-1, 2:-2] == expect)
    assert np.all(dy[1:-1, 2:-2] == 0)


def test_vertices_to_depth_cutoff():
    vm = np.zeros((3, 2, 2), np.float32)
    vm[2] = [[1.0, 7.0], [0.0, 3.0]]
    out = np.asarray(pp.vertices_to_depth(jnp.array(vm), 6.0))
    np.testing.assert_allclose(out, [[1.0, 0.0], [0.0, 3.0]])
