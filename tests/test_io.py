"""IO round-trip tests: .klg, TUM directories, .freiburg trajectories, ATE,
PLY export."""

import numpy as np
import pytest

from elasticfusion_tpu.io import (
    KlgLogReader,
    TumLogReader,
    ate_rmse,
    load_ply,
    read_freiburg,
    read_groundtruth,
    save_ply,
    write_freiburg,
    write_klg,
)
from elasticfusion_tpu.se3 import np_rotation_to_quaternion
from elasticfusion_tpu.utils.synthetic import pose_from_xyzrpy


def _rand_frames(n, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (
            1_000_000 + 33_000 * i,
            rng.integers(0, 5000, (h, w)).astype(np.uint16),
            rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
        )
        for i in range(n)
    ]


def test_klg_roundtrip(tmp_path):
    frames = _rand_frames(5)
    p = tmp_path / "log.klg"
    write_klg(p, frames)
    r = KlgLogReader(p, width=32, height=24)
    assert r.num_frames == 5
    for i, f in enumerate(r):
        assert f.timestamp == frames[i][0]
        np.testing.assert_array_equal(f.depth_mm, frames[i][1])
        np.testing.assert_array_equal(f.rgb, frames[i][2])
    assert not r.has_more()
    r.rewind()
    assert r.get_next().timestamp == frames[0][0]
    r.fast_forward(3)
    assert r.get_next().timestamp == frames[3][0]


def test_klg_uncompressed_and_truncated(tmp_path):
    frames = _rand_frames(3)
    p = tmp_path / "raw.klg"
    write_klg(p, frames, compress_depth=False)
    r = KlgLogReader(p, width=32, height=24)
    np.testing.assert_array_equal(r.get_next().depth_mm, frames[0][1])
    # truncate mid-frame: clean EOFError, not garbage
    data = p.read_bytes()
    (tmp_path / "trunc.klg").write_bytes(data[: len(data) // 2])
    rt = KlgLogReader(tmp_path / "trunc.klg", width=32, height=24)
    with pytest.raises(EOFError):
        for _ in range(3):
            rt.get_next()


def test_tum_reader(tmp_path):
    from PIL import Image

    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rng = np.random.default_rng(0)
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(4):
        t = 100.0 + i * 0.033
        rgb = rng.integers(0, 255, (24, 32, 3)).astype(np.uint8)
        depth = rng.integers(0, 30000, (24, 32)).astype(np.uint16)
        Image.fromarray(rgb).save(tmp_path / "rgb" / f"{t:.6f}.png")
        Image.fromarray(depth, mode="I;16").save(tmp_path / "depth" / f"{t:.6f}.png")
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        # slightly offset depth timestamps to exercise association
        depth_lines.append(f"{t + 0.004:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t:.6f} {0.1*i} 0 0 0 0 0 1")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines))
    (tmp_path / "groundtruth.txt").write_text("\n".join(gt_lines))

    r = TumLogReader(tmp_path)
    assert r.num_frames == 4
    f = r.get_next()
    assert f.depth_mm.shape == (24, 32)
    assert f.rgb.shape == (24, 32, 3)
    # depth scaled 1/5000 m -> mm = units / 5
    assert f.depth_mm.max() <= 6000
    gt = read_groundtruth(tmp_path)
    assert len(gt) == 4
    np.testing.assert_allclose(gt[2][1][:3, 3], [0.2, 0, 0], atol=1e-9)


def test_freiburg_roundtrip(tmp_path):
    poses = [
        (1_000_000 + 33_000 * i, pose_from_xyzrpy(x=0.01 * i, yaw=0.02 * i))
        for i in range(10)
    ]
    p = tmp_path / "traj.freiburg"
    write_freiburg(p, poses)
    back = read_freiburg(p)
    assert len(back) == 10
    assert abs(back[0][0] - 1.0) < 1e-6  # microseconds -> seconds
    for (ts, T), (t2, T2) in zip(poses, back):
        np.testing.assert_allclose(T[:3, 3], T2[:3, 3], atol=1e-12)
        np.testing.assert_allclose(T[:3, :3], T2[:3, :3], atol=1e-9)


def test_ate_rmse():
    gt = [
        (i * 0.033, pose_from_xyzrpy(x=0.01 * i, y=0.002 * i)) for i in range(50)
    ]
    # estimate = ground truth in a different world frame + small noise
    off = pose_from_xyzrpy(x=1.0, z=-2.0, yaw=0.8)
    rng = np.random.default_rng(0)
    est = []
    for t, T in gt:
        Te = off @ T
        Te = Te.copy()
        Te[:3, 3] += rng.normal(scale=0.003, size=3)
        est.append((t, Te))
    r = ate_rmse(gt, est)
    assert r < 0.006  # alignment removes the frame offset; noise remains
    r_exact = ate_rmse(gt, [(t, off @ T) for t, T in gt])
    assert r_exact < 1e-9


def test_ply_roundtrip(tmp_path, small_cam):
    import jax.numpy as jnp

    from elasticfusion_tpu.surfels import empty_map

    m = empty_map(256)
    n = 100
    rng = np.random.default_rng(1)
    pos = rng.normal(size=(3, 256)).astype(np.float32)
    conf = np.linspace(0, 20, 256).astype(np.float32)
    m = m._replace(
        pos=jnp.asarray(pos),
        conf=jnp.asarray(conf),
        color=jnp.asarray(rng.integers(0, 255, (3, 256)).astype(np.float32)),
        normal=jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32)),
        radius=jnp.asarray(np.full(256, 0.01, np.float32)),
        count=jnp.int32(n),
    )
    p = tmp_path / "map.ply"
    written = save_ply(p, m, conf_threshold=10.0)
    expect = int((conf[:n] > 10.0).sum())
    assert written == expect
    rec = load_ply(p)
    assert len(rec) == expect
    keep = np.where(conf[:n] > 10.0)[0]
    np.testing.assert_allclose(rec["x"], pos[0, keep], rtol=1e-6)
    # normals are exported negated (ElasticFusion.cpp:741-743)
    np.testing.assert_allclose(
        rec["nx"], -np.asarray(m.normal)[0, keep], rtol=1e-6
    )
