"""Native C++ .klg decoder vs the pure-Python reader (bit-exactness)."""

import numpy as np
import pytest

from elasticfusion_tpu.io.klg import (
    KlgLogReader,
    NativeKlgLogReader,
    _native_lib,
    open_klg,
    write_klg,
)

pytestmark = pytest.mark.skipif(
    _native_lib() is None, reason="native decoder not built (make -C native)"
)


def _frames(n=4, h=48, w=64):
    rng = np.random.default_rng(3)
    return [
        (
            500_000 + 33_000 * i,
            rng.integers(0, 8000, (h, w)).astype(np.uint16),
            rng.integers(0, 255, (h, w, 3)).astype(np.uint8),
        )
        for i in range(n)
    ]


def test_native_matches_python(tmp_path):
    frames = _frames()
    p = tmp_path / "n.klg"
    write_klg(p, frames)
    rn = NativeKlgLogReader(p, width=64, height=48)
    rp = KlgLogReader(p, width=64, height=48)
    assert rn.num_frames == rp.num_frames == 4
    for fn, fp in zip(rn, rp):
        assert fn.timestamp == fp.timestamp
        np.testing.assert_array_equal(fn.depth_mm, fp.depth_mm)
        np.testing.assert_array_equal(fn.rgb, fp.rgb)
    rn.close()


def test_native_seek_and_errors(tmp_path):
    frames = _frames()
    p = tmp_path / "n.klg"
    write_klg(p, frames)
    r = NativeKlgLogReader(p, width=64, height=48)
    r.fast_forward(2)
    assert r.get_next().timestamp == frames[2][0]
    r.rewind()
    assert r.get_next().timestamp == frames[0][0]
    r.fast_forward(99)
    assert not r.has_more()
    with pytest.raises(EOFError):
        r.get_next()
    r.close()
    # truncated file: the index shrinks to the complete prefix
    data = p.read_bytes()
    (tmp_path / "t.klg").write_bytes(data[: len(data) - 100])
    rt = NativeKlgLogReader(tmp_path / "t.klg", width=64, height=48)
    assert rt.num_frames == 3
    rt.close()


def test_open_klg_prefers_native(tmp_path):
    frames = _frames(1)
    p = tmp_path / "n.klg"
    write_klg(p, frames)
    assert isinstance(open_klg(p, 64, 48), NativeKlgLogReader)
