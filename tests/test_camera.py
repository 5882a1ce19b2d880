"""Live camera ring buffer + synthetic backend."""

import time

import numpy as np

from elasticfusion_tpu.tools.camera import (
    FrameRingBuffer,
    LiveLogReader,
    SyntheticCamera,
)
from elasticfusion_tpu.io.klg import Frame


def test_ring_buffer_handoff():
    ring = FrameRingBuffer()
    assert ring.wait_for(-1, timeout=0.05) is None
    f = Frame(timestamp=7, depth_mm=np.zeros((2, 2), np.uint16),
              rgb=np.zeros((2, 2, 3), np.uint8))
    ring.push(f)
    got = ring.wait_for(-1, timeout=0.5)
    assert got is f
    # dropped-frame accounting when the consumer lags
    for i in range(5):
        ring.push(Frame(timestamp=i, depth_mm=f.depth_mm, rgb=f.rgb))
    ring.wait_for(0, timeout=0.5)
    assert ring.dropped >= 3


def test_live_reader_streams(small_cam):
    cam = SyntheticCamera(small_cam, fps=60.0, n_frames=6)
    rdr = LiveLogReader(cam)
    try:
        f0 = rdr.get_next(timeout=5.0)
        f1 = rdr.get_next(timeout=5.0)
        assert f1.timestamp > f0.timestamp
        assert f0.depth_mm.shape == (small_cam.height, small_cam.width)
        assert (f0.depth_mm > 0).mean() > 0.5
    finally:
        rdr.close()
