"""Pallas splat-resolve kernel vs the pure-XLA stencil — bit-level parity on
the same point-raster channels (SURVEY.md §4: unit tests of each kernel
against reference math)."""

import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu.ops.splat import combined_predict
from elasticfusion_tpu.surfels import SurfelMap
from elasticfusion_tpu.utils.synthetic import make_scene, pose_from_xyzrpy, render_frame


def _make_map(scene, cam, cfg_depth=3.0, n=4000, seed=0):
    """A plausible surfel map: back-project a rendered frame and subsample."""
    from elasticfusion_tpu.ops.preprocess import metricise_depth
    from elasticfusion_tpu.surfels import init_map_from_frame

    depth_mm, rgb = render_frame(scene[0], scene[1], np.eye(4), cam)
    raw = metricise_depth(jnp.asarray(depth_mm, jnp.float32), cfg_depth)
    m = init_map_from_frame(1 << 15, raw, raw, jnp.asarray(rgb), cam, cfg_depth)
    # age the confidences so the threshold gate has both outcomes
    rng = np.random.default_rng(seed)
    conf = jnp.asarray(rng.uniform(0.0, 3.0, m.capacity).astype(np.float32))
    return m._replace(conf=jnp.where(m.conf > 0, conf, 0.0))


def test_splat_resolve_matches_xla(scene, small_cam):
    m = _make_map(scene, small_cam)
    T = jnp.asarray(pose_from_xyzrpy(x=0.02, yaw=0.01), jnp.float32)
    kw = dict(time=jnp.float32(5.0), max_time=jnp.float32(5.0), time_delta=200,
              conf_threshold=0.5, max_depth=20.0)
    ref = combined_predict(m, T, small_cam, use_pallas=False, **kw)
    got = combined_predict(m, T, small_cam, use_pallas=True, **kw)

    for field in ref._fields:
        a = np.asarray(getattr(ref, field))
        b = np.asarray(getattr(got, field))
        # pixels whose blend set sits exactly at the BLEND_EPS front cutoff
        # can flip between the two compilations (FMA/association order); they
        # must be rare — everything else must match tightly
        close = np.isclose(a, b, rtol=1e-4, atol=1e-4)
        frac_bad = 1.0 - close.mean()
        assert frac_bad < 2e-3, (
            f"Prediction.{field}: {frac_bad*100:.2f}% of pixels differ "
            f"(pallas vs xla)"
        )
    # and it actually predicted something
    assert float(jnp.sum((got.depth > 0))) > 100
