"""Test config: force an 8-device virtual CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Tests run on a virtual 8-device CPU mesh.  The sandbox's sitecustomize
# eagerly registers the axon TPU backend at interpreter start, so env vars
# alone are too late — force the platform through jax.config instead.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from elasticfusion_tpu.config import CameraConfig, EngineConfig  # noqa: E402


@pytest.fixture(scope="session")
def small_cam() -> CameraConfig:
    # 160x120 keeps CPU tests fast; fx scaled from the 640-wide default
    return CameraConfig(width=160, height=120, fx=132.0, fy=132.0, cx=80.0, cy=60.0)


@pytest.fixture(scope="session")
def small_cfg(small_cam) -> EngineConfig:
    return EngineConfig(camera=small_cam)


@pytest.fixture(scope="session")
def scene():
    from elasticfusion_tpu.utils.synthetic import make_scene

    return make_scene(n_side=700)
