"""elasticfusion_tpu — a TPU-native dense RGB-D surfel SLAM engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
mp3guy/ElasticFusion (reference mounted read-only at /root/reference; see
SURVEY.md for the structural analysis this build follows).
"""

from .config import CameraConfig, DEFAULT_CONFIG, EngineConfig

__all__ = [
    "CameraConfig",
    "EngineConfig",
    "DEFAULT_CONFIG",
]

__version__ = "0.1.0"
