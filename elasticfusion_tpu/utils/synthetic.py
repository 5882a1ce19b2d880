"""Synthetic RGB-D scene generation for tests and benchmarks.

The reference repo has no tests (SURVEY.md §4); our verification strategy
uses closed-form synthetic scenes with known SE(3) camera motion.  A scene is
a dense textured point cloud; frames are rendered by point projection with
scatter-min z-buffering — the same primitive the splat predictor uses.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..config import CameraConfig


def make_scene(n_side: int = 900, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """A bumpy, textured wall ~2 m in front of the origin plus a side wall
    and floor, as a dense point cloud.  Returns (points [N,3], colors [N,3] u8)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(-2.0, 2.0, n_side)
    ys = np.linspace(-1.5, 1.5, n_side)
    X, Y = np.meshgrid(xs, ys)
    Z = (
        2.0
        + 0.25 * np.sin(2.1 * X) * np.cos(1.7 * Y)
        + 0.10 * np.sin(7.3 * X + 1.0)
        + 0.05 * np.cos(11.0 * Y)
    )
    pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    # procedural texture: smooth multi-scale sinusoids → rich gradients
    tex = (
        128
        + 60 * np.sin(3.0 * X) * np.cos(4.0 * Y)
        + 40 * np.sin(13.0 * X + 2.0 * Y)
        + 20 * np.sin(29.0 * (X + Y))
    )
    r = np.clip(tex, 1, 255)
    g = np.clip(255 - tex * 0.7, 1, 255)
    b = np.clip(tex * 0.5 + 64, 1, 255)
    cols = np.stack([r.ravel(), g.ravel(), b.ravel()], axis=1).astype(np.uint8)

    # jitter to avoid aliasing artifacts
    pts += rng.normal(scale=1e-4, size=pts.shape)
    return pts.astype(np.float32), cols


def render_frame(
    points: np.ndarray,
    colors: np.ndarray,
    T_wc: np.ndarray,
    cam: CameraConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """Render (depth_mm uint16 [H,W], rgb uint8 [H,W,3]) from pose T_wc
    (world←camera) by nearest-point z-buffering."""
    T_cw = np.linalg.inv(T_wc)
    p_cam = points @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = p_cam[:, 2]
    ok = z > 0.05
    u = np.round(p_cam[:, 0] * cam.fx / z + cam.cx).astype(np.int64)
    v = np.round(p_cam[:, 1] * cam.fy / z + cam.cy).astype(np.int64)
    ok &= (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)

    flat = v[ok] * cam.width + u[ok]
    zo = z[ok]
    co = colors[ok]

    order = np.argsort(-zo)  # far-to-near: near points overwrite
    flat, zo, co = flat[order], zo[order], co[order]

    depth = np.zeros(cam.height * cam.width, np.float32)
    rgb = np.zeros((cam.height * cam.width, 3), np.uint8)
    depth[flat] = zo
    rgb[flat] = co

    depth_mm = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
    return depth_mm.reshape(cam.height, cam.width), rgb.reshape(
        cam.height, cam.width, 3
    )


def pose_from_xyzrpy(
    x=0.0, y=0.0, z=0.0, roll=0.0, pitch=0.0, yaw=0.0
) -> np.ndarray:
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy_, sy = np.cos(yaw), np.sin(yaw)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy_, -sy, 0], [sy, cy_, 0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = Rz @ Ry @ Rx
    T[:3, 3] = [x, y, z]
    return T
