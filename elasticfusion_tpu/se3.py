"""SE(3) / SO(3) utilities.

Device-side (jax.numpy, float32) versions are used inside jitted tracking loops;
host-side (numpy, float64) versions accumulate the global pose, mirroring the
reference's precision split (CUDA kernels f32, host Eigen/Sophus double —
SURVEY.md §7 "Numerical parity").

Reference math: OdometryProvider.h:34-96 (Rodrigues exp + projective jacobians),
RGBDOdometry.cpp:539-570 (left-multiplied incremental update + SVD
re-orthonormalization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Device-side (f32, traceable)
# ---------------------------------------------------------------------------


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues formula: axis-angle (3,) → rotation matrix (3,3).

    Matches OdometryProvider::rodrigues2-style exponential
    (/root/reference/Core/Utils/OdometryProvider.h:34-63) with a Taylor
    fallback near θ=0.
    """
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2)
    K = skew(w)
    K2 = K @ K
    # sin(θ)/θ and (1-cos θ)/θ²; Taylor for small θ
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    return jnp.eye(3, dtype=w.dtype) + a * K + b * K2


def skew(w: jax.Array) -> jax.Array:
    z = jnp.zeros((), dtype=w.dtype)
    return jnp.array(
        [[z, -w[2], w[1]], [w[2], z, -w[0]], [-w[1], w[0], z]]
    )


def se3_exp(xi: jax.Array) -> jax.Array:
    """(6,) twist [v, w] → 4×4 transform.  v = translation part, w = rotation."""
    v, w = xi[:3], xi[3:]
    theta2 = jnp.dot(w, w)
    theta = jnp.sqrt(theta2)
    K = skew(w)
    K2 = K @ K
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / jnp.where(small, 1.0, theta))
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.where(small, 1.0, theta2))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - a) / jnp.where(small, 1.0, theta2))
    R = jnp.eye(3, dtype=xi.dtype) + a * K + b * K2
    V = jnp.eye(3, dtype=xi.dtype) + b * K + c * K2
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(V @ v)
    return T


def apply_update(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Left-multiply incremental update, as RGBDOdometry.cpp:543-551:
    resultR = rotUpdate * resultR ; resultT = rotUpdate * resultT + transUpdate."""
    R_up = so3_exp(xi[3:])
    t_up = xi[:3]
    R = R_up @ T[:3, :3]
    t = R_up @ T[:3, 3] + t_up
    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(R)
    out = out.at[:3, 3].set(t)
    return out


def invert(T: jax.Array) -> jax.Array:
    R = T[:3, :3]
    t = T[:3, 3]
    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(R.T)
    out = out.at[:3, 3].set(-(R.T @ t))
    return out


def orthonormalize(T: jax.Array) -> jax.Array:
    """Project the rotation block to SO(3) (RGBDOdometry.cpp:566-570 uses an
    SVD).  Here: Newton–Schulz iteration R <- 1.5 R - 0.5 R RᵀR, which
    converges cubically to the same polar factor for near-orthogonal input —
    the only case this sees (products of exact rotations with f32 drift).
    On TPU a 3×3 SVD lowers to a ~1 ms sequential LAPACK-style routine;
    three straight-line 3×3 matmuls are free."""
    R = T[:3, :3]
    for _ in range(3):
        R = 1.5 * R - 0.5 * (R @ (R.T @ R))
    return T.at[:3, :3].set(R)


def se3_log_norm(T: jax.Array) -> jax.Array:
    """‖log T‖ over the full SE(3) (Sophus log norm) — device twin of the
    host `engine._se3_log_norm`, used by the velocity-adaptive fusion weight
    (ElasticFusion.cpp:371-383)."""
    R = T[:3, :3]
    cos_t = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    small = theta < 1e-8
    coeff = jnp.where(
        small, 0.5, theta / jnp.maximum(2.0 * jnp.sin(theta), 1e-12)
    )
    w = coeff * jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    K = skew(w / jnp.maximum(theta, 1e-12))
    half = theta * 0.5
    cot = jnp.where(small, 1.0, half / jnp.tan(jnp.maximum(half, 1e-12)))
    V_inv = jnp.where(
        small, jnp.eye(3, dtype=T.dtype),
        jnp.eye(3, dtype=T.dtype) - 0.5 * theta * K + (1.0 - cot) * (K @ K),
    )
    v = V_inv @ T[:3, 3]
    return jnp.sqrt(jnp.dot(v, v) + jnp.dot(w, w))


def se3_log_rot_norm(T: jax.Array) -> jax.Array:
    """‖log R‖ used by the velocity-adaptive fusion weight
    (ElasticFusion.cpp:371-383: rodrigues2(rot).norm())."""
    cos_theta = jnp.clip((jnp.trace(T[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(cos_theta)


# ---------------------------------------------------------------------------
# Host-side (numpy f64)
# ---------------------------------------------------------------------------


def np_orthonormalize(T: np.ndarray) -> np.ndarray:
    U, _, Vt = np.linalg.svd(T[:3, :3])
    d = np.linalg.det(U @ Vt)
    R = U @ np.diag([1.0, 1.0, d]) @ Vt
    out = T.copy()
    out[:3, :3] = R
    return out


def np_rotation_to_quaternion(R: np.ndarray) -> np.ndarray:
    """Rotation matrix → quaternion (qx, qy, qz, qw), TUM ordering
    (ElasticFusion.cpp:128-137 writes qx qy qz qw)."""
    t = np.trace(R)
    if t > 0:
        s = 0.5 / np.sqrt(t + 1.0)
        qw = 0.25 / s
        qx = (R[2, 1] - R[1, 2]) * s
        qy = (R[0, 2] - R[2, 0]) * s
        qz = (R[1, 0] - R[0, 1]) * s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0)) * 2.0
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        q[3] = (R[k, j] - R[j, k]) / s
        qx, qy, qz, qw = q
    q = np.array([qx, qy, qz, qw])
    return q / np.linalg.norm(q)


def np_quaternion_to_rotation(q: np.ndarray) -> np.ndarray:
    """(qx, qy, qz, qw) → rotation matrix."""
    x, y, z, w = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )
