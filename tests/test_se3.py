import jax.numpy as jnp
import numpy as np
import pytest

from elasticfusion_tpu import se3


def test_so3_exp_identity():
    R = se3.so3_exp(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)


def test_so3_exp_known_rotation():
    # 90° about z
    R = np.asarray(se3.so3_exp(jnp.array([0.0, 0.0, np.pi / 2])))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)
    np.testing.assert_allclose(R, expected, atol=1e-3)  # f32 trig precision


def test_so3_exp_orthonormal():
    rng = np.random.default_rng(0)
    for _ in range(10):
        w = rng.normal(size=3)
        R = np.asarray(se3.so3_exp(jnp.array(w, dtype=jnp.float32)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99


def test_se3_exp_pure_translation():
    T = np.asarray(se3.se3_exp(jnp.array([1.0, 2.0, 3.0, 0, 0, 0])))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_invert_roundtrip():
    rng = np.random.default_rng(1)
    xi = jnp.array(rng.normal(scale=0.5, size=6), dtype=jnp.float32)
    T = se3.se3_exp(xi)
    I = np.asarray(T @ se3.invert(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_apply_update_matches_left_multiply():
    rng = np.random.default_rng(2)
    T = se3.se3_exp(jnp.array(rng.normal(scale=0.3, size=6), dtype=jnp.float32))
    xi = jnp.array(rng.normal(scale=0.01, size=6), dtype=jnp.float32)
    out = np.asarray(se3.apply_update(T, xi))
    R_up = np.asarray(se3.so3_exp(xi[3:]))
    expected_R = R_up @ np.asarray(T)[:3, :3]
    expected_t = R_up @ np.asarray(T)[:3, 3] + np.asarray(xi[:3])
    np.testing.assert_allclose(out[:3, :3], expected_R, atol=1e-6)
    np.testing.assert_allclose(out[:3, 3], expected_t, atol=1e-6)


def test_orthonormalize_fixes_drift():
    R = np.eye(3) + np.random.default_rng(3).normal(scale=1e-3, size=(3, 3))
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    out = np.asarray(se3.orthonormalize(jnp.array(T)))
    np.testing.assert_allclose(out[:3, :3] @ out[:3, :3].T, np.eye(3), atol=1e-5)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(20):
        w = rng.normal(size=3)
        R = np.asarray(se3.so3_exp(jnp.array(w, dtype=jnp.float32)), dtype=np.float64)
        q = se3.np_rotation_to_quaternion(R)
        R2 = se3.np_quaternion_to_rotation(q)
        np.testing.assert_allclose(R, R2, atol=1e-5)


def test_log_rot_norm():
    angle = 0.3
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(se3.so3_exp(jnp.array([0.0, 0.0, angle])))
    assert abs(float(se3.se3_log_rot_norm(jnp.array(T))) - angle) < 1e-5
