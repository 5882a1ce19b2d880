"""Golden tests: odometry reduction ops vs straightforward NumPy
re-implementations (SURVEY.md §4 — kernel-vs-golden strategy; these goldens
also guard future Pallas ports of the reductions)."""

import jax.numpy as jnp
import numpy as np

from elasticfusion_tpu.ops.odometry import icp_step, so3_step


def _numpy_icp(T_curr, v1, n1, T_prev, vg0, ng0, fx, fy, cx, cy,
               dist_t=0.10, sin_t=0.342020143):
    """Literal per-pixel loop mirroring ICPReduction::search/getProducts
    (reduce.cu:228-309)."""
    H, W = v1.shape[1:]
    Rc, tc = T_curr[:3, :3], T_curr[:3, 3]
    Rp, tp = T_prev[:3, :3], T_prev[:3, 3]
    A = np.zeros((6, 6)); b = np.zeros(6); ss = 0.0; cnt = 0
    for y in range(H):
        for x in range(W):
            v = v1[:, y, x]; n = n1[:, y, x]
            if v[2] <= 0 or (n @ n) <= 1e-12:
                continue
            vg = Rc @ v + tc
            vcp = Rp.T @ (vg - tp)
            if abs(vcp[2]) <= 1e-12 or vcp[2] < 0:
                zsafe = 1.0 if abs(vcp[2]) <= 1e-12 else vcp[2]
            else:
                zsafe = vcp[2]
            u = int(np.round(vcp[0] * fx / zsafe + cx))
            vv = int(np.round(vcp[1] * fy / zsafe + cy))
            if not (0 <= u < W and 0 <= vv < H and vcp[2] >= 0):
                continue
            d = vg0[:, vv, u]; nd = ng0[:, vv, u]
            if (d @ d) <= 0 or (nd @ nd) <= 1e-12:
                continue
            ngl = Rc @ n
            if np.linalg.norm(np.cross(ngl, nd)) >= sin_t:
                continue
            if np.linalg.norm(d - vg) > dist_t:
                continue
            s_cp = Rp.T @ (vg - tp)
            d_cp = Rp.T @ (d - tp)
            n_cp = Rp.T @ nd
            row = np.concatenate([n_cp, np.cross(s_cp, n_cp),
                                  [n_cp @ (s_cp - d_cp)]])
            A += np.outer(row[:6], row[:6])
            b += row[:6] * row[6]
            ss += row[6] ** 2
            cnt += 1
    return A, b, ss, cnt


def test_icp_step_matches_numpy_golden():
    rng = np.random.default_rng(5)
    H, W = 12, 16
    fx = fy = 20.0; cx, cy = 8.0, 6.0
    z = 1.5 + 0.2 * rng.random((H, W))
    u = np.arange(W)[None, :].repeat(H, 0)
    v = np.arange(H)[:, None].repeat(W, 1)
    v1 = np.stack([(u - cx) * z / fx, (v - cy) * z / fy, z]).astype(np.float32)
    n1 = rng.normal(size=(3, H, W)).astype(np.float32)
    n1 /= np.linalg.norm(n1, axis=0, keepdims=True)
    # model side: same cloud slightly shifted in world, normals similar
    vg0 = (v1 + 0.01 * rng.normal(size=v1.shape)).astype(np.float32)
    ng0 = (n1 + 0.05 * rng.normal(size=n1.shape)).astype(np.float32)
    ng0 /= np.linalg.norm(ng0, axis=0, keepdims=True)

    T_curr = np.eye(4, dtype=np.float32)
    T_curr[:3, 3] = [0.004, -0.002, 0.003]
    T_prev = np.eye(4, dtype=np.float32)

    g = icp_step(
        jnp.asarray(T_curr), jnp.asarray(v1), jnp.asarray(n1),
        jnp.asarray(T_prev), jnp.asarray(vg0), jnp.asarray(ng0),
        fx, fy, cx, cy,
    )
    A, b, ss, cnt = _numpy_icp(
        T_curr.astype(np.float64), v1.astype(np.float64), n1.astype(np.float64),
        T_prev.astype(np.float64), vg0.astype(np.float64), ng0.astype(np.float64),
        fx, fy, cx, cy,
    )
    assert int(g.count) == cnt and cnt > 50
    np.testing.assert_allclose(np.asarray(g.A), A, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g.b), b, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(g.sum_sq), ss, rtol=2e-4)


def test_so3_step_zero_for_identical_images():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (30, 40)).astype(np.float32))
    K = jnp.asarray([[20.0, 0, 20], [0, 20.0, 15], [0, 0, 1]], jnp.float32)
    Kinv = jnp.linalg.inv(K)
    g = so3_step(img, img, jnp.eye(3), Kinv, K)
    # identical images at identity basis: residual exactly zero, b zero
    assert float(g.sum_sq) == 0.0
    np.testing.assert_allclose(np.asarray(g.b), 0.0, atol=1e-6)
    assert float(g.count) > 500
