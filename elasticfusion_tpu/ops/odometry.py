"""Dense RGB-D odometry residual/normal-equation ops.

TPU-native equivalents of the reference CUDA reduction kernels
(/root/reference/Core/Cuda/reduce.cu):
  - icpStep           (reduce.cu:204-401)  point-to-plane projective ICP rows
  - computeRgbResidual(reduce.cu:603-787)  photometric correspondence search
  - rgbStep           (reduce.cu:403-550)  photometric Jacobian rows
  - so3Step           (reduce.cu:789-973)  rotation-only LK pre-alignment

Design (not a translation): each step computes per-pixel 7-vector rows
[J | r] over the whole image, then forms the full 7×7 Gram matrix
G = rowsᵀ·rows with ONE tall-skinny matmul on the MXU.  G contains the 6×6
normal matrix A = G[:6,:6], the rhs b = G[:6,6], and Σr² = G[6,6] — exactly
the 29 floats the reference's two-stage warp-shuffle tree reduction produces
(reduce.cu:57-140, types.cuh:98-143), but with no host round-trip: the 6×6
solve happens on-device inside the same jitted Gauss-Newton loop.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .gatherpack import (
    gather_fx16,
    gather_packed,
    pack_channels,
    pack_fx16,
    packed_gather,
)
from .preprocess import SOBEL_SCALE


class Gram(NamedTuple):
    """Normal-equation payload of one reduction: A(6,6), b(6,), Σr², count."""

    A: jax.Array
    b: jax.Array
    sum_sq: jax.Array
    count: jax.Array


def _gram_outer(rows: jax.Array) -> jax.Array:
    """rows [K,N] -> rows @ rowsᵀ [K,K] without the hidden transpose.

    On TPU this is the Pallas streaming kernel (ops/gram_pallas.py): one
    [K,K] MXU dot per VMEM tile accumulated across a sequential grid —
    bandwidth-bound (~50 us at N=307k).  The XLA fallback chunks N into
    128-lane blocks and batches tiny [K,128]x[128,K] dots; both avoid the
    einsum("in,jn->ij") form, which materializes one operand as [N,K] with
    K padded to 128 lanes (~18x HBM blowup).  Either way this replaces the
    reference's warp-shuffle tree reduction (reduce.cu:57-140) with f32
    accumulation per block and no host round-trip."""
    K, N = rows.shape
    if jax.default_backend() == "tpu" and N >= 1024:
        from .gram_pallas import gram_outer_pallas

        return gram_outer_pallas(rows)
    pad = (-N) % 128
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad)))
    rc = jnp.swapaxes(rows.reshape(K, -1, 128), 0, 1)       # [C, K, 128]
    G = jax.lax.dot_general(
        rc, rc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                        # [C, K, K]
    return jnp.sum(G, axis=0)


def _gram_from_rows(rows: jax.Array, valid: jax.Array) -> Gram:
    """rows [7,N] (zeroed where invalid), valid [N] bool → Gram.  Produces
    the 29 floats of the reference's two-stage reduction (types.cuh:98-143)
    with no host round-trip: A = G[:6,:6], b = G[:6,6], Σr² = G[6,6]."""
    G = _gram_outer(rows)
    return Gram(
        A=G[:6, :6], b=G[:6, 6], sum_sq=G[6, 6], count=jnp.sum(valid.astype(jnp.float32))
    )


def _flat_gather(img: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """Gather a [H,W] or [C,H,W] image at flat pixel indices [N]."""
    if img.ndim == 2:
        return jnp.take(img.reshape(-1), flat_idx, axis=0)
    return jnp.take(img.reshape(img.shape[0], -1), flat_idx, axis=1)


# ---------------------------------------------------------------------------
# ICP (point-to-plane, projective data association) — reduce.cu:204-329
# ---------------------------------------------------------------------------


def icp_prev_table(vmap_g_prev: jax.Array, nmap_g_prev: jax.Array,
                   fx16: bool = False):
    """Pack the (loop-invariant) model vertex+normal maps for icp_step.

    fx16 packs two u16 fixed-point channels per lane — half the random-read
    bytes of the f32 table for the bandwidth-bound per-iteration gather
    (<=0.1 mm position quantization at typical scene ranges; kernel-golden
    tests keep exact f32)."""
    ch = (vmap_g_prev[0], vmap_g_prev[1], vmap_g_prev[2],
          nmap_g_prev[0], nmap_g_prev[1], nmap_g_prev[2])
    return pack_fx16(ch) if fx16 else pack_channels(ch)


def rgb_last_table(last_depth: jax.Array, last_image: jax.Array,
                   cloud: Optional[jax.Array] = None):
    """Pack the (loop-invariant) last depth+intensity (+ back-projected last
    cloud when given) for compute_rgb_residual — one row-gather serves both
    the correspondence
    search and rgb_step's point fetch."""
    if cloud is None:
        return pack_channels((last_depth, last_image))
    return pack_channels((last_depth, last_image, cloud[0], cloud[1], cloud[2]))


def rgb_static_gates(
    min_grad2_scaled: float,
    dIdx: jax.Array, dIdy: jax.Array,
    next_depth: jax.Array, next_image: jax.Array,
) -> jax.Array:
    """Pose-independent validity gates of compute_rgb_residual
    (reduce.cu:648-659): 4x4 non-zero neighbourhood, bounds, gradient
    magnitude, depth validity.  Loop-invariant — compute once per level."""
    H, W = next_image.shape
    yi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xi = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    nb_ok = jnp.ones((H, W), jnp.bool_)
    nz = next_image > 0
    for du in range(-2, 2):
        for dv in range(-2, 2):
            shifted = jnp.roll(jnp.roll(nz, -du, axis=0), -dv, axis=1)
            inb = ((yi + du >= 0) & (yi + du < H)
                   & (xi + dv >= 0) & (xi + dv < W))
            nb_ok = nb_ok & (shifted | ~inb)

    bounds = (xi < W - 5) & (yi < H - 1)
    grad_ok = (dIdx * dIdx + dIdy * dIdy) >= min_grad2_scaled
    return (nb_ok & bounds & grad_ok & (next_depth > 0)).reshape(H * W)


def rgb_cloud_table(cloud: jax.Array):
    """Pack the (loop-invariant) back-projected last cloud for rgb_step."""
    return pack_channels((cloud[0], cloud[1], cloud[2]))


def icp_step(
    T_curr: jax.Array,       # (4,4) current world←camera estimate
    vmap_curr: jax.Array,    # (3,H,W) current frame camera-space vertices
    nmap_curr: jax.Array,    # (3,H,W) current frame normals
    T_prev: jax.Array,       # (4,4) previous world←camera pose
    vmap_g_prev: jax.Array,  # (3,H,W) model prediction, WORLD frame
    nmap_g_prev: jax.Array,  # (3,H,W) model normals, WORLD frame
    fx: float, fy: float, cx: float, cy: float,
    dist_thresh: float = 0.10,
    angle_thresh_sin: float = 0.342020143,
    prev_table=None,   # pack_channels((v0,v1,v2,n0,n1,n2)) of the model maps
) -> Gram:
    """Point-to-plane ICP rows against the predicted model maps.

    Per-pixel logic mirrors ICPReduction::search/getProducts
    (reduce.cu:228-309): transform current vertex to world with T_curr,
    re-project into the previous camera, gather the model vertex/normal,
    gate on distance ≤0.10 m and normal-cross-product norm < sin 20°, and
    emit the row [n | s×n | n·(s−d)] with everything expressed in the
    *previous camera* frame."""
    C, H, W = vmap_curr.shape
    N = H * W
    Rc = T_curr[:3, :3]
    tc = T_curr[:3, 3]
    Rp_inv = T_prev[:3, :3].T
    tp = T_prev[:3, 3]

    v = vmap_curr.reshape(3, N)          # camera frame
    n = nmap_curr.reshape(3, N)
    valid_in = (v[2] > 0) & (jnp.sum(n * n, axis=0) > 1e-12)

    v_g = Rc @ v + tc[:, None]           # world
    v_cp = Rp_inv @ (v_g - tp[:, None])  # previous camera frame

    z = v_cp[2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1.0)
    u_proj = jnp.round(v_cp[0] * fx / safe_z + cx).astype(jnp.int32)
    v_proj = jnp.round(v_cp[1] * fy / safe_z + cy).astype(jnp.int32)
    in_img = (u_proj >= 0) & (v_proj >= 0) & (u_proj < W) & (v_proj < H) & (z >= 0)

    flat = jnp.clip(v_proj, 0, H - 1) * W + jnp.clip(u_proj, 0, W - 1)
    if prev_table is None:
        prev_table = icp_prev_table(vmap_g_prev, nmap_g_prev)
    if isinstance(prev_table, tuple) and prev_table[0] == "fx16":
        ch = gather_fx16(prev_table, flat)
        vprev_g = jnp.stack(ch[0:3])
        nprev_g = jnp.stack(ch[3:6])
        # quantized zeros decode to +-scale/2 noise: validity thresholds sit
        # above the noise floor (a real surfel normal is unit length)
        prev_valid = jnp.sum(nprev_g * nprev_g, axis=0) > 1e-2
    else:
        ch = gather_packed(prev_table, flat)
        vprev_g = jnp.stack(ch[0:3])
        nprev_g = jnp.stack(ch[3:6])
        prev_valid = (jnp.sum(vprev_g * vprev_g, axis=0) > 0) & (
            jnp.sum(nprev_g * nprev_g, axis=0) > 1e-12
        )

    n_g = Rc @ n                          # current normal in world
    dist = jnp.linalg.norm(vprev_g - v_g, axis=0)
    sine = jnp.linalg.norm(jnp.cross(n_g, nprev_g, axis=0), axis=0)

    found = (
        valid_in
        & in_img
        & prev_valid
        & (sine < angle_thresh_sin)
        & (dist <= dist_thresh)
    )

    # rows in previous-camera frame (reduce.cu:283-293)
    s_cp = Rp_inv @ (v_g - tp[:, None])
    d_cp = Rp_inv @ (vprev_g - tp[:, None])
    n_cp = Rp_inv @ nprev_g

    sxn = jnp.cross(s_cp, n_cp, axis=0)
    res = jnp.sum(n_cp * (s_cp - d_cp), axis=0)
    rows = jnp.concatenate([n_cp, sxn, res[None]], axis=0)  # [7,N]
    rows = jnp.where(found[None, :], rows, 0.0)
    return _gram_from_rows(rows, found)


# ---------------------------------------------------------------------------
# RGB photometric residual + step — reduce.cu:403-550, 603-787
# ---------------------------------------------------------------------------


class RgbCorrespondence(NamedTuple):
    """Vectorized DataTerm image (types.cuh:79-84)."""

    u0: jax.Array        # [N] matched pixel x in last image
    v0: jax.Array        # [N] matched pixel y in last image
    diff: jax.Array      # [N] intensity difference next−last
    valid: jax.Array     # [N] bool
    count: jax.Array     # scalar
    sigma_sum: jax.Array # scalar Σdiff²
    p: Optional[jax.Array] = None  # [3,N] last-cloud point at (v0,u0), when
                                   # the table carried cloud channels


def compute_rgb_residual(
    min_grad2_scaled: float,
    dIdx: jax.Array, dIdy: jax.Array,        # (H,W) next-image gradients
    last_depth: jax.Array, next_depth: jax.Array,  # (H,W) float m, 0 invalid
    last_image: jax.Array, next_image: jax.Array,  # (H,W) float intensity
    kt: jax.Array,         # (3,) K·t of inverse incremental transform
    krkinv: jax.Array,     # (3,3) K·R·K⁻¹
    max_depth_delta: float = 0.07,
    last_table=None,       # rgb_last_table(last_depth, last_image)
    static_gates=None,     # rgb_static_gates(...)
) -> RgbCorrespondence:
    """Dense photometric correspondence via depth-consistent reprojection,
    mirroring RGBResidual::getProducts (reduce.cu:636-716)."""
    H, W = next_image.shape
    N = H * W
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(N)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(N)

    if static_gates is None:
        static_gates = rgb_static_gates(
            min_grad2_scaled, dIdx, dIdy, next_depth, next_image
        )

    d1 = next_depth.reshape(N)
    td1 = d1 * (krkinv[2, 0] * x + krkinv[2, 1] * y + krkinv[2, 2]) + kt[2]
    safe_td1 = jnp.where(jnp.abs(td1) > 1e-12, td1, 1.0)
    u0 = jnp.round(
        (d1 * (krkinv[0, 0] * x + krkinv[0, 1] * y + krkinv[0, 2]) + kt[0]) / safe_td1
    ).astype(jnp.int32)
    v0 = jnp.round(
        (d1 * (krkinv[1, 0] * x + krkinv[1, 1] * y + krkinv[1, 2]) + kt[1]) / safe_td1
    ).astype(jnp.int32)
    in_img = (u0 >= 0) & (v0 >= 0) & (u0 < W) & (v0 < H)

    flat0 = jnp.clip(v0, 0, H - 1) * W + jnp.clip(u0, 0, W - 1)
    if last_table is None:
        last_table = rgb_last_table(last_depth, last_image)
    got = gather_packed(last_table, flat0)
    d0, last_i = got[0], got[1]
    p = jnp.stack(got[2:5]) if len(got) >= 5 else None
    match_ok = (d0 > 0) & (jnp.abs(td1 - d0) <= max_depth_delta) & (last_i != 0)

    valid = static_gates & in_img & match_ok
    diff = jnp.where(valid, next_image.reshape(N) - last_i, 0.0)
    return RgbCorrespondence(
        u0=u0,
        v0=v0,
        diff=diff,
        valid=valid,
        count=jnp.sum(valid.astype(jnp.float32)),
        sigma_sum=jnp.sum(diff * diff),
        p=p,
    )


def rgb_step(
    corres: RgbCorrespondence,
    sigma: jax.Array,           # scalar (or -1.0 for rgbOnly even weighting)
    cloud: jax.Array,           # (3,H,W) back-projected lastDepth (level intr.)
    fx: float, fy: float,
    dIdx: jax.Array, dIdy: jax.Array,
    cloud_table=None,      # rgb_cloud_table(cloud)
    cx: Optional[float] = None, cy: Optional[float] = None,
) -> Gram:
    """Photometric Jacobian rows, mirroring RGBReduction::getProducts
    (reduce.cu:420-478): gradients read at the *next*-image pixel, the 3D
    point read from the back-projected *last* depth at the matched pixel,
    Huber-like weight w = 1/(σ+|diff|).  (cx, cy) are accepted for
    interface stability; the point comes from the packed cloud channels."""
    C, H, W = cloud.shape
    N = H * W

    w = sigma + jnp.abs(corres.diff)
    w = jnp.where(w > 1.19209290e-07, 1.0 / w, 1.0)
    w = jnp.where(sigma == -1.0, 1.0, w)

    if corres.p is not None:
        p = corres.p
    else:
        flat0 = jnp.clip(corres.v0, 0, H - 1) * W + jnp.clip(corres.u0, 0, W - 1)
        if cloud_table is None:
            cloud_table = rgb_cloud_table(cloud)
        p = jnp.stack(gather_packed(cloud_table, flat0))
    safe_z = jnp.where(jnp.abs(p[2]) > 1e-12, p[2], 1.0)
    invz = 1.0 / safe_z

    gx = dIdx.reshape(N) * (w * SOBEL_SCALE)
    gy = dIdy.reshape(N) * (w * SOBEL_SCALE)
    v0r = gx * fx * invz
    v1r = gy * fy * invz
    v2r = -(v0r * p[0] + v1r * p[1]) * invz

    rows = jnp.stack(
        [
            v0r,
            v1r,
            v2r,
            -p[2] * v1r + p[1] * v2r,
            p[2] * v0r - p[0] * v2r,
            -p[1] * v0r + p[0] * v1r,
            -w * corres.diff,
        ],
        axis=0,
    )  # [7,N]
    rows = jnp.where(corres.valid[None, :], rows, 0.0)
    return _gram_from_rows(rows, corres.valid)


# ---------------------------------------------------------------------------
# SO(3) pre-alignment — reduce.cu:789-973
# ---------------------------------------------------------------------------


class GramSO3(NamedTuple):
    A: jax.Array       # (3,3)
    b: jax.Array       # (3,)
    sum_sq: jax.Array
    count: jax.Array


def so3_neighborhood_table(img: jax.Array):
    """Pack (img, x-1, x+1, y-1, y+1) shifted channels for so3_step —
    interior-only indices make pixel-domain rolls exact."""
    return pack_channels(
        (
            img,
            jnp.roll(img, 1, axis=1), jnp.roll(img, -1, axis=1),
            jnp.roll(img, 1, axis=0), jnp.roll(img, -1, axis=0),
        )
    )


def so3_step(
    last_image: jax.Array,   # (H,W) float intensity
    next_image: jax.Array,
    image_basis: jax.Array,  # (3,3) K R K⁻¹
    kinv: jax.Array,         # (3,3)
    krlr: jax.Array,         # (3,3) K R
    tables=None,             # (so3_neighborhood_table(next), ...(last))
) -> GramSO3:
    """Whole-image rotation-only Lucas-Kanade step, mirroring
    SO3Reduction::getProducts (reduce.cu:820-896).  Gradients are central
    differences with the reference's odd (back+c)/2−(fore+c)/2 = (back−fore)/2
    form — note the sign: gradient is NEGATIVE of d/dx."""
    H, W = next_image.shape
    N = H * W
    x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1).reshape(N)
    y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0).reshape(N)

    ref = jnp.stack([x, y, jnp.ones_like(x)], axis=0)       # (3,N)
    warped = image_basis @ ref
    safe_wz = jnp.where(jnp.abs(warped[2]) > 1e-12, warped[2], 1.0)
    wx = jnp.round(warped[0] / safe_wz).astype(jnp.int32)
    wy = jnp.round(warped[1] / safe_wz).astype(jnp.int32)

    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    found = (
        (wx >= 1) & (wx < W - 1) & (wy >= 1) & (wy < H - 1)
        & (xi >= 1) & (xi < W - 1) & (yi >= 1) & (yi < H - 1)
    )

    wxc = jnp.clip(wx, 1, W - 2)
    wyc = jnp.clip(wy, 1, H - 2)
    flat_w = wyc * W + wxc

    if tables is None:
        tables = (so3_neighborhood_table(next_image),
                  so3_neighborhood_table(last_image))
    next_table, last_table = tables
    n_at, n_xm, n_xp, n_ym, n_yp = gather_packed(next_table, flat_w)
    xc = jnp.clip(xi, 1, W - 2)
    yc = jnp.clip(yi, 1, H - 2)
    flat_l = yc * W + xc
    l_at, l_xm, l_xp, l_ym, l_yp = gather_packed(last_table, flat_l)

    gnx = (n_xm - n_xp) * 0.5
    gny = (n_ym - n_yp) * 0.5
    glx = (l_xm - l_xp) * 0.5
    gly = (l_ym - l_yp) * 0.5

    gx = (gnx + glx) * 0.5
    gy = (gny + gly) * 0.5

    point = kinv @ ref                                       # (3,N)
    z2 = point[2] * point[2]
    a, b_, c = krlr[0, 0], krlr[0, 1], krlr[0, 2]
    d, e, f = krlr[1, 0], krlr[1, 1], krlr[1, 2]
    g, h, i_ = krlr[2, 0], krlr[2, 1], krlr[2, 2]

    lp = jnp.stack(
        [
            (point[2] * (d * gy + a * gx) - gy * g * y - gx * g * x) / z2,
            (point[2] * (e * gy + b_ * gx) - gy * h * y - gx * h * x) / z2,
            (point[2] * (f * gy + c * gx) - gy * i_ * y - gx * i_ * x) / z2,
        ],
        axis=0,
    )
    jac = jnp.cross(lp, point, axis=0)                       # (3,N)
    resid = -(n_at - l_at)

    rows = jnp.concatenate([jac, resid[None]], axis=0)       # (4,N)
    rows = jnp.where(found[None, :], rows, 0.0)
    G = _gram_outer(rows)
    return GramSO3(
        A=G[:3, :3],
        b=G[:3, 3],
        sum_sq=G[3, 3],
        count=jnp.sum(found.astype(jnp.float32)),
    )


def project_to_point_cloud(
    depth: jax.Array, fx: float, fy: float, cx: float, cy: float
) -> jax.Array:
    """Back-project a depth image without validity gating, matching
    projectPointsKernel (cudafuncs.cu:670-709): z=0 → zero point."""
    H, W = depth.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    return jnp.stack(
        [(u - cx) * depth / fx, (v - cy) * depth / fy, depth], axis=0
    )


def solve_6x6(A: jax.Array, b: jax.Array) -> jax.Array:
    """On-device 6×6 solve (reference: Eigen ldlt on host,
    RGBDOdometry.cpp:522-537) as a fully UNROLLED Cholesky.

    A is the SPD Gauss-Newton normal matrix, so Cholesky is exact; the tiny
    damping guards rank deficiency when a frame has no valid pixels.  The
    unroll matters on TPU: `jnp.linalg.solve` lowers to a pivoted-LU routine
    whose sequential scalar control flow costs ~1 ms per call on the scalar
    core — inside the {10,5,4}-iteration GN loop that was most of the
    tracker's runtime.  ~110 straight-line scalar FMAs compile to nothing."""
    A = A + jnp.eye(6, dtype=A.dtype) * 1e-12
    return _chol_solve_unrolled(A, b, 6)


def _chol_solve_unrolled(A: jax.Array, b: jax.Array, n: int) -> jax.Array:
    """Unrolled dense Cholesky solve for a tiny SPD system (n <= 8)."""
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        inv_d[j] = jax.lax.rsqrt(jnp.maximum(s, 1e-30))
        for i in range(j + 1, n):
            s2 = A[i, j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 * inv_d[j]
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_d[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_d[i]
    return jnp.stack(x)


def solve_3x3(A: jax.Array, b: jax.Array) -> jax.Array:
    """Damped 3×3 solve by Cramer's rule — straight-line scalar ops instead
    of the TPU-hostile pivoted-LU path (used by the SO3 pre-alignment loop,
    reduce.cu:789-973 consumer)."""
    A = A + jnp.eye(3, dtype=A.dtype) * 1e-12
    c00 = A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1]
    c01 = A[1, 2] * A[2, 0] - A[1, 0] * A[2, 2]
    c02 = A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0]
    det = A[0, 0] * c00 + A[0, 1] * c01 + A[0, 2] * c02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    c10 = A[0, 2] * A[2, 1] - A[0, 1] * A[2, 2]
    c11 = A[0, 0] * A[2, 2] - A[0, 2] * A[2, 0]
    c12 = A[0, 1] * A[2, 0] - A[0, 0] * A[2, 1]
    c20 = A[0, 1] * A[1, 2] - A[0, 2] * A[1, 1]
    c21 = A[0, 2] * A[1, 0] - A[0, 0] * A[1, 2]
    c22 = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    x0 = (c00 * b[0] + c10 * b[1] + c20 * b[2]) * inv_det
    x1 = (c01 * b[0] + c11 * b[1] + c21 * b[2]) * inv_det
    x2 = (c02 * b[0] + c12 * b[1] + c22 * b[2]) * inv_det
    return jnp.stack([x0, x1, x2])
