"""Depth/RGB preprocessing ops — TPU-native equivalents of the reference's
GLSL ComputePacks and CUDA pyramid kernels.

Reference behavior being matched (see SURVEY.md §2.2):
  - bilateral depth filter: /root/reference/Core/Shaders/depth_bilateral.frag
  - metric conversion:      depth_metric.frag (gate <300 mm or >maxD)
  - vmap/nmap creation:     Core/Cuda/cudafuncs.cu:128-229 (createVMap/createNMap)
  - depth pyrDown w/ 3σ color rejection, σ=30 mm: cudafuncs.cu:77-121
  - 5×5 Gaussian {1,4,6,4,1} pyrDown: cudafuncs.cu:393-558
  - vmap/nmap 2×2-average resize: cudafuncs.cu:414-505
  - BGR→intensity 0.114/0.299/0.587: cudafuncs.cu:583-595
  - Scharr-like derivatives ±0.52201/±0.79451: cudafuncs.cu:613-667

Design notes (TPU-first, not a translation):
  - No NaN sentinels: invalid pixels are encoded as 0-depth / zero vectors plus
    explicit boolean masks. NaN breaks XLA fusion heuristics and `where` chains
    are cheaper on the VPU.
  - vmaps/nmaps are channels-first `[3, H, W]` float32 so the minormost dims
    are (H, W) — W=640 is a multiple of 128 (lane dim), avoiding the 42×
    padding blowup of an `[H, W, 3]` layout.
  - Stencils are expressed as unrolled shifted adds on padded arrays; XLA
    fuses the whole stencil into one VPU loop — no gather, no conv dilation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import CameraConfig

# 5-tap binomial weights used by both pyrDown flavours (cudafuncs.cu:97, 512)
_GAUSS5 = (1.0, 4.0, 6.0, 4.0, 1.0)
# per-|offset| weights of the depth pyrDown (cudafuncs.cu:96: {0.375,0.25,0.0625})
_DEPTH_W = (0.0625, 0.25, 0.375, 0.25, 0.0625)


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Value of x at (y+dy, x+dx) with zero padding, same shape as x."""
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(2 * abs(dy) or 0, 0), (2 * abs(dx) or 0, 0)]
    # simpler: pad both sides by |d| then slice
    py, px = abs(dy), abs(dx)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(py, py), (px, px)])
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(xp, py + dy, H, axis=x.ndim - 2),
        px + dx,
        W,
        axis=x.ndim - 1,
    )


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_filter(
    depth_mm: jax.Array, max_depth: float = 20.0, radius: int = 6
) -> jax.Array:
    """Bilateral filter on raw depth (float, millimetres).

    Matches depth_bilateral.frag: 13×13 window, σ_space=4.5, σ_color=30 mm,
    gate `value > maxD*1000 || value < 300` → 0.
    """
    sigma_space2_inv_half = 0.024691358
    sigma_color2_inv_half = 0.000555556
    center = depth_mm.astype(jnp.float32)
    num = jnp.zeros_like(center)
    den = jnp.zeros_like(center)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = _shift2d(center, dy, dx)
            space2 = float(dy * dy + dx * dx)
            color2 = (center - nb) * (center - nb)
            w = jnp.exp(-(space2 * sigma_space2_inv_half + color2 * sigma_color2_inv_half))
            # zero-padded border pixels contribute w·0 to num but also w to den;
            # mask them out to mimic the shader's clamped loop bounds
            inside = _shift2d(jnp.ones_like(center), dy, dx)
            num = num + nb * w * inside
            den = den + w * inside
    out = jnp.round(num / jnp.maximum(den, 1e-12))
    gate = (center > max_depth * 1000.0) | (center < 300.0)
    return jnp.where(gate, 0.0, out)


@jax.jit
def metricise_depth(depth_mm: jax.Array, max_depth: float = 20.0) -> jax.Array:
    """uint16 mm → float32 m, with the same <300 mm / >maxD gate → 0
    (depth_metric.frag)."""
    d = depth_mm.astype(jnp.float32)
    gate = (d > max_depth * 1000.0) | (d < 300.0)
    return jnp.where(gate, 0.0, d / 1000.0)


def compute_vmap(
    depth_m: jax.Array, cam: CameraConfig, depth_cutoff: float
) -> jax.Array:
    """Back-project metric depth into a camera-frame vertex map [3,H,W].

    Matches computeVmapKernel (cudafuncs.cu:121-148); invalid (z==0 or
    z>=cutoff) → all-zero column (reference uses NaN).
    """
    H, W = depth_m.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    z = depth_m
    valid = (z > 0.0) & (z < depth_cutoff)
    vx = z * (u - cam.cx) * (1.0 / cam.fx)
    vy = z * (v - cam.cy) * (1.0 / cam.fy)
    vmap = jnp.stack([vx, vy, z], axis=0)
    return jnp.where(valid[None], vmap, 0.0)


def vmap_valid(vmap: jax.Array) -> jax.Array:
    """Validity mask of a [3,H,W] vertex map: z>0."""
    return vmap[2] > 0.0


def compute_nmap(vmap: jax.Array) -> jax.Array:
    """Normal map from forward differences, matching computeNmapKernel
    (cudafuncs.cu:170-214): n = normalize(cross(v(x+1)−v, v(y+1)−v));
    last row/col and any-invalid-neighbor → zero normal."""
    v00 = vmap
    v01 = jnp.roll(vmap, -1, axis=2)  # (x+1)
    v10 = jnp.roll(vmap, -1, axis=1)  # (y+1)
    a = v01 - v00
    b = v10 - v00
    n = jnp.cross(a, b, axis=0)
    norm = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    n = n / jnp.maximum(norm, 1e-12)
    H, W = vmap.shape[1], vmap.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    edge = (col == W - 1) | (row == H - 1)
    valid = (
        vmap_valid(v00) & vmap_valid(v01) & vmap_valid(v10) & ~edge & (norm[0] > 1e-12)
    )
    return jnp.where(valid[None], n, 0.0)


def _subsample2(x: jax.Array) -> jax.Array:
    """x[::2, ::2] via reshape+slice — a per-tap strided slice makes each
    stencil tap its own slow HLO; one full-res stencil + one subsample is
    ~25x faster on TPU."""
    H, W = x.shape[-2] // 2 * 2, x.shape[-1] // 2 * 2
    x = x[..., :H, :W]
    x = x.reshape(*x.shape[:-2], H // 2, 2, W // 2, 2)
    return x[..., :, 0, :, 0]


@jax.jit
def pyr_down_depth(depth_m: jax.Array, sigma_color: float = 0.03) -> jax.Array:
    """Depth half-resolution downsample with 3σ rejection (σ=30 mm),
    matching pyrDownGaussKernel (cudafuncs.cu:77-121) but in metres.

    Computed as a full-resolution stencil then one 2x subsample (the even
    pixels are exactly the reference's output grid)."""
    center = depth_m
    num = jnp.zeros_like(center)
    den = jnp.zeros_like(center)
    ones = jnp.ones_like(depth_m)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            nb = _shift2d(depth_m, dy, dx)
            inside = _shift2d(ones, dy, dx)
            w = _DEPTH_W[dy + 2] * _DEPTH_W[dx + 2]
            keep = (jnp.abs(nb - center) < 3.0 * sigma_color) & (inside > 0)
            num = num + jnp.where(keep, nb * w, 0.0)
            den = den + jnp.where(keep, w, 0.0)
    full = jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0)
    return _subsample2(full)


@jax.jit
def pyr_down_gauss(img: jax.Array) -> jax.Array:
    """5×5 {1,4,6,4,1} Gaussian half-res downsample for float images with
    0-as-invalid masking (pyrDownKernelGaussF, cudafuncs.cu:393-411 —
    reference skips NaN pixels; here 0-pixels)."""
    valid = (img > 0).astype(jnp.float32)
    num = jnp.zeros_like(img)
    den = jnp.zeros_like(img)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            w = _GAUSS5[dy + 2] * _GAUSS5[dx + 2]
            nb = _shift2d(img, dy, dx)
            m = _shift2d(valid, dy, dx)
            num = num + nb * m * w
            den = den + m * w
    return _subsample2(jnp.where(den > 0, num / jnp.maximum(den, 1e-12), 0.0))


@jax.jit
def pyr_down_intensity(img: jax.Array) -> jax.Array:
    """Plain 5×5 Gaussian downsample for intensity images
    (pyrDownKernelIntensityGauss, cudafuncs.cu:516-540)."""
    f = img.astype(jnp.float32)
    ones = jnp.ones(img.shape, jnp.float32)
    num = jnp.zeros_like(f)
    den = jnp.zeros_like(f)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            w = _GAUSS5[dy + 2] * _GAUSS5[dx + 2]
            num = num + _shift2d(f, dy, dx) * w * _shift2d(ones, dy, dx)
            den = den + w * _shift2d(ones, dy, dx)
    return _subsample2(num / jnp.maximum(den, 1e-12))


@jax.jit
def resize_vmap(vmap: jax.Array) -> jax.Array:
    """2×2-average half-res resize of a [3,H,W] vertex map; any invalid source
    → invalid (resizeMapKernel<false>, cudafuncs.cu:414-479)."""
    return _resize_map(vmap, normalize=False)


@jax.jit
def resize_nmap(nmap: jax.Array) -> jax.Array:
    """Same as resize_vmap but renormalized (resizeMapKernel<true>)."""
    return _resize_map(nmap, normalize=True)


def _resize_map(m: jax.Array, normalize: bool) -> jax.Array:
    # crop odd trailing row/col (fern-resolution images can be odd-sized)
    H2, W2 = (m.shape[1] // 2) * 2, (m.shape[2] // 2) * 2
    m = m[:, :H2, :W2].reshape(3, H2 // 2, 2, W2 // 2, 2)
    x00 = m[:, :, 0, :, 0]
    x01 = m[:, :, 0, :, 1]
    x10 = m[:, :, 1, :, 0]
    x11 = m[:, :, 1, :, 1]
    if normalize:
        vs = [jnp.sum(x * x, axis=0) > 1e-24 for x in (x00, x01, x10, x11)]
    else:
        vs = [x[2] > 0 for x in (x00, x01, x10, x11)]
    valid = vs[0] & vs[1] & vs[2] & vs[3]
    avg = (x00 + x01 + x10 + x11) * 0.25
    if normalize:
        norm = jnp.sqrt(jnp.sum(avg * avg, axis=0, keepdims=True))
        avg = avg / jnp.maximum(norm, 1e-12)
    return jnp.where(valid[None], avg, 0.0)


@jax.jit
def rgb_to_intensity(rgb: jax.Array) -> jax.Array:
    """uint8 [H,W,3] RGB → float32 intensity, truncated to int like the
    reference (bgr2IntensityKernel: 0.114 b + 0.299 r + 0.587 g, cast to u8)."""
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    return jnp.floor(0.299 * r + 0.587 * g + 0.114 * b)


SOBEL_SCALE = 1.0 / 8.0  # sobelScale = 1/2^sobelSize, RGBDOdometry.cpp:39-40


@jax.jit
def compute_derivatives(img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scharr-like image gradients, matching applyKernel + gsobel constants
    (cudafuncs.cu:613-667).  The CUDA loop indexes the kernel reversed
    (kernelIndex=8 descending), so the effective correlation kernels are
      dx: [[-a,0,a],[-b,0,b],[-a,0,a]],  dy: dxᵀ   (a=0.52201, b=0.79451).
    Border handling: out-of-bounds neighbours are skipped (clamped loop).
    Returns float32 (reference stores int16; truncation is immaterial after
    the gradient-magnitude gating)."""
    a, b = 0.52201, 0.79451
    f = img.astype(jnp.float32)
    inside = jnp.ones_like(f)

    def tap(dy, dx):
        return _shift2d(f, dy, dx), _shift2d(inside, dy, dx)

    dxv = jnp.zeros_like(f)
    dyv = jnp.zeros_like(f)
    for (dy, dx, wx, wy) in [
        (-1, -1, -a, -a), (-1, 0, 0.0, -b), (-1, 1, a, -a),
        (0, -1, -b, 0.0), (0, 1, b, 0.0),
        (1, -1, -a, a), (1, 0, 0.0, b), (1, 1, a, a),
    ]:
        nb, m = tap(dy, dx)
        dxv = dxv + wx * nb * m
        dyv = dyv + wy * nb * m
    return jnp.trunc(dxv), jnp.trunc(dyv)


@jax.jit
def vertices_to_depth(vmap: jax.Array, cutoff: float = 6.0) -> jax.Array:
    """Extract the z channel with a cutoff (verticesToDepthKernel,
    cudafuncs.cu:563-580; maxDepthRGB=6 m, RGBDOdometry.cpp:42)."""
    z = vmap[2]
    return jnp.where((z > cutoff) | (z <= 0), 0.0, z)
