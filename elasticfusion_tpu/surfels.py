"""Surfel map state — the TPU-native equivalent of `GlobalModel`
(/root/reference/Core/GlobalModel.{h,cpp}).

The reference stores surfels as an interleaved 48-byte VBO pair ping-ponged
through OpenGL transform feedback (GlobalModel.cpp:71-89; layout
Vertex.cpp:22-41: [pos.xyz, conf][packed color, _, initTime, lastTime]
[normal.xyz, radius]).  The TPU design is a structure-of-arrays pytree in HBM:

  - vector fields are stored `[3, N]` so the minormost (lane) dimension is the
    big surfel axis — `[N, 3]` would pad 3 lanes up to 128 (a 42x memory blowup
    under TPU tiling); `[3, N]` pads only the sublane dim 3->8.
  - scalar fields are `[N]`.
  - `count` is a traced scalar; slots `>= count` are dead.  Transform-feedback
    stream compaction + the GL primitives-written query (GlobalModel.cpp:
    624-650) become prefix-sum compaction over fixed-capacity arrays.
  - colors are kept as planar float RGB `[3, N]` instead of the reference's
    packed-into-one-float encoding (color.glsl:19-34) — packing was a GLSL
    attribute-slot hack and would cost decode ALU on every access here.

One buffer, functionally updated with donation — XLA aliases the input and
output, so there is no double-buffer copy at all.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import CameraConfig


class SurfelMap(NamedTuple):
    """Fixed-capacity surfel store.  Dead slots (index >= count) hold zeros."""

    pos: jax.Array      # [3, N] world-frame position, f32
    conf: jax.Array     # [N] confidence, f32
    color: jax.Array    # [3, N] RGB 0..255, f32
    init_t: jax.Array   # [N] creation tick (vColor.z in the reference), f32
    last_t: jax.Array   # [N] last-seen tick (vColor.w), f32
    normal: jax.Array   # [3, N] world-frame unit normal, f32
    radius: jax.Array   # [N] surfel disk radius (m), f32
    count: jax.Array    # scalar i32, live surfels in [0, count)

    @property
    def capacity(self) -> int:
        return self.pos.shape[1]


def empty_map(capacity: int) -> SurfelMap:
    return SurfelMap(
        pos=jnp.zeros((3, capacity), jnp.float32),
        conf=jnp.zeros((capacity,), jnp.float32),
        color=jnp.zeros((3, capacity), jnp.float32),
        init_t=jnp.zeros((capacity,), jnp.float32),
        last_t=jnp.zeros((capacity,), jnp.float32),
        normal=jnp.zeros((3, capacity), jnp.float32),
        radius=jnp.zeros((capacity,), jnp.float32),
        count=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# Surfel measurement model (surfels.glsl)
# ---------------------------------------------------------------------------


def surfel_radius(depth: jax.Array, norm_z: jax.Array, cam: CameraConfig) -> jax.Array:
    """Disk radius from depth and view-aligned normal z (surfels.glsl:19-34):
    r = sqrt2 * z / meanFocal, inflated by 1/|n_z| clamped to 2x."""
    mean_focal = (cam.fx + cam.fy) * 0.5
    r = depth * (1.41421356237 / mean_focal)
    rn = r / jnp.maximum(jnp.abs(norm_z), 1e-12)
    return jnp.minimum(2.0 * r, rn)


def pixel_confidence(x: jax.Array, y: jax.Array, weighting, cam: CameraConfig) -> jax.Array:
    """Gaussian radial-falloff measurement confidence (surfels.glsl:36-46).
    The reference hardcodes maxRadDist=400 for 640x480; we derive it from the
    intrinsics so other resolutions behave identically."""
    max_rad = math.sqrt(cam.cx * cam.cx + cam.cy * cam.cy)
    two_sigma_sq = 0.72  # 2 * 0.6^2, from the paper
    r2 = ((x - cam.cx) ** 2 + (y - cam.cy) ** 2) / (max_rad * max_rad)
    return jnp.exp(-r2 / two_sigma_sq) * weighting


def central_diff_normals(
    depth_m: jax.Array, cam: CameraConfig
) -> Tuple[jax.Array, jax.Array]:
    """Central-difference normal map from a float depth image, matching
    geometry.glsl getNormal(sampler2D): n = normalize(cross(v(x-1)-v(x+1),
    v(y-1)-v(y+1))) — note the backward-minus-forward orientation.

    Returns (normal [3,H,W], valid [H,W]); border/flat pixels invalid."""
    H, W = depth_m.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)

    def vert(d, du, dv):
        z = jnp.roll(jnp.roll(d, -dv, axis=0), -du, axis=1)
        return jnp.stack(
            [(u + du - cam.cx) * z / cam.fx, (v + dv - cam.cy) * z / cam.fy, z], axis=0
        )

    del_x = vert(depth_m, -1, 0) - vert(depth_m, 1, 0)
    del_y = vert(depth_m, 0, -1) - vert(depth_m, 0, 1)
    n = jnp.cross(del_x * 0.5, del_y * 0.5, axis=0)
    norm = jnp.sqrt(jnp.sum(n * n, axis=0, keepdims=True))
    n = n / jnp.maximum(norm, 1e-12)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    interior = (col > 0) & (col < W - 1) & (row > 0) & (row < H - 1)
    valid = interior & (norm[0] > 1e-12) & (depth_m > 0)
    return jnp.where(valid[None], n, 0.0), valid


def init_map_from_frame(
    capacity: int,
    depth_raw_m: jax.Array,       # [H,W] metric raw depth
    depth_filtered_m: jax.Array,  # [H,W] metric bilateral-filtered depth
    rgb: jax.Array,               # [H,W,3] u8
    cam: CameraConfig,
    max_depth: float,
) -> SurfelMap:
    """First-frame map bootstrap — GlobalModel::initialise fed by the two
    feedback buffers (GlobalModel.cpp:229-284, vertex_feedback.vert): position
    + color from RAW depth, normal + radius from FILTERED depth, init time 1
    (init_unstable.vert:34), confidence weighting 1."""
    H, W = depth_raw_m.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    z = depth_raw_m
    pos = jnp.stack(
        [(u - cam.cx) * z / cam.fx, (v - cam.cy) * z / cam.fy, z], axis=0
    ).reshape(3, -1)
    normal, nvalid = central_diff_normals(depth_filtered_m, cam)
    rad = surfel_radius(depth_filtered_m, normal[2], cam)
    conf = pixel_confidence(u, v, 1.0, cam)

    valid = ((z > 0) & (z <= max_depth) & nvalid).reshape(-1)
    n_px = H * W
    dest = jax.lax.optimization_barrier(
        jnp.where(valid, jnp.cumsum(valid.astype(jnp.int32)) - 1, capacity)
    )

    m = empty_map(capacity)
    one = jnp.ones((n_px,), jnp.float32)
    return m._replace(
        pos=m.pos.at[:, dest].set(pos, mode="drop"),
        conf=m.conf.at[dest].set(conf.reshape(-1), mode="drop"),
        color=m.color.at[:, dest].set(
            rgb.reshape(-1, 3).T.astype(jnp.float32), mode="drop"
        ),
        init_t=m.init_t.at[dest].set(one, mode="drop"),
        last_t=m.last_t.at[dest].set(one, mode="drop"),
        normal=m.normal.at[:, dest].set(normal.reshape(3, -1), mode="drop"),
        radius=m.radius.at[dest].set(rad.reshape(-1), mode="drop"),
        count=jnp.minimum(jnp.sum(valid.astype(jnp.int32)), capacity),
    )


def compact(m: SurfelMap, keep: jax.Array) -> SurfelMap:
    """Drop surfels where `keep` is False, preserving order — the equivalent
    of transform-feedback stream compaction (copy_unstable.geom:33-43).

    Implemented as a stable 2-operand PERMUTATION sort on the dead flag
    (kept rows move to the front in order) followed by ONE packed row-gather
    of all 13 channels at the permutation.  A 14-operand variadic sort drags
    every channel through every pass of the sorting network (~7x the data
    movement); the permutation+gather form moves each channel exactly once.
    Large scatters run at scalar-core rate on TPU, so gather/sort is the
    vectorized path; dead rows are zeroed so downstream masks (`z>0`,
    `conf>0`) behave as before."""
    from .ops.gatherpack import packed_gather

    cap = m.capacity
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    keep = keep & (slot < m.count)
    dead = (~keep).astype(jnp.int32)
    zero = jnp.where(keep, 1.0, 0.0)
    _, perm = jax.lax.sort((dead, slot), num_keys=1, is_stable=True)
    ch = packed_gather(
        (m.pos[0] * zero, m.pos[1] * zero, m.pos[2] * zero,
         m.conf * zero,
         m.color[0] * zero, m.color[1] * zero, m.color[2] * zero,
         m.init_t * zero, m.last_t * zero,
         m.normal[0] * zero, m.normal[1] * zero, m.normal[2] * zero,
         m.radius * zero),
        perm,
    )
    return SurfelMap(
        pos=jnp.stack(ch[0:3]),
        conf=ch[3],
        color=jnp.stack(ch[4:7]),
        init_t=ch[7],
        last_t=ch[8],
        normal=jnp.stack(ch[9:12]),
        radius=ch[12],
        count=jnp.sum(keep.astype(jnp.int32)),
    )
