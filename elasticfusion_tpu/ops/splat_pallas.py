"""Pallas TPU kernel for the splat-resolve stencil of `combinedPredict`
(/root/reference/Core/Shaders/combo_splat.frag:37-60 behavior; see
ops/splat.py for the full design).

The pure-XLA formulation materializes ~400 shifted copies of the 13 channel
images across the two passes (z-min then blend) — ~12 ms/frame at 640x480.
This kernel tiles the image, DMAs each (tile + 2px halo) slab of the packed
channel images into VMEM once, and runs BOTH passes of the 5x5 ray/disk
stencil over the tile entirely from VMEM: one read of the inputs instead of
~50, VPU-bound, <1 ms.

Layout: inputs are packed [13, H+2*PADY, W+2*PADX] — pre-padded so every
halo DMA slice is in bounds AND tile-aligned (sublane multiples of 8, lane
multiples of 128; Mosaic rejects unaligned memref slices).  Zero padding
clears the validity plane exactly like the XLA path's zero-filled shifts.
Channel order: p(3), n(3), rad, conf, col(3), it, valid.  Output is packed
[13, H, W]: col(3), vertex(3), conf, normal(3), rad, time, depth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 2            # stencil radius (5x5 footprint)
BLEND_EPS = 0.01  # m; matches ops/splat.py
_BIG = 3.4e38


# Halo paddings chosen so every DMA slice is tile-aligned (sublane multiple
# of 8, lane multiple of 128): the slab carries 4 extra rows and 64 extra
# lanes on each side, of which only R are used by the stencil.
PADY = 4
PADX = 64


def _resolve_kernel(cam_ref, chan_hbm, out_ref, slab, sem):
    """One image tile: DMA the haloed channel slab, z-min pass, blend pass."""
    th, tw = out_ref.shape[1], out_ref.shape[2]
    ty = pl.program_id(0)
    tx = pl.program_id(1)

    dma = pltpu.make_async_copy(
        chan_hbm.at[
            :, pl.ds(ty * th, th + 2 * PADY), pl.ds(tx * tw, tw + 2 * PADX)
        ],
        slab,
        sem,
    )
    dma.start()

    fx = cam_ref[0]
    fy = cam_ref[1]
    cx = cam_ref[2]
    cy = cam_ref[3]

    # pixel rays for this tile (global pixel coordinates); TPU iota must be
    # integer-typed
    row = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 0) + ty * th
           ).astype(jnp.float32)
    col = (jax.lax.broadcasted_iota(jnp.int32, (th, tw), 1) + tx * tw
           ).astype(jnp.float32)
    lx = (col - cx) / fx
    ly = (row - cy) / fy

    dma.wait()

    def candidate(dy, dx):
        oy = PADY - R + dy
        ox = PADX - R + dx
        px = slab[0, oy:oy + th, ox:ox + tw]
        py = slab[1, oy:oy + th, ox:ox + tw]
        pz = slab[2, oy:oy + th, ox:ox + tw]
        nx = slab[3, oy:oy + th, ox:ox + tw]
        ny = slab[4, oy:oy + th, ox:ox + tw]
        nz = slab[5, oy:oy + th, ox:ox + tw]
        rad = slab[6, oy:oy + th, ox:ox + tw]
        ok = slab[12, oy:oy + th, ox:ox + tw] > 0
        # ray/disk intersection (combo_splat.frag:37-50)
        ln = lx * nx + ly * ny + nz
        pn = px * nx + py * ny + pz * nz
        zc = pn / jnp.where(jnp.abs(ln) > 1e-12, ln, 1.0)
        d2 = (zc * lx - px) ** 2 + (zc * ly - py) ** 2 + (zc - pz) ** 2
        hit = ok & (jnp.abs(ln) > 1e-12) & (zc > 0) & (d2 <= rad * rad)
        return zc, d2, hit, rad

    # pass 1: front depth per pixel
    zmin = jnp.full((th, tw), _BIG, jnp.float32)
    for dy in range(2 * R + 1):
        for dx in range(2 * R + 1):
            zc, _, hit, _ = candidate(dy, dx)
            zmin = jnp.where(hit & (zc < zmin), zc, zmin)

    # pass 2: blend every splat within BLEND_EPS of the front surface
    wsum = jnp.zeros((th, tw), jnp.float32)
    acc = [jnp.zeros((th, tw), jnp.float32) for _ in range(9)]
    wbest = jnp.zeros((th, tw), jnp.float32)
    it_best = jnp.zeros((th, tw), jnp.float32)
    for dy in range(2 * R + 1):
        for dx in range(2 * R + 1):
            oy = PADY - R + dy
            ox = PADX - R + dx
            zc, d2, hit, rad = candidate(dy, dx)
            conf = slab[7, oy:oy + th, ox:ox + tw]
            front = hit & (zc <= zmin + BLEND_EPS)
            gauss = 1.0 - d2 / jnp.maximum(rad * rad, 1e-12)
            w = jnp.where(
                front,
                jnp.maximum(conf, 1e-3) * jnp.maximum(gauss, 0.05),
                0.0,
            )
            wsum = wsum + w
            acc[0] = acc[0] + w * zc
            acc[1] = acc[1] + w * conf
            acc[2] = acc[2] + w * slab[3, oy:oy + th, ox:ox + tw]
            acc[3] = acc[3] + w * slab[4, oy:oy + th, ox:ox + tw]
            acc[4] = acc[4] + w * slab[5, oy:oy + th, ox:ox + tw]
            acc[5] = acc[5] + w * rad
            acc[6] = acc[6] + w * slab[8, oy:oy + th, ox:ox + tw]
            acc[7] = acc[7] + w * slab[9, oy:oy + th, ox:ox + tw]
            acc[8] = acc[8] + w * slab[10, oy:oy + th, ox:ox + tw]
            it = slab[11, oy:oy + th, ox:ox + tw]
            take = w > wbest
            it_best = jnp.where(take, it, it_best)
            wbest = jnp.maximum(w, wbest)

    found = wsum > 0
    inv_w = jnp.where(found, 1.0 / jnp.maximum(wsum, 1e-12), 0.0)
    zed = acc[0] * inv_w
    nx = acc[2] * inv_w
    ny = acc[3] * inv_w
    nz = acc[4] * inv_w
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    nscale = jnp.where(
        found & (nlen > 1e-12), 1.0 / jnp.maximum(nlen, 1e-12), 0.0
    )
    out_ref[0] = acc[6] * inv_w            # color r
    out_ref[1] = acc[7] * inv_w            # color g
    out_ref[2] = acc[8] * inv_w            # color b
    out_ref[3] = zed * lx                  # vertex x
    out_ref[4] = zed * ly                  # vertex y
    out_ref[5] = zed                       # vertex z
    out_ref[6] = acc[1] * inv_w            # conf
    out_ref[7] = nx * nscale               # normal x
    out_ref[8] = ny * nscale               # normal y
    out_ref[9] = nz * nscale               # normal z
    out_ref[10] = acc[5] * inv_w           # radius
    out_ref[11] = it_best                  # init time
    out_ref[12] = zed                      # depth


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "interpret"))
def splat_resolve(chan: jax.Array, fx: float, fy: float, cx: float, cy: float,
                  interpret: bool = False) -> jax.Array:
    """chan: [13, H, W] packed candidate channels (p3, n3, rad, conf, col3,
    it, valid) from the point raster.  Returns [13, H, W] packed prediction
    (col3, vertex3, conf, normal3, rad, time, depth)."""
    C, H, W = chan.shape
    TH, TW = 40, 128
    # pad to tile multiples plus the (aligned) stencil halo
    Hp = -(-H // TH) * TH
    Wp = -(-W // TW) * TW
    padded = jnp.pad(
        chan, ((0, 0), (PADY, Hp - H + PADY), (PADX, Wp - W + PADX))
    )
    cam = jnp.array([fx, fy, cx, cy], jnp.float32)

    out = pl.pallas_call(
        _resolve_kernel,
        grid=(Hp // TH, Wp // TW),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C, TH, TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, TH + 2 * PADY, TW + 2 * PADX), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(cam, padded)
    return out[:, :H, :W]
