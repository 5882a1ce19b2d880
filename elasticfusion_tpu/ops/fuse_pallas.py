"""Pallas TPU kernel for fuse's pixel-domain stencils: the 3x3 window search
for the best association candidate (data.vert:123-158) and the contribution
scatter-by-winning-offset (the scatter-free merge accumulation of
ops/fuse.py) — both in ONE pass over haloed image tiles.

The XLA formulation materializes 9 shifted copies of ~11 candidate channels
for the search plus 9 shifted copies of 12 contribution channels; this
kernel reads each input channel once per tile into VMEM and emits the
per-pixel association results and the accumulated contribution images.

Input channels [18, Hp, Wp] (f32; ids as exact floats — capacity < 2^24):
  0     pred index + 1 (0 = empty, so the zero halo padding reads as empty)
  1-3   pred vert (camera frame)
  4-6   pred normal
  7     pred radius
  8     raw depth z (m; the measurement vertex is (xl z, yl z, z))
  9-11  measurement normal n_local
  12    measuring flag (0/1)
  13    conf_new
  14    rad_new
  15-17 rgb color
SMEM params [16]: R row-major (9), t (3), fx, fy, cx, cy.

Output channels [16, Hp, Wp]:
  0     best_id (f32; == cap when no match)
  1     best_off (0..8, -1 none)
  2     best_rad
  3     matched flag
  4-15  contribution images: [a, a_full, a_full*v_g(3), a_full*col(3),
        a_full*n_g(3), a_full*rad_new]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PADY = 8     # halo alignment: window search at q in w±1 reads candidates at
PADX = 128   # q±1 → radius 2; padded to tile-aligned DMA slices
R2 = 2

COS_HALF = 0.87758256189  # cos(0.5 rad), data.vert:148


def _window_kernel(par_ref, chan_hbm, out_ref, slab, sem):
    th, tw = out_ref.shape[1], out_ref.shape[2]
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    eh, ew = th + 2, tw + 2   # tile + 1-ring, where best_off must be known

    dma = pltpu.make_async_copy(
        chan_hbm.at[
            :, pl.ds(ty * th, th + 2 * PADY), pl.ds(tx * tw, tw + 2 * PADX)
        ],
        slab,
        sem,
    )
    dma.start()

    Rm = [par_ref[i] for i in range(9)]
    t0, t1, t2 = par_ref[9], par_ref[10], par_ref[11]
    fx, fy, cx, cy = par_ref[12], par_ref[13], par_ref[14], par_ref[15]
    cap = par_ref[16]

    # global pixel coords of the EXTENDED (tile+1ring) region
    row = (jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 0)
           + (ty * th - 1)).astype(jnp.float32)
    col = (jax.lax.broadcasted_iota(jnp.int32, (eh, ew), 1)
           + (tx * tw - 1)).astype(jnp.float32)
    xl = (col - cx) / fx
    yl = (row - cy) / fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)

    dma.wait()

    # ext-region slab slice: ext pixel (0,0) = global (ty*th-1, tx*tw-1) =
    # slab coords (PADY-1, PADX-1)
    def ext(c, dy=0, dx=0):
        oy = PADY - 1 + dy
        ox = PADX - 1 + dx
        return slab[c, oy:oy + eh, ox:ox + ew]

    z = ext(8)
    nlx, nly, nlz = ext(9), ext(10), ext(11)
    nl_norm = jnp.sqrt(nlx * nlx + nly * nly + nlz * nlz)

    # --- window search over 9 candidate offsets (data.vert:123-158) ---
    best_dist = jnp.full((eh, ew), 1000.0, jnp.float32)
    best_id = jnp.full((eh, ew), cap, jnp.float32)
    best_rad = jnp.zeros((eh, ew), jnp.float32)
    best_off = jnp.full((eh, ew), -1.0, jnp.float32)
    oi = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            cand1 = ext(0, dy, dx)          # index + 1; 0 = empty/halo
            cand = cand1 - 1.0
            vcx, vcy, vcz = ext(1, dy, dx), ext(2, dy, dx), ext(3, dy, dx)
            ncx, ncy, ncz = ext(4, dy, dx), ext(5, dy, dx), ext(6, dy, dx)
            has = cand1 > 0.0
            depth_ok = jnp.abs(vcz * lam - z * lam) < 0.05
            cx_ = yl * vcz - vcy
            cy_ = vcx - xl * vcz
            cz_ = xl * vcy - yl * vcx
            dist = jnp.sqrt(cx_ * cx_ + cy_ * cy_ + cz_ * cz_) / lam
            nn = ncx * nlx + ncy * nly + ncz * nlz
            denom = jnp.maximum(
                jnp.sqrt(ncx * ncx + ncy * ncy + ncz * ncz) * nl_norm, 1e-12
            )
            norm_ok = (jnp.abs(ncz) < 0.75) | (nn / denom > COS_HALF)
            ok = has & depth_ok & norm_ok & (dist < best_dist)
            best_dist = jnp.where(ok, dist, best_dist)
            best_id = jnp.where(ok, cand, best_id)
            best_rad = jnp.where(ok, ext(7, dy, dx), best_rad)
            best_off = jnp.where(ok, float(oi), best_off)
            oi += 1

    measuring = ext(12) > 0.0
    matched = measuring & (best_id < cap)

    # --- measurement contribution channels at ext pixels ---
    vlx = xl * z
    vly = yl * z
    # v_g = R @ v_local + t ; n_g = R @ n_local
    vgx = Rm[0] * vlx + Rm[1] * vly + Rm[2] * z + t0
    vgy = Rm[3] * vlx + Rm[4] * vly + Rm[5] * z + t1
    vgz = Rm[6] * vlx + Rm[7] * vly + Rm[8] * z + t2
    ngx = Rm[0] * nlx + Rm[1] * nly + Rm[2] * nlz
    ngy = Rm[3] * nlx + Rm[4] * nly + Rm[5] * nlz
    ngz = Rm[6] * nlx + Rm[7] * nly + Rm[8] * nlz

    conf = ext(13)
    rad_new = ext(14)
    a = jnp.where(matched, conf, 0.0)
    full_m = matched & (rad_new < 1.5 * best_rad)
    af = jnp.where(full_m, a, 0.0)
    meas = [
        a, af,
        af * vgx, af * vgy, af * vgz,
        af * ext(15), af * ext(16), af * ext(17),
        af * ngx, af * ngy, af * ngz,
        af * rad_new,
    ]

    # --- accumulate contributions at the winning pixel w = q + off ---
    # per output pixel w (ext coords 1..th, 1..tw): sum over offsets of
    # meas[q] where q = w - off and best_off[q] == oi
    acc = [jnp.zeros((th, tw), jnp.float32) for _ in range(12)]
    oi = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            sel = best_off[1 - dy:1 - dy + th, 1 - dx:1 - dx + tw] == float(oi)
            for k in range(12):
                mq = meas[k][1 - dy:1 - dy + th, 1 - dx:1 - dx + tw]
                acc[k] = acc[k] + jnp.where(sel, mq, 0.0)
            oi += 1

    out_ref[0] = best_id[1:1 + th, 1:1 + tw]
    out_ref[1] = best_off[1:1 + th, 1:1 + tw]
    out_ref[2] = best_rad[1:1 + th, 1:1 + tw]
    out_ref[3] = jnp.where(matched[1:1 + th, 1:1 + tw], 1.0, 0.0)
    for k in range(12):
        out_ref[4 + k] = acc[k]


@functools.partial(jax.jit, static_argnames=("fx", "fy", "cx", "cy", "cap",
                                             "interpret"))
def fuse_window(chan: jax.Array, params: jax.Array,
                fx: float, fy: float, cx: float, cy: float, cap: int,
                interpret: bool = False) -> jax.Array:
    """chan: [18, H, W] packed inputs (see module docstring); params: [12]
    f32 = R row-major + t.  Returns [16, H, W] packed outputs."""
    C, H, W = chan.shape
    TH, TW = 40, 128
    Hp = -(-H // TH) * TH
    Wp = -(-W // TW) * TW
    padded = jnp.pad(
        chan, ((0, 0), (PADY, Hp - H + PADY), (PADX, Wp - W + PADX))
    )
    par = jnp.concatenate([
        params.astype(jnp.float32),
        jnp.array([fx, fy, cx, cy, float(cap)], jnp.float32),
    ])

    out = pl.pallas_call(
        _window_kernel,
        grid=(Hp // TH, Wp // TW),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (16, TH, TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((16, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, TH + 2 * PADY, TW + 2 * PADX), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(par, padded)
    return out[:, :H, :W]
