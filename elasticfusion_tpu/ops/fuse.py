"""Surfel fusion and cleanup — TPU-native equivalent of `GlobalModel::fuse`
and `GlobalModel::clean` (/root/reference/Core/GlobalModel.cpp:356-671) and
their GLSL programs (data.vert/geom, update.vert, copy_unstable.vert/geom).

Reference structure being matched (SURVEY.md §3.3):
  - *Data pass* (data.vert): per input pixel, search the index-map window for
    the best existing surfel; matched pixels rasterize an update into the
    winner's texel, unmatched ones stream out new unstable surfels.
  - *Update pass* (update.vert): every map surfel reads its update texel and
    merges by confidence-weighted averaging.
  - *Clean pass* (copy_unstable.vert/geom): stream all surfels, culling
    merged/free-space-violating/stale-unstable ones, and compact survivors.

TPU design differences (deliberate, not oversights):
  - The rasterize-to-surfel-texel trick (data.vert:176-187) resolves multiple
    pixels matching one surfel by arbitrary last-write-wins.  Here ALL
    matching measurements accumulate via scatter-add (segment-sum) and merge
    in one confidence-weighted step — deterministic and strictly more
    informative.
  - The reference's 4x4 half-pixel-stepped texture loop (data.vert:123-158)
    samples 16 positions that alias onto a 3x3 pixel window with binomial
    weights {1,2,1}x{1,2,1}; we search that window directly and use the same
    weights for clean's count thresholds (count>8, zCount>4,
    copy_unstable.vert:75-111) so the culling aggressiveness matches.
  - Transform-feedback compaction becomes prefix-sum compaction
    (surfels.compact).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from ..surfels import (
    SurfelMap,
    central_diff_normals,
    compact,
    pixel_confidence,
    surfel_radius,
)
from .gatherpack import packed_gather
from .splat import IndexPrediction

# clean()'s 3x3 window weights — the pixel-aliasing multiplicity of the
# reference's 16-sample loop (see module docstring)
_W3 = (1.0, 2.0, 1.0)


class FuseStats(NamedTuple):
    matched: jax.Array   # pixels merged into existing surfels
    added: jax.Array     # new unstable surfels appended
    count: jax.Array     # live surfel count after fuse


def _window_search_xla(pred, z, n_local, measuring, conf_new, rad_new, rgb,
                       R, t, cam: CameraConfig, cap: int):
    """XLA fallback for the fused window-search + contribution-accumulation
    stencil (ops/fuse_pallas.py is the TPU path): 9 shifted-image candidate
    tests (data.vert:123-158) followed by the shift-by-winning-offset
    contribution accumulation.  Returns (matched [H,W] bool, contrib
    [12,H,W])."""
    H, W = z.shape
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)
    xl = (u - cam.cx) / cam.fx
    yl = (v - cam.cy) / cam.fy
    lam = jnp.sqrt(xl * xl + yl * yl + 1.0)
    ray_norm = lam  # |(xl, yl, 1)|
    best_dist = jnp.full((H, W), 1000.0)
    best_id = jnp.full((H, W), cap, jnp.int32)  # cap == no match
    best_rad = jnp.zeros((H, W))
    index = pred.index

    def shifted(img, dy, dx):
        return jnp.roll(jnp.roll(img, -dy, axis=-2), -dx, axis=-1)

    best_off = jnp.full((H, W), -1, jnp.int32)  # winning window offset 0..8
    for oi, (dy, dx) in enumerate(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    ):
            cand = shifted(index, dy, dx)
            inb = (vi + dy >= 0) & (vi + dy < H) & (ui + dx >= 0) & (ui + dx < W)
            cand = jnp.where(inb, cand, -1)
            vc = shifted(pred.vert, dy, dx)
            nc = shifted(pred.normal, dy, dx)
            has = cand >= 0
            # depth along ray agreement (data.vert:142)
            depth_ok = jnp.abs(vc[2] * lam - z * lam) < 0.05
            # perpendicular point-to-ray distance (data.vert:144)
            cx_ = yl * vc[2] - vc[1]
            cy_ = vc[0] - xl * vc[2]
            cz_ = xl * vc[1] - yl * vc[0]
            dist = jnp.sqrt(cx_ * cx_ + cy_ * cy_ + cz_ * cz_) / ray_norm
            # normal compatibility unless grazing (data.vert:148)
            nn = jnp.sum(nc * n_local, axis=0)
            denom = jnp.maximum(
                jnp.linalg.norm(nc, axis=0) * jnp.linalg.norm(n_local, axis=0), 1e-12
            )
            # |acos(x)| < 0.5  ⟺  x > cos(0.5): same gate without the
            # per-pixel transcendental
            norm_ok = (jnp.abs(nc[2]) < 0.75) | (nn / denom > 0.87758256189)
            ok = has & depth_ok & norm_ok & (dist < best_dist)
            best_dist = jnp.where(ok, dist, best_dist)
            best_id = jnp.where(ok, cand, best_id)
            best_rad = jnp.where(ok, shifted(pred.radius, dy, dx), best_rad)
            best_off = jnp.where(ok, oi, best_off)

    # matched ⟺ some window candidate won (best_off records it); ids are NOT
    # compared against `cap` — in shard-local mode (see fuse docstring) the
    # prediction carries global ids that exceed this shard's capacity
    matched = measuring & (best_off >= 0)

    v_local = jnp.stack([xl * z, yl * z, z], axis=0)
    v_g = (R @ v_local.reshape(3, -1) + t[:, None])            # world
    n_g = R @ n_local.reshape(3, -1)
    col_meas = rgb.reshape(-1, 3).T.astype(jnp.float32)

    # radius gate (update.vert:61): merge geometry only if not much coarser
    full_merge = matched.reshape(-1) & (
        rad_new.reshape(-1) < 1.5 * best_rad.reshape(-1)
    )
    a = jnp.where(matched.reshape(-1), conf_new.reshape(-1), 0.0)
    a_full = jnp.where(full_merge, a, 0.0)

    meas = jnp.stack(
        [a, a_full,
         a_full * v_g[0], a_full * v_g[1], a_full * v_g[2],
         a_full * col_meas[0], a_full * col_meas[1], a_full * col_meas[2],
         a_full * n_g[0], a_full * n_g[1], a_full * n_g[2],
         a_full * rad_new.reshape(-1)]
    ).reshape(12, H, W)
    contrib = jnp.zeros_like(meas)
    for oi, (dy, dx) in enumerate(
        [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    ):
        # pixels q whose winning candidate sits at offset (dy,dx) contribute
        # to the surfel winning pixel w = q + (dy,dx): shift BY the offset
        sel = (best_off == oi)[None]
        contrib = contrib + shifted(jnp.where(sel, meas, 0.0), -dy, -dx)
    return matched, contrib


def fuse(
    m: SurfelMap,
    pred: IndexPrediction,
    T_wc: jax.Array,
    tick,
    rgb: jax.Array,              # [H,W,3] u8/f32
    depth_raw_m: jax.Array,      # [H,W] metric raw depth (DEPTH_METRIC)
    depth_filtered_m: jax.Array, # [H,W] metric filtered (DEPTH_METRIC_FILTERED)
    cam: CameraConfig,
    max_depth: float,
    weighting,
    return_updated_pred: bool = False,
    use_pallas: Optional[bool] = None,
    id_base=None,
    append_on=None,
    append_base=None,
    append_free=None,
):
    """GlobalModel::fuse (GlobalModel.cpp:356-525).  See module docstring.

    Shard-local mode (parallel/shard_step.py): `m` is ONE shard of the map
    while `pred` carries GLOBAL surfel ids.  `id_base` (i32) is this shard's
    first global id (winner test becomes pred.index == id_base + slot);
    `append_on` (bool) gates the append tail (only the frame's owner shard
    appends); `append_base` (i32) is the GLOBAL id of the first appended
    surfel (owner's id_base + count, identical on every shard so the
    updated-pred images stay replicated).

    With `return_updated_pred` the POST-fuse index prediction is derived in
    the pixel domain and returned as a third output, replacing the
    reference's second `predictIndices` render before clean
    (ElasticFusion.cpp:554-555) — which here costs a full-capacity packed
    sort (~9 ms at 640x480/512k).  This is exact for merges (a raster winner
    projects to its own pixel by construction, so its pixel's contribution
    sums ARE its update) and for appended surfels (a new surfel projects
    exactly to the pixel it was measured at); the only divergence from a
    re-render is a merged surfel whose averaged position crosses a pixel
    boundary — its entry stays at the old pixel, within the 3x3 window every
    consumer searches anyway."""
    H, W = depth_raw_m.shape
    n_px = H * W
    cap = m.capacity

    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)

    # --- measurement construction (data.vert:76-105) ---
    z = depth_raw_m
    xl = (u - cam.cx) / cam.fx
    yl = (v - cam.cy) / cam.fy
    v_local = jnp.stack([xl * z, yl * z, z], axis=0)           # raw-depth vertex
    n_local, n_valid = central_diff_normals(depth_filtered_m, cam)
    rad_new = surfel_radius(depth_filtered_m, n_local[2], cam)
    conf_new = pixel_confidence(u, v, weighting, cam)

    # --- validity gates (data.vert:110-114) ---
    sub = ((ui % 2) == (tick % 2)) & ((vi % 2) == (tick % 2))
    nb_ok = jnp.ones((H, W), jnp.bool_)
    for dy, dx in ((0, -1), (-1, 0), (0, 1), (1, 0)):
        nb = jnp.roll(jnp.roll(z, -dy, axis=0), -dx, axis=1)
        row_in = (vi + dy >= 0) & (vi + dy < H) & (ui + dx >= 0) & (ui + dx < W)
        nb_ok &= jnp.where(row_in, nb > 0, False)
    measuring = sub & nb_ok & (z > 0) & (z <= max_depth) & n_valid

    R = T_wc[:3, :3]
    t = T_wc[:3, 3]

    # --- window search (data.vert:123-158) + merge accumulation
    # (update.vert:49-92, generalized to all matches).  Scatter-free: a
    # surfel wins at most ONE index-map pixel w (it projects to a single
    # pixel in the point raster), and a measuring pixel q matches it only
    # when w lies in q's 3x3 window.  So all of s's measurement
    # contributions live in the 3x3 neighbourhood of w: accumulate them as
    # pixel-domain images (shift by the recorded winning offset) and fetch
    # them per-surfel with ONE packed row-gather — big duplicate-index
    # scatters run at scalar rate on TPU and are avoided entirely.
    on_tpu = jax.default_backend() == "tpu"
    if use_pallas if use_pallas is not None else on_tpu:
        # fused one-pass Pallas stencil: search + contribution accumulation
        # read each channel once per VMEM tile (ops/fuse_pallas.py)
        from .fuse_pallas import fuse_window

        chan = jnp.concatenate([
            (pred.index + 1).astype(jnp.float32)[None],
            pred.vert, pred.normal, pred.radius[None],
            z[None], n_local,
            measuring.astype(jnp.float32)[None],
            conf_new[None], rad_new[None],
            jnp.moveaxis(rgb.astype(jnp.float32), -1, 0),
        ], axis=0)
        params = jnp.concatenate(
            [R.reshape(-1), t]
        ).astype(jnp.float32)
        outk = fuse_window(
            chan, params, cam.fx, cam.fy, cam.cx, cam.cy, cap,
            interpret=not on_tpu,
        )
        matched = outk[3] > 0.0
        contrib = outk[4:16]
    else:
        matched, contrib = _window_search_xla(
            pred, z, n_local, measuring, conf_new, rad_new, rgb, R, t,
            cam, cap,
        )
    new_pt = measuring & ~matched

    v_g = (R @ v_local.reshape(3, -1) + t[:, None])            # world
    n_g = R @ n_local.reshape(3, -1)
    col_meas = rgb.reshape(-1, 3).T.astype(jnp.float32)

    # per-surfel fetch at its own projected pixel; valid only if it is the
    # index-map winner there (the contribution images are keyed to winners)
    T_cw_R = R.T
    pos_cs = T_cw_R @ (m.pos - t[:, None])
    zs = pos_cs[2]
    safe_zs = jnp.where(jnp.abs(zs) > 1e-12, zs, 1.0)
    us = jnp.floor(pos_cs[0] * cam.fx / safe_zs + cam.cx).astype(jnp.int32)
    vs = jnp.floor(pos_cs[1] * cam.fy / safe_zs + cam.cy).astype(jnp.int32)
    proj_ok = (zs > 0) & (us >= 0) & (vs >= 0) & (us < W) & (vs < H)
    wflat = jnp.where(
        proj_ok, jnp.clip(vs, 0, H - 1) * W + jnp.clip(us, 0, W - 1), 0
    )
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    if id_base is not None:
        slot_ids = slot_ids + id_base
    got = packed_gather(
        (pred.index,
         contrib[0], contrib[1], contrib[2], contrib[3], contrib[4],
         contrib[5], contrib[6], contrib[7], contrib[8], contrib[9],
         contrib[10], contrib[11]),
        wflat,
    )
    is_winner = proj_ok & (got[0] == slot_ids)
    sel = lambda i: jnp.where(is_winner, got[i], 0.0)  # noqa: E731
    sum_a = sel(1)
    sum_af = sel(2)
    sum_av = jnp.stack([sel(3), sel(4), sel(5)])
    sum_ac = jnp.stack([sel(6), sel(7), sel(8)])
    sum_an = jnp.stack([sel(9), sel(10), sel(11)])
    sum_ar = sel(12)

    c_k = m.conf
    denom_f = c_k + sum_af
    has_full = sum_af > 0
    safe_den = jnp.where(has_full, denom_f, 1.0)
    new_pos = jnp.where(has_full[None], (c_k[None] * m.pos + sum_av) / safe_den[None], m.pos)
    new_col = jnp.where(has_full[None], (c_k[None] * m.color + sum_ac) / safe_den[None], m.color)
    nr = (c_k[None] * m.normal + sum_an)
    nr_n = jnp.sqrt(jnp.sum(nr * nr, axis=0, keepdims=True))
    new_norm = jnp.where(has_full[None], nr / jnp.maximum(nr_n, 1e-12), m.normal)
    new_rad = jnp.where(has_full, (c_k * m.radius + sum_ar) / safe_den, m.radius)
    touched = sum_a > 0
    new_conf = c_k + sum_a
    new_last = jnp.where(touched, jnp.float32(tick), m.last_t)

    # --- append new unstable surfels (data.geom:36-49) ---
    # Scatter-free: stable-sort the per-pixel measurement rows so new points
    # form a dense prefix, then read-modify-write the map tail [count,
    # count+n_px) with contiguous dynamic slices (pure DMA).
    npm = new_pt.reshape(-1)
    tickf = jnp.float32(tick)
    # n_app: the frame's global append count (identical on every shard —
    # derived from replicated images + the owner's free-slot budget);
    # n_new: the slots THIS call physically writes (0 on non-owner shards)
    free = (cap - m.count) if append_free is None else append_free
    n_app = jnp.minimum(jnp.sum(npm.astype(jnp.int32)), free)
    n_new = n_app if append_on is None else jnp.where(append_on, n_app, 0)

    px_slot = jax.lax.broadcasted_iota(jnp.int32, (n_px, 1), 0).squeeze(-1)
    _, px_perm = jax.lax.sort(
        ((~npm).astype(jnp.int32), px_slot), num_keys=1, is_stable=True
    )
    sort_ops = [None] + packed_gather(
        (v_g[0], v_g[1], v_g[2], conf_new.reshape(-1),
         col_meas[0], col_meas[1], col_meas[2],
         n_g[0], n_g[1], n_g[2], rad_new.reshape(-1)),
        px_perm,
    )
    # dynamic_slice clamps its start to keep the window in-bounds; when
    # clamped (count > cap - window) the window's first `shift` rows are LIVE
    # surfels, so roll the new rows forward by `shift` and only overwrite
    # window rows [shift, shift + n_writable).  The window is min(n_px, cap)
    # so tiny maps (capacity below one frame's pixel count) stay in-bounds —
    # their appends simply clamp at capacity.
    win_n = min(n_px, cap)
    start = jnp.maximum(jnp.minimum(m.count, cap - win_n), 0)
    shift = m.count - start
    n_new = jnp.minimum(n_new, cap - m.count)
    widx = jax.lax.broadcasted_iota(jnp.int32, (win_n, 1), 0).squeeze(-1)
    wmask = (widx >= shift) & (widx < shift + n_new)

    def wr1(arr, newvals):
        old = jax.lax.dynamic_slice(arr, (start,), (win_n,))
        win = jnp.where(wmask, jnp.roll(newvals, shift)[:win_n], old)
        return jax.lax.dynamic_update_slice(arr, win, (start,))

    def wr3(arr, c0, c1, c2):
        old = jax.lax.dynamic_slice(arr, (0, start), (3, win_n))
        new3 = jnp.roll(jnp.stack([c0, c1, c2]), shift, axis=1)[:, :win_n]
        win = jnp.where(wmask[None], new3, old)
        return jax.lax.dynamic_update_slice(arr, win, (0, start))

    ticks = jnp.full((n_px,), tickf)
    out = SurfelMap(
        pos=wr3(new_pos, sort_ops[1], sort_ops[2], sort_ops[3]),
        conf=wr1(new_conf, sort_ops[4]),
        color=wr3(new_col, sort_ops[5], sort_ops[6], sort_ops[7]),
        init_t=wr1(m.init_t, ticks),
        last_t=wr1(new_last, ticks),
        normal=wr3(new_norm, sort_ops[8], sort_ops[9], sort_ops[10]),
        radius=wr1(new_rad, sort_ops[11]),
        count=m.count + n_new,
    )
    stats = FuseStats(
        matched=jnp.sum(matched.astype(jnp.int32)),
        added=n_new,
        count=out.count,
    )
    if not return_updated_pred:
        return out, stats

    # --- pixel-domain post-fuse index prediction ---------------------------
    # Replaces the second predictIndices render before clean
    # (ElasticFusion.cpp:554-555), a full-capacity packed sort.  Exactness
    # argument (module docstring): a raster winner projects to its own pixel,
    # so pixel w's contribution sums ARE the winner's update; an appended
    # surfel projects exactly to the pixel it was measured at.
    idx_valid = pred.index >= 0
    sum_a_px = contrib[0]
    sum_af_px = contrib[1]
    sum_av_px = contrib[2:5]
    sum_an_px = contrib[8:11]
    sum_ar_px = contrib[11]
    c_px = pred.conf
    touched_px = idx_valid & (sum_a_px > 0)
    hf = idx_valid & (sum_af_px > 0)
    den = jnp.where(hf, c_px + sum_af_px, 1.0)
    world_old = (R @ pred.vert.reshape(3, -1) + t[:, None]).reshape(3, H, W)
    new_world = (c_px[None] * world_old + sum_av_px) / den[None]
    vert_m = (T_cw_R @ (new_world.reshape(3, -1) - t[:, None])).reshape(3, H, W)
    p_vert = jnp.where(hf[None], vert_m, pred.vert)
    nw_old = (R @ pred.normal.reshape(3, -1)).reshape(3, H, W)
    nw = c_px[None] * nw_old + sum_an_px
    nw_len = jnp.sqrt(jnp.sum(nw * nw, axis=0, keepdims=True))
    norm_m = (T_cw_R @ (nw / jnp.maximum(nw_len, 1e-12)).reshape(3, -1)
              ).reshape(3, H, W)
    p_norm = jnp.where(hf[None], norm_m, pred.normal)
    p_rad = jnp.where(hf, (c_px * pred.radius + sum_ar_px) / den, pred.radius)
    p_conf = jnp.where(idx_valid, c_px + sum_a_px, pred.conf)
    p_last = jnp.where(touched_px, tickf, pred.last_t)

    # appended surfels: the stable sort in the append path preserves pixel
    # raster order, so a new point's slot is count + its exclusive-prefix rank
    npm_i = npm.astype(jnp.int32)
    rank = (jnp.cumsum(npm_i) - npm_i).reshape(H, W)
    app_px = new_pt & (rank < n_app)
    z_new = v_local[2]
    # z-buffer vs the existing winner (ties keep the old, lower id)
    app_wins = app_px & (~idx_valid | (z_new < p_vert[2]))
    new_ids = (m.count if append_base is None else append_base) + rank
    p_index = jnp.where(app_wins, new_ids, pred.index)
    p_vert = jnp.where(app_wins[None], v_local, p_vert)
    p_norm = jnp.where(app_wins[None], n_local, p_norm)
    p_rad = jnp.where(app_wins, rad_new, p_rad)
    p_conf = jnp.where(app_wins, conf_new, p_conf)
    p_init = jnp.where(app_wins, tickf, pred.init_t)
    p_last = jnp.where(app_wins, tickf, p_last)

    upd = IndexPrediction(
        index=p_index, vert=p_vert, normal=p_norm, radius=p_rad,
        conf=p_conf, init_t=p_init, last_t=p_last,
    )
    return out, stats, upd


def clean(
    m: SurfelMap,
    pred: IndexPrediction,
    T_wc: jax.Array,
    tick,
    cam: CameraConfig,
    conf_threshold: float,
    time_delta: int,
    max_depth: float,
    unstable_age: int = 20,
    depth_synth: Optional[jax.Array] = None,  # [H,W] synthesized depth
    deformed: Optional[jax.Array] = None,     # [3,N] deformed positions
    deformed_normal: Optional[jax.Array] = None,
    fern_accepted: bool = False,
    do_compact: bool = True,
    fx16_patch: bool = False,
) -> SurfelMap:
    """GlobalModel::clean (GlobalModel.cpp:527-671, copy_unstable.vert).

    Culling rules (copy_unstable.vert:75-128): a surfel dies if >=3 distinct
    stable older surfels overlap it in the index-map window (count>8 with
    {1,2,1} weights), or >=2 same-tick closer surfels occlude it (zCount>4 —
    free-space violation), or it timed out unstable (age>20 & conf<thresh);
    surfels outside the time window always survive.

    Deformation-graph application (copy_unstable.vert:132-303) happens in the
    deformation module; its output is passed in via `deformed`/
    `deformed_normal`, and the post-deform timestamp refresh against
    `depth_synth` (vert:305-321) happens here."""
    cap = m.capacity
    H, W = cam.height, cam.width
    T_cw_R = T_wc[:3, :3].T
    t = T_wc[:3, 3]
    lp = T_cw_R @ (m.pos - t[:, None])          # [3,N] camera frame
    ln = T_cw_R @ m.normal
    ln = ln / jnp.maximum(jnp.sqrt(jnp.sum(ln * ln, axis=0, keepdims=True)), 1e-12)

    safe_z = jnp.where(jnp.abs(lp[2]) > 1e-12, lp[2], 1.0)
    x = lp[0] * cam.fx / safe_z + cam.cx
    y = lp[1] * cam.fy / safe_z + cam.cy
    px = jnp.round(x).astype(jnp.int32)
    py = jnp.round(y).astype(jnp.int32)

    in_view = (
        ((tick - m.last_t) < time_delta)
        & (lp[2] > 0)
        & (x > 0) & (y > 0) & (x < W) & (y < H)
    )

    count = jnp.zeros((cap,), jnp.float32)
    zcount = jnp.zeros((cap,), jnp.float32)
    # candidate-side predicates fold into one flag channel (valid+stable=1,
    # +seen-this-tick=2): 5 gathered channels instead of 7
    stable_px = (pred.index >= 0) & (pred.conf > conf_threshold)
    flag_px = jnp.where(stable_px, 1.0, 0.0) + jnp.where(
        stable_px & (pred.last_t == tick), 2.0, 0.0
    )

    # Assemble the whole 3x3 window as ONE wide-row gather: shift the 5
    # candidate channels in the (cheap, vectorized) pixel domain into a
    # [H*W, 45] patch table, then gather a 45-float row per surfel at its
    # center pixel.  Nine narrow gathers at map capacity were the dominant
    # cost of clean (random-access row overhead); one wide gather amortizes
    # it 9x.  Out-of-bounds neighbours zero-fill, which clears their flag
    # channel — the same rejection the per-offset bounds test produced.
    def shift_px(img, dy, dx):
        out = jnp.roll(jnp.roll(img, -dy, axis=0), -dx, axis=1)
        row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        inb = (row + dy >= 0) & (row + dy < H) & (col + dx >= 0) & (col + dx < W)
        return jnp.where(inb, out, 0.0)

    chans = (flag_px, pred.vert[2], pred.vert[0], pred.vert[1], pred.init_t)
    patch = []
    for iy in (-1, 0, 1):
        for ix in (-1, 0, 1):
            patch.extend(shift_px(c, iy, ix) for c in chans)
    # dead / out-of-view surfels all gather pixel 0: their rows are masked
    # anyway and the uniform address keeps the gather cache-friendly
    flat = jnp.where(
        in_view, jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1), 0
    )
    if fx16_patch:
        # u16 fixed-point rows: half the bytes of the frame's single biggest
        # gather (45 f32 lanes x capacity rows).  Decode error <=0.6 mm on
        # the position channels — an order below the 10 mm dz / radius-scale
        # dxy cull thresholds.  The flag channel quantizes {0..3} exactly
        # enough for its >=1 / >=3 tests (error ~2e-5).
        from .gatherpack import gather_fx16, pack_fx16

        got = gather_fx16(pack_fx16(tuple(patch)), flat)
    else:
        got = packed_gather(tuple(patch), flat)
    for oi, (wy, wx) in enumerate(
        (wy, wx) for wy in _W3 for wx in _W3
    ):
        w = wx * wy
        c_flag, c_z, c_x, c_y, c_it = got[5 * oi:5 * oi + 5]
        # mid-point thresholds (0.5/2.5, not 1.0/3.0): flag values are the
        # integers {0,1,2,3} but the fx16 decode can land 1 ulp below
        has = (c_flag >= 0.5) & in_view
        behind_me = c_z > lp[2]
        dz = c_z - lp[2]
        dxy = jnp.sqrt((c_x - lp[0]) ** 2 + (c_y - lp[1]) ** 2)
        # merged-candidate overlap (copy_unstable.vert:84-96)
        count += jnp.where(
            has & (c_it < m.init_t) & behind_me & (dz < 0.01)
            & (dxy < m.radius * 1.4),
            w, 0.0,
        )
        # free-space violation (copy_unstable.vert:98-106)
        zcount += jnp.where(
            has & (c_flag >= 2.5) & behind_me & (dz > 0.01)
            & (jnp.abs(ln[2]) > 0.85),
            w, 0.0,
        )

    keep = ~((count > 8.0) | (zcount > 4.0))
    # stale unstable (copy_unstable.vert:120-123)
    keep &= ~(((tick - m.last_t) > unstable_age) & (m.conf < conf_threshold))
    # outside time window: always keep (copy_unstable.vert:125-128)
    keep |= (m.last_t > 0) & ((tick - m.last_t) > time_delta)

    out = m
    if deformed is not None:
        # don't deform surfels fused this tick (copy_unstable.vert:134)
        fresh = m.init_t == tick
        new_pos = jnp.where(fresh[None], m.pos, deformed)
        new_nrm = m.normal if deformed_normal is None else jnp.where(
            fresh[None], m.normal, deformed_normal
        )
        out = out._replace(pos=new_pos, normal=new_nrm)
        if depth_synth is not None and not fern_accepted:
            # timestamp refresh vs synthesized depth (copy_unstable.vert:305-321)
            lp2 = T_cw_R @ (new_pos - t[:, None])
            sz = jnp.where(jnp.abs(lp2[2]) > 1e-12, lp2[2], 1.0)
            x2 = lp2[0] * cam.fx / sz + cam.cx
            y2 = lp2[1] * cam.fy / sz + cam.cy
            inb = (lp2[2] > 0) & (lp2[2] < max_depth) & (x2 > 0) & (y2 > 0) & (x2 < W) & (y2 < H)
            flat = jnp.clip(y2.astype(jnp.int32), 0, H - 1) * W + jnp.clip(
                x2.astype(jnp.int32), 0, W - 1
            )
            (d,) = packed_gather((depth_synth,), flat)
            refresh = (
                (m.conf > conf_threshold) & ~fresh & inb & (d > 0) & (lp2[2] < d + 0.1)
            )
            out = out._replace(last_t=jnp.where(refresh, jnp.float32(tick), out.last_t))

    if do_compact:
        return compact(out, keep)
    # Amortized compaction: mark culled surfels dead IN PLACE (the same
    # zeroing compact applies) instead of paying the full-capacity
    # permutation sort every frame.  Dead rows below `count` are inert:
    # last_t=-1e9 fails every time-window gate (predict/clean/in_view),
    # conf=0 fails the stable gates, init_t=+inf makes a sampled dead slot
    # identical to the deformation graph's capacity padding
    # (deformation._init_graph's +inf tail convention).  The engine runs a
    # real compact every cfg.compact_every frames to reclaim the slots.
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    live_keep = keep | (slot >= m.count)
    kf = live_keep.astype(jnp.float32)
    return out._replace(
        pos=out.pos * kf[None],
        normal=out.normal * kf[None],
        color=out.color * kf[None],
        conf=out.conf * kf,
        radius=out.radius * kf,
        last_t=jnp.where(live_keep, out.last_t, -1e9),
        init_t=jnp.where(live_keep, out.init_t, jnp.inf),
    )
