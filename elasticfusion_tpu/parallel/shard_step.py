"""Explicit shard_map formulation of the per-frame map ops — the efficient
multi-device scaling path (SCALING.md; SURVEY.md §2.11/§5.8).

Why not GSPMD propagation: `parallel/sharding.sharded_slam_step` lets the
partitioner push the map sharding through the unmodified step; it is
numerically equivalent but inserts ~742 all-reduces + 37 all-gathers on an
8-way mesh (measured, SCALING.md:34-42) because the sort-based z-buffer and
the compaction permutation are GLOBAL ops over the surfel axis — the
partitioner can only express them by gathering the whole axis.

This module instead gives each shard its OWN sub-map (capacity/S surfels with a
local count) and keeps every per-surfel op SHARD-LOCAL:

  - point raster: each shard sorts ITS surfels (S-fold smaller sorts — the
    raster's cost is the sort) into a local winner image, then the shards
    merge in the PIXEL domain with the same (quantized z, id) lexicographic
    rule the single-device sort uses, so the merged winner is BIT-IDENTICAL
    to the single-device raster:
        pmin over shards of the 13-bit-quantized depth image        [H,W]
        pmin over shards of the winner GLOBAL id among z-ties       [H,W]
        psum of the winner-masked attribute channel images       [C,H,W]
  - fuse: the window search + contribution accumulation are pixel-domain on
    the REPLICATED merged prediction (identical on every shard, no
    collective); the per-surfel merge gathers each shard's own winners
    (shard-local); appends go to the frame's OWNER shard (round-robin by
    tick) so the append slot ids stay deterministic.
  - clean + compact: purely shard-local (geometric tests against replicated
    images; the compaction permutation sorts capacity/S rows).
  - shard counts: one all_gather of S scalars per frame.

Collectives per frame: 3 image ops per raster x 2 rasters (predictIndices +
combinedPredict) + 1 tiny count all_gather = 7, vs ~742 under GSPMD.

The tracking solve, preprocessing and fill-in stay replicated pixel-domain
work outside the shard_map region (SCALING.md table), exactly as before.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import EngineConfig
from ..surfels import SurfelMap
from ..ops.splat import (
    INVALID_ID,
    IndexPrediction,
    _camera_frame,
    _gather_surfel_channels,
    _point_raster,
    splat_resolve_images,
)
from ..ops.fuse import clean, fuse
from ..ops.fillin import fill_all

AXIS = "map"
_I32_MAX = jnp.int32(2147483647)


def _zq(z: jax.Array) -> jax.Array:
    """The raster's 13-bit depth quantization (ops/splat._point_raster):
    2.4 mm buckets over [0, 20 m).  Cross-shard winner selection uses the
    SAME (zq, id) lexicographic rule as the in-shard stable sort, so the
    merged winner equals the single-device winner exactly."""
    return jnp.clip((z * (8192.0 / 20.0)).astype(jnp.uint32), 0, 8191)


def _merge_winners(pid: jax.Array, z_img: jax.Array, chans: jax.Array,
                   id_base) -> Tuple[jax.Array, jax.Array]:
    """Merge per-shard raster winners into the global winner image.

    pid    [H,W] i32   local winner ids (INVALID_ID where empty)
    z_img  [H,W] f32   winner camera-space depth (ignored where empty)
    chans  [C,H,W] f32 winner attribute images (zeros where empty)
    id_base scalar i32 this shard's first global id

    Returns (gid [H,W] i32 global winner id with INVALID_ID sentinel,
    merged chans [C,H,W]).  3 collectives: pmin, pmin, psum."""
    has = pid != INVALID_ID
    zq = jnp.where(has, _zq(z_img), jnp.uint32(0xFFFFFFFF))
    zq_min = jax.lax.pmin(zq, AXIS)
    gid_cand = jnp.where(has & (zq == zq_min), id_base + pid, _I32_MAX)
    gid = jax.lax.pmin(gid_cand, AXIS)
    mine = has & (gid == id_base + pid)
    merged = jax.lax.psum(jnp.where(mine[None], chans, 0.0), AXIS)
    gid = jnp.where(gid == _I32_MAX, INVALID_ID, gid)
    return gid, merged


def _predict_indices_local(m: SurfelMap, T_wc, cam, time, time_delta,
                           max_depth, id_base) -> IndexPrediction:
    """predictIndices with a shard-local raster + the cross-shard pixel
    merge.  Mirrors ops/splat.predict_indices gate-for-gate."""
    pos_c, normal_c = _camera_frame(m, T_wc)
    N = m.capacity
    slot = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    live = slot < m.count
    gate = (pos_c[2] <= max_depth) & ((time - m.last_t) <= time_delta)
    pid = _point_raster(pos_c, gate, cam, live)

    ch = _gather_surfel_channels(m, pos_c, normal_c, pid)
    chans = jnp.concatenate([
        ch["p"], ch["n"], ch["rad"][None], ch["conf"][None],
        ch["it"][None],
        # last_t is not in the gather dict; fetch it separately
        _gather_scalar(m.last_t, pid, m.capacity)[None],
    ])
    gid, mg = _merge_winners(pid, ch["p"][2], chans, id_base)
    return IndexPrediction(
        index=jnp.where(gid == INVALID_ID, -1, gid),
        vert=mg[0:3], normal=mg[3:6], radius=mg[6], conf=mg[7],
        init_t=mg[8], last_t=mg[9],
    )


def _gather_scalar(arr: jax.Array, pid: jax.Array, cap: int) -> jax.Array:
    H, W = pid.shape
    empty = (pid == INVALID_ID).reshape(-1)
    idx = jnp.where(empty, 0, jnp.clip(pid.reshape(-1), 0, cap - 1))
    out = jnp.take(arr, idx)
    return jnp.where(empty, 0.0, out).reshape(H, W)


def _combined_predict_local(m: SurfelMap, T_wc, cam, time, max_time,
                            time_delta, conf_threshold, max_depth, id_base):
    """combinedPredict: shard-local raster + pixel merge + the (replicated)
    splat resolve on the merged channel images."""
    pos_c, normal_c = _camera_frame(m, T_wc)
    N = m.capacity
    slot = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    live = slot < m.count
    gate = (
        (pos_c[2] <= max_depth)
        & (m.conf >= conf_threshold)
        & ((time - m.last_t) <= time_delta)
        & (m.last_t <= max_time)
    )
    pid = _point_raster(pos_c, gate, cam, live)
    ch = _gather_surfel_channels(m, pos_c, normal_c, pid)
    chans = jnp.concatenate([
        ch["p"], ch["n"], ch["rad"][None], ch["conf"][None],
        ch["col"], ch["it"][None],
    ])
    gid, mg = _merge_winners(pid, ch["p"][2], chans, id_base)
    merged = dict(
        p=mg[0:3], n=mg[3:6], rad=mg[6], conf=mg[7], col=mg[8:11],
        it=mg[11], empty=gid == INVALID_ID,
    )
    # pixel-domain resolve on replicated images — identical on every shard.
    # Pallas is per-device; inside shard_map use the XLA formulation.
    return splat_resolve_images(merged, cam, use_pallas=False)


def make_shardmap_step(cfg: EngineConfig, mesh: Mesh):
    """The explicit-collective equivalent of `engine.slam_step` over `mesh`:
    same signature (map with a PER-SHARD count vector [S] instead of the
    scalar), same outputs.  See module docstring for the collective plan."""
    from ..engine import _preprocess, _track

    S = int(np.prod(mesh.devices.shape))
    cam = cfg.camera

    def _map_body(pos, conf, color, init_t, last_t, normal, radius, counts,
                  T, tick, rgb, raw_m, filt_m, weighting):
        ax = jax.lax.axis_index(AXIS)
        cap_l = pos.shape[1]
        id_base = ax.astype(jnp.int32) * cap_l
        m = SurfelMap(pos=pos, conf=conf, color=color, init_t=init_t,
                      last_t=last_t, normal=normal, radius=radius,
                      count=counts[ax])

        pred_idx = _predict_indices_local(
            m, T, cam, tick, cfg.time_delta, cfg.max_depth_processed, id_base
        )

        owner = jnp.mod(tick.astype(jnp.int32), S)
        owner_count = counts[owner]
        m2, stats, pred2 = fuse(
            m, pred_idx, T, tick, rgb, raw_m, filt_m, cam,
            cfg.max_depth_processed, weighting,
            return_updated_pred=True, use_pallas=False,
            id_base=id_base,
            append_on=(ax == owner),
            append_base=owner * cap_l + owner_count,
            append_free=cap_l - owner_count,
        )
        m3 = clean(
            m2, pred2, T, tick, cam, cfg.confidence_threshold,
            cfg.time_delta, cfg.max_depth_processed, cfg.unstable_age,
        )
        counts2 = jax.lax.all_gather(m3.count, AXIS)

        pred = _combined_predict_local(
            m3, T, cam, tick, tick, cfg.time_delta, cfg.confidence_threshold,
            cfg.max_depth_processed, id_base,
        )
        # global fuse stats (matched is replicated pixel math; added is
        # owner-only): one psum of two scalars
        added = jax.lax.psum(stats.added, AXIS)
        return (m3.pos, m3.conf, m3.color, m3.init_t, m3.last_t, m3.normal,
                m3.radius, counts2, stats.matched, added,
                pred.image, pred.vertex, pred.conf, pred.normal, pred.radius,
                pred.time, pred.depth)

    sharded = P(None, AXIS)
    sharded1 = P(AXIS)
    rep = P()
    map_in = (sharded, sharded1, sharded, sharded1, sharded1, sharded,
              sharded1)
    body = shard_map(
        _map_body, mesh=mesh,
        in_specs=map_in + (rep,) * 7,
        out_specs=map_in + (rep,) * 10,
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(m: SurfelMap, T_prev, so3_hist, pred_vertex, pred_normal,
             pred_image, depth_mm, rgb, tick, weighting):
        # m.count here is the [S] per-shard count vector (replicated)
        raw_m, filt_m = _preprocess(depth_mm, cfg)
        res, so3_cur = _track(
            pred_vertex, pred_normal, pred_image, filt_m, rgb, so3_hist,
            T_prev, cfg, False,
        )
        T = res.T_curr
        (pos, conf, color, init_t, last_t, normal, radius, counts2,
         matched, added, p_img, p_vtx, p_conf, p_nrm, p_rad, p_time,
         p_dep) = body(
            m.pos, m.conf, m.color, m.init_t, m.last_t, m.normal, m.radius,
            m.count, T, tick, rgb, raw_m, filt_m, weighting,
        )
        m_out = SurfelMap(pos=pos, conf=conf, color=color, init_t=init_t,
                          last_t=last_t, normal=normal, radius=radius,
                          count=counts2)
        from ..ops.splat import Prediction

        pred = Prediction(image=p_img, vertex=p_vtx, conf=p_conf,
                          normal=p_nrm, radius=p_rad, time=p_time,
                          depth=p_dep)
        vtx, nrm, img = fill_all(
            pred, filt_m, rgb, cam, cfg.max_depth_processed,
            jnp.bool_(False), cfg.frame_to_frame_rgb,
        )
        dense = jnp.mean(
            (jnp.sum(pred.image, axis=-1) > 0).astype(jnp.float32)
        )
        return m_out, T, so3_cur, (vtx, nrm, img), pred, dense, res

    return step


def shard_empty_map(capacity: int, mesh: Mesh) -> SurfelMap:
    """An empty sub-map-per-shard SurfelMap: arrays sharded over AXIS,
    count = the [S] per-shard count vector (replicated)."""
    from ..surfels import empty_map

    S = int(np.prod(mesh.devices.shape))
    m = empty_map(capacity)
    m = m._replace(count=jnp.zeros((S,), jnp.int32))
    vec = NamedSharding(mesh, P(None, AXIS))
    sca = NamedSharding(mesh, P(AXIS))
    rep = NamedSharding(mesh, P())
    return SurfelMap(
        pos=jax.device_put(m.pos, vec),
        conf=jax.device_put(m.conf, sca),
        color=jax.device_put(m.color, vec),
        init_t=jax.device_put(m.init_t, sca),
        last_t=jax.device_put(m.last_t, sca),
        normal=jax.device_put(m.normal, vec),
        radius=jax.device_put(m.radius, sca),
        count=jax.device_put(m.count, rep),
    )


def gather_shard_map(m: SurfelMap, mesh: Mesh) -> SurfelMap:
    """Materialize the sharded sub-maps as ONE equivalent single-device map
    (for equivalence tests / export): concatenate each shard's live prefix
    in shard order."""
    S = int(np.prod(mesh.devices.shape))
    counts = np.asarray(jax.device_get(m.count))
    cap_l = m.capacity // S
    fields = {k: np.asarray(jax.device_get(getattr(m, k)))
              for k in ("pos", "conf", "color", "init_t", "last_t",
                        "normal", "radius")}
    out = {k: [] for k in fields}
    for s in range(S):
        lo, n = s * cap_l, int(counts[s])
        for k, v in fields.items():
            out[k].append(v[..., lo:lo + n])
    total = int(counts.sum())
    cat = {k: np.concatenate(v, axis=-1) for k, v in out.items()}
    pad = m.capacity - total
    cat = {
        k: np.concatenate(
            [v, np.zeros(v.shape[:-1] + (pad,), v.dtype)], axis=-1
        ) for k, v in cat.items()
    }
    return SurfelMap(count=jnp.int32(total),
                     **{k: jnp.asarray(v) for k, v in cat.items()})
