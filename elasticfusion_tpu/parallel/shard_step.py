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
            fx16_patch=cfg.fx16_clean,
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


# ---------------------------------------------------------------------------
# Engine backend: the full per-frame map section (and the closure repair) as
# shard_map regions, so the ENGINE runs the efficient explicit-collective
# formulation when cfg.mesh_shape is set (round-4 verdict: the good path
# existed but only the scaling bench used it).
# ---------------------------------------------------------------------------


_MAP_FIELDS = ("pos", "conf", "color", "init_t", "last_t", "normal", "radius")


def _m_parts(m: SurfelMap):
    return tuple(getattr(m, k) for k in _MAP_FIELDS)


def _m_specs():
    sharded = P(None, AXIS)
    sharded1 = P(AXIS)
    return (sharded, sharded1, sharded, sharded1, sharded1, sharded, sharded1)


def _local_map(parts, counts):
    ax = jax.lax.axis_index(AXIS)
    return SurfelMap(**dict(zip(_MAP_FIELDS, parts)), count=counts[ax]), ax


def _sorted_nodes(node_pos, node_t):
    """Order the cross-shard node sample by init time (dead slots carry
    init_t=+inf and sort last — the deformation graph's padding convention,
    deformation._init_graph).  The single-device sample is time-ordered by
    map construction; the shard-major concatenation is not, and the graph's
    timeline binary search requires non-decreasing times."""
    order = jnp.argsort(node_t, stable=True)
    return node_pos[order], node_t[order]


def make_sharded_map_ops(cfg: EngineConfig, mesh: Mesh):
    """Jit-friendly shard_map wrappers for every map op the Engine's frame
    programs use.  All pixel-domain inputs/outputs are replicated; the map
    lives as per-shard sub-maps (count = [S] per-shard vector)."""
    from ..ops.splat import Prediction

    S = int(np.prod(mesh.devices.shape))
    cam = cfg.camera
    rep = P()
    # counts are REPLICATED [S] (every shard knows all counts)
    m_specs = _m_specs() + (rep,)

    node_rate = cfg.def_graph_sample_rate

    def _frame_body(pos, conf, color, init_t, last_t, normal, radius, counts,
                    T, tick, rgb, raw_m, filt_m, weighting, do_fuse,
                    want_inactive, do_compact=True):
        m, ax = _local_map(
            (pos, conf, color, init_t, last_t, normal, radius), counts)
        cap_l = pos.shape[1]
        id_base = ax.astype(jnp.int32) * cap_l

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
            do_compact=do_compact, fx16_patch=cfg.fx16_clean,
        )
        # fuse/clean gated on tracking health (ElasticFusion.cpp:536):
        # computed unconditionally, selected per field — a lax.cond around
        # a region with collectives would have branch-mismatched channels
        sel = lambda new, old: jnp.where(do_fuse, new, old)  # noqa: E731
        mo = SurfelMap(
            **{k: sel(getattr(m3, k), getattr(m, k)) for k in _MAP_FIELDS},
            count=sel(m3.count, m.count),
        )
        counts2 = jax.lax.all_gather(mo.count, AXIS)
        added = jax.lax.psum(jnp.where(do_fuse, stats.added, 0), AXIS)
        matched = jnp.where(do_fuse, stats.matched, 0)

        # end-of-frame ACTIVE prediction (cpp:599)
        pred = _combined_predict_local(
            mo, T, cam, tick, tick, cfg.time_delta, cfg.confidence_threshold,
            cfg.max_depth_processed, id_base,
        )

        # deformation node sample: per-shard stride + all_gather + time sort;
        # slots beyond the local count must sort LAST (init_t=+inf, the
        # graph's dead-padding convention) — raw padding carries init_t=0
        # and would sort ahead of every live node
        idx_l = jnp.arange(0, cap_l, node_rate, dtype=jnp.int32)
        live_l = idx_l < mo.count
        np_l = jnp.where(live_l[:, None], jnp.take(mo.pos, idx_l, axis=1).T, 0.0)
        nt_l = jnp.where(live_l, jnp.take(mo.init_t, idx_l), jnp.inf)
        node_pos = jax.lax.all_gather(np_l, AXIS).reshape(-1, 3)
        node_t = jax.lax.all_gather(nt_l, AXIS).reshape(-1)

        # local-loop-closure precompute: inactive-model existence + the
        # INACTIVE prediction (cpp:447-471).  Rasters run unconditionally
        # (cond around collectives is fragile); want_inactive only zeroes
        # the output so the m2m solve outside can skip cleanly.
        slot = jax.lax.broadcasted_iota(jnp.int32, (cap_l, 1), 0).squeeze(-1)
        inact_exists_l = jnp.sum(
            ((slot < mo.count)
             & (mo.conf >= cfg.confidence_threshold)
             & (mo.last_t <= tick - cfg.time_delta)).astype(jnp.int32)
        )
        inact_exists = jax.lax.psum(inact_exists_l, AXIS) > 0
        old_pred = _combined_predict_local(
            mo, T, cam, jnp.float32(0.0), tick - cfg.time_delta,
            cfg.time_delta, cfg.confidence_threshold,
            cfg.max_depth_processed, id_base,
        )
        run_inact = inact_exists & want_inactive
        old_pred = Prediction(*(
            jnp.where(run_inact, f, jnp.zeros_like(f)) for f in old_pred
        ))
        inact_px = jnp.where(
            run_inact, jnp.sum((old_pred.depth > 0).astype(jnp.int32)), 0
        )
        return (_m_parts(mo) + (counts2, matched, added)
                + tuple(pred) + tuple(old_pred)
                + (inact_px, node_pos, node_t))

    n_pred = len(Prediction._fields)
    frame_bodies = {
        dc: shard_map(
            functools.partial(_frame_body, do_compact=dc), mesh=mesh,
            in_specs=m_specs + (rep,) * 8,
            out_specs=_m_specs() + (rep,) * (3 + 2 * n_pred + 3),
            check_vma=False,
        )
        for dc in (False, True)
    }

    def frame_map_section(m, T, tick, rgb, raw_m, filt_m, weighting,
                          do_fuse, want_inactive, do_compact: bool):
        out = frame_bodies[bool(do_compact)](
            *_m_parts(m), m.count, T, tick, rgb, raw_m, filt_m,
            weighting, do_fuse, want_inactive)
        fields = out[:7]
        counts2, matched, added = out[7:10]
        pred = Prediction(*out[10:10 + n_pred])
        old_pred = Prediction(*out[10 + n_pred:10 + 2 * n_pred])
        inact_px, node_pos, node_t = out[10 + 2 * n_pred:]
        mo = SurfelMap(**dict(zip(_MAP_FIELDS, fields)), count=counts2)
        from ..ops.fuse import FuseStats

        node_pos, node_t = _sorted_nodes(node_pos, node_t)
        stats = FuseStats(matched=matched, added=added,
                          count=jnp.sum(counts2))
        return mo, stats, pred, old_pred, inact_px, node_pos, node_t

    # --- combined_predict (active/inactive/synth windows) ------------------
    def _cp_body(pos, conf, color, init_t, last_t, normal, radius, counts,
                 T, time, max_time, time_delta):
        m, ax = _local_map(
            (pos, conf, color, init_t, last_t, normal, radius), counts)
        id_base = ax.astype(jnp.int32) * pos.shape[1]
        pred = _combined_predict_local_td(
            m, T, cam, time, max_time, time_delta,
            cfg.confidence_threshold, cfg.max_depth_processed, id_base,
        )
        return tuple(pred)

    cp_body = shard_map(
        _cp_body, mesh=mesh,
        in_specs=m_specs + (rep,) * 4,
        out_specs=(rep,) * n_pred,
        check_vma=False,
    )

    def combined_predict_sharded(m, T, time, max_time, time_delta=None):
        td = jnp.float32(cfg.time_delta if time_delta is None else time_delta)
        return Prediction(*cp_body(*_m_parts(m), m.count, T,
                                   jnp.asarray(time, jnp.float32),
                                   jnp.asarray(max_time, jnp.float32), td))

    # --- closure repair map section ----------------------------------------
    def _closure_body(pos, conf, color, init_t, last_t, normal, radius,
                      counts, g_pos, g_times, g_R, g_t, g_nbr, g_n,
                      T_fix, closure_tick, T_new, tick_now,
                      fern_accepted, do_synth):
        from ..deformation import GraphState, apply_graph_to_surfels
        from ..ops.gatherpack import packed_gather

        m, ax = _local_map(
            (pos, conf, color, init_t, last_t, normal, radius), counts)
        cap_l = pos.shape[1]
        id_base = ax.astype(jnp.int32) * cap_l
        graph = GraphState(pos=g_pos, times=g_times, R=g_R, t=g_t,
                           nbr=g_nbr, n_nodes=g_n)

        deformed_pos, deformed_nrm = apply_graph_to_surfels(m, graph)
        recent = m.init_t >= closure_tick
        Rf = T_fix[:3, :3]
        tf = T_fix[:3, 3]
        new_pos = jnp.where(recent[None], Rf @ m.pos + tf[:, None],
                            deformed_pos)
        new_nrm = jnp.where(recent[None], Rf @ m.normal, deformed_nrm)
        m1 = m._replace(pos=new_pos, normal=new_nrm)

        # post-deform timestamp refresh vs the synthesized inactive depth
        # (copy_unstable.vert:305-321); the depth raster always runs (cond
        # around collectives is fragile), the refresh is gated by do_synth
        depth_synth = _combined_predict_local_td(
            m1, T_new, cam, tick_now, tick_now - cfg.time_delta,
            jnp.float32(65535.0), cfg.confidence_threshold,
            cfg.max_depth_processed, id_base,
        ).depth
        H, W = cam.height, cam.width
        T_cw_R = T_new[:3, :3].T
        t = T_new[:3, 3]
        lp2 = T_cw_R @ (m1.pos - t[:, None])
        sz = jnp.where(jnp.abs(lp2[2]) > 1e-12, lp2[2], 1.0)
        x2 = lp2[0] * cam.fx / sz + cam.cx
        y2 = lp2[1] * cam.fy / sz + cam.cy
        inb = (
            (lp2[2] > 0) & (lp2[2] < cfg.max_depth_processed)
            & (x2 > 0) & (y2 > 0) & (x2 < W) & (y2 < H)
        )
        flat = jnp.clip(y2.astype(jnp.int32), 0, H - 1) * W + jnp.clip(
            x2.astype(jnp.int32), 0, W - 1
        )
        (d,) = packed_gather((depth_synth,), flat)
        refresh = (
            do_synth & (m1.conf > cfg.confidence_threshold) & ~recent & inb
            & (d > 0) & (lp2[2] < d + 0.1)
        )
        m1 = m1._replace(
            last_t=jnp.where(refresh, tick_now, m1.last_t)
        )

        pidx = _predict_indices_local(
            m1, T_new, cam, tick_now, cfg.time_delta,
            cfg.max_depth_processed, id_base,
        )
        m2 = clean(
            m1, pidx, T_new, tick_now, cam, cfg.confidence_threshold,
            cfg.time_delta, cfg.max_depth_processed, cfg.unstable_age,
            fx16_patch=cfg.fx16_clean,
        )
        counts2 = jax.lax.all_gather(m2.count, AXIS)

        pred = _combined_predict_local(
            m2, T_new, cam, tick_now, tick_now, cfg.time_delta,
            cfg.confidence_threshold, cfg.max_depth_processed, id_base,
        )
        idx_l = jnp.arange(0, cap_l, node_rate, dtype=jnp.int32)
        live_l = idx_l < m2.count
        np_l = jnp.where(live_l[:, None], jnp.take(m2.pos, idx_l, axis=1).T, 0.0)
        nt_l = jnp.where(live_l, jnp.take(m2.init_t, idx_l), jnp.inf)
        node_pos = jax.lax.all_gather(np_l, AXIS).reshape(-1, 3)
        node_t = jax.lax.all_gather(nt_l, AXIS).reshape(-1)
        return (_m_parts(m2) + (counts2,) + tuple(pred)
                + (node_pos, node_t))

    closure_body = shard_map(
        _closure_body, mesh=mesh,
        in_specs=m_specs + (rep,) * 12,
        out_specs=_m_specs() + (rep,) * (1 + n_pred + 2),
        check_vma=False,
    )

    def closure_map_section(m, graph, T_fix, closure_tick, T_new, tick_now,
                            fern_accepted: bool):
        out = closure_body(
            *_m_parts(m), m.count,
            graph.pos, graph.times, graph.R, graph.t, graph.nbr,
            graph.n_nodes,
            T_fix, closure_tick, T_new, tick_now,
            jnp.bool_(fern_accepted), jnp.bool_(not fern_accepted),
        )
        fields = out[:7]
        counts2 = out[7]
        pred = Prediction(*out[8:8 + n_pred])
        node_pos, node_t = out[8 + n_pred:]
        node_pos, node_t = _sorted_nodes(node_pos, node_t)
        mo = SurfelMap(**dict(zip(_MAP_FIELDS, fields)), count=counts2)
        return mo, pred, node_pos, node_t

    # --- per-shard growth ---------------------------------------------------
    def _grow_body(new_cap_l, *parts):
        grown = []
        for p in parts:
            pad = new_cap_l - p.shape[-1]
            cfgp = [(0, 0)] * (p.ndim - 1) + [(0, pad)]
            grown.append(jnp.pad(p, cfgp))
        return tuple(grown)

    def grow_sharded(m: SurfelMap, new_capacity: int) -> SurfelMap:
        new_cap_l = new_capacity // S
        body = shard_map(
            functools.partial(_grow_body, new_cap_l), mesh=mesh,
            in_specs=_m_specs(), out_specs=_m_specs(),
            check_vma=False,
        )
        fields = body(*_m_parts(m))
        return SurfelMap(**dict(zip(_MAP_FIELDS, fields)), count=m.count)

    import types

    return types.SimpleNamespace(
        S=S,
        frame_map_section=frame_map_section,
        combined_predict=combined_predict_sharded,
        closure_map_section=closure_map_section,
        grow=grow_sharded,
    )


def _combined_predict_local_td(m, T_wc, cam, time, max_time, time_delta,
                               conf_threshold, max_depth, id_base):
    """_combined_predict_local with a TRACED time_delta (the closure repair
    synthesizes depth with timeDelta=uint16-max, ElasticFusion.cpp:561-569)."""
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
    return splat_resolve_images(merged, cam, use_pallas=False)


def distribute_map(m: SurfelMap, mesh: Mesh) -> SurfelMap:
    """Re-layout a single-device map into the per-shard sub-map layout:
    round-robin (strided) distribution so load balances from the first
    frame.  Returns a SurfelMap with lane-sharded fields and a replicated
    [S] count vector."""
    S = int(np.prod(mesh.devices.shape))
    cap = m.capacity
    assert cap % S == 0, (cap, S)
    cap_l = cap // S
    n = jnp.asarray(m.count, jnp.int32)

    # global slot j of the single-device map -> shard j%S, local row j//S:
    # row r of shard s reads global slot r*S + s, so each shard's live rows
    # form a dense local prefix
    order = (
        jnp.arange(cap_l, dtype=jnp.int32)[None, :] * S
        + jnp.arange(S, dtype=jnp.int32)[:, None]
    ).reshape(-1)

    counts = jnp.clip(
        (n - jnp.arange(S, dtype=jnp.int32) + S - 1) // S, 0, cap_l
    )
    fields = {}
    for k in _MAP_FIELDS:
        v = getattr(m, k)
        fields[k] = jnp.take(v, order, axis=-1)
    out = SurfelMap(**fields, count=counts)
    vec = NamedSharding(mesh, P(None, AXIS))
    sca = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())
    return SurfelMap(
        pos=jax.device_put(out.pos, vec),
        conf=jax.device_put(out.conf, sca),
        color=jax.device_put(out.color, vec),
        init_t=jax.device_put(out.init_t, sca),
        last_t=jax.device_put(out.last_t, sca),
        normal=jax.device_put(out.normal, vec),
        radius=jax.device_put(out.radius, sca),
        count=jax.device_put(out.count, repl),
    )


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
