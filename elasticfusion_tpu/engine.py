"""Engine facade — the TPU-native `ElasticFusion` class
(/root/reference/Core/ElasticFusion.{h,cpp}).

`process_frame` mirrors the reference pipeline (ElasticFusion.cpp:270-607,
SURVEY.md §3.1): preprocess -> frame-to-model tracking -> predict ->
[loop closures] -> fuse -> clean -> sample graph -> predict.

Pipelined host/device architecture (TPU-first, round 2): on this stack a
device *dispatch* is ~free but any host *sync* on a fresh result costs a full
RPC round trip (~30 ms measured through the device tunnel) — three syncs per
frame is the whole 30 Hz budget.  So the per-frame work is ONE jitted device
program (`_frame_main`) whose every control decision the reference makes on
the CPU between kernels (denseEnough fill-in select, velocity weighting,
tracking-failure gates, inactive-model existence) is computed on-device, and
the host reads each frame's small outputs only `cfg.pipeline_depth` frames
later, when they are already finished and the read is free.  Loop-closure
*decisions* (fern DB retrieval, deformation Gauss-Newton acceptance) still
happen on the host — they are rare events — and are applied through a
deferred repair program (`_apply_closure`) that deforms the map, rigidly
corrects everything fused since the closure frame (those frames fused at the
pre-correction pose; the reference corrects the pose *before* fusing,
ElasticFusion.cpp:410-444, which a pipelined engine cannot), and regenerates
the carried prediction at the corrected pose.

With `pipeline_depth=0` every frame is finished synchronously inside
`process_frame` — reference-ordered semantics, one sync per frame.
"""

from __future__ import annotations

import functools
from collections import deque
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig
from .ops.fillin import fill_all
from .ops.fuse import FuseStats, clean, fuse
from .ops.preprocess import bilateral_filter, metricise_depth, pyr_down_intensity, rgb_to_intensity
from .ops.splat import Prediction, combined_predict, predict_indices, synthesize_depth
from .se3 import np_orthonormalize, se3_log_norm
from .surfels import SurfelMap, init_map_from_frame
from .tracking import (
    OdometryInputs,
    TrackingResult,
    build_current_frame_pyramids,
    build_model_pyramids,
    get_incremental_transformation,
)
from .utils.stopwatch import Stopwatch

CONS_SAMPLE = 20  # constraint-source subsampling (ElasticFusion.cpp:62)


# ---------------------------------------------------------------------------
# jitted per-frame device programs
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def _preprocess(depth_mm, cfg: EngineConfig):
    """filterDepth + metriciseDepth (ElasticFusion.cpp:655-673)."""
    d = depth_mm.astype(jnp.float32)
    filt = bilateral_filter(d, cfg.max_depth_processed, cfg.bilateral_radius)
    return (
        metricise_depth(d, cfg.depth_cutoff),
        metricise_depth(filt, cfg.depth_cutoff),
    )


@functools.partial(jax.jit, static_argnames=("cfg", "capacity"))
def _init_map(depth_raw_m, depth_filt_m, rgb, cfg: EngineConfig,
              capacity: int) -> SurfelMap:
    return init_map_from_frame(
        capacity, depth_raw_m, depth_filt_m, rgb, cfg.camera,
        cfg.depth_cutoff,
    )


def _next_bucket(n: int, cap: int) -> int:
    """Capacity buckets: per-surfel ops cost O(array size), so the map lives
    in the smallest bucketed arrays that fit (SURVEY.md §7 'capacity
    buckets'), growing toward cfg.max_surfels.  Each growth recompiles the
    jitted steps once for the new shape (amortized by the persistent
    compilation cache — see bench.py/run_slam).

    Buckets step ~x1.25 (8192-aligned) rather than x2: with power-of-two
    buckets the steady state ran per-surfel ops at up to 3x the live count
    (measured: the whole 640x480 bench sat at cap 2^20 with ~350k live,
    85 ms/frame vs 58 ms at 2^19 — capacity, not count, is the cost)."""
    b = 1 << 16
    while b < n:
        b = -(-(b + (b >> 2)) // 8192) * 8192
    return min(b, cap)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _grow_map(m: SurfelMap, capacity: int) -> SurfelMap:
    pad = capacity - m.capacity
    return SurfelMap(
        pos=jnp.pad(m.pos, ((0, 0), (0, pad))),
        conf=jnp.pad(m.conf, (0, pad)),
        color=jnp.pad(m.color, ((0, 0), (0, pad))),
        init_t=jnp.pad(m.init_t, (0, pad)),
        last_t=jnp.pad(m.last_t, (0, pad)),
        normal=jnp.pad(m.normal, ((0, 0), (0, pad))),
        radius=jnp.pad(m.radius, (0, pad)),
        count=m.count,
    )


def _sharded_ops(cfg: EngineConfig):
    """Trace-time accessor for the explicit shard_map map-op set (None when
    single-device).  Built per (cfg, mesh) — cheap, reconstructed per trace."""
    if cfg.mesh_shape is None:
        return None
    from .parallel.shard_step import make_sharded_map_ops
    from .parallel.sharding import engine_mesh

    return make_sharded_map_ops(cfg, engine_mesh(cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def _predict(m: SurfelMap, T_wc, time, max_time, depth_filt_m, rgb, lost, cfg: EngineConfig):
    """predict() (ElasticFusion.cpp:621-653): ACTIVE combinedPredict + the
    three fill-in passes + the denseEnough statistic (cpp:256-268).

    `time` is the reference's first combinedPredict time argument: tick
    normally, 0 right after a fern-teleport recovery (cpp:624-631) — time=0
    passes EVERY surfel through the active-window gate, rendering the whole
    map so the confirming frame can track against it."""
    sops = _sharded_ops(cfg)
    if sops is not None:
        pred = sops.combined_predict(m, T_wc, time, max_time)
    else:
        pred = combined_predict(
            m, T_wc, cfg.camera, time, max_time, cfg.time_delta,
            cfg.confidence_threshold, cfg.max_depth_processed,
        )
    vtx, nrm, img = fill_all(
        pred, depth_filt_m, rgb, cfg.camera, cfg.max_depth_processed,
        lost, cfg.frame_to_frame_rgb,
    )
    dense_frac = jnp.mean((jnp.sum(pred.image, axis=-1) > 0).astype(jnp.float32))
    return pred, vtx, nrm, img, dense_frac


@functools.partial(jax.jit, static_argnames=("cfg", "do_fill"))
def _track(
    m_pred_vertex, m_pred_normal, m_pred_image,
    depth_filt_m, rgb, so3_last_pyr2, T_prev, cfg: EngineConfig, do_fill: bool,
):
    """frameToModel init + getIncrementalTransformation (cpp:308-324)."""
    vmaps_c, nmaps_c, images_c, depths_c = build_current_frame_pyramids(
        depth_filt_m, rgb, cfg
    )
    vmaps_g, nmaps_g, images_m, depths_m = build_model_pyramids(
        m_pred_vertex, m_pred_normal, m_pred_image, T_prev, cfg
    )
    inputs = OdometryInputs(
        vmaps_curr=vmaps_c,
        nmaps_curr=nmaps_c,
        vmaps_prev_g=vmaps_g,
        nmaps_prev_g=nmaps_g,
        last_images=images_m,
        next_images=images_c,
        last_depths=depths_m,
        next_depths=depths_c,
        so3_last_image=so3_last_pyr2,
        T_prev=T_prev,
    )
    res = get_incremental_transformation(inputs, cfg)
    return res, images_c[cfg.num_pyramid_levels - 1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _model_to_model(
    new_vertex, new_normal, new_image,
    old_vertex, old_normal, old_image,
    T_wc, cfg: EngineConfig,
):
    """modelToModel odometry: align the ACTIVE prediction against the
    INACTIVE one (ElasticFusion.cpp:462-471; icpWeight=10, no SO3)."""
    from .tracking import build_current_model_pyramids

    m2m_cfg = cfg.with_(so3=False, icp_weight=10.0)
    vmaps_c, nmaps_c, images_c, depths_c = build_current_model_pyramids(
        new_vertex, new_normal, new_image, m2m_cfg
    )
    vmaps_g, nmaps_g, images_m, depths_m = build_model_pyramids(
        old_vertex, old_normal, old_image, T_wc, m2m_cfg
    )
    inputs = OdometryInputs(
        vmaps_curr=vmaps_c,
        nmaps_curr=nmaps_c,
        vmaps_prev_g=vmaps_g,
        nmaps_prev_g=nmaps_g,
        last_images=images_m,
        next_images=images_c,
        last_depths=depths_m,
        next_depths=depths_c,
        so3_last_image=images_c[m2m_cfg.num_pyramid_levels - 1],
        T_prev=T_wc,
    )
    return get_incremental_transformation(inputs, m2m_cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fuse_and_clean(
    m: SurfelMap, T_wc, tick, rgb, depth_raw_m, depth_filt_m, weighting,
    cfg: EngineConfig,
):
    """predictIndices -> fuse -> clean (cpp:536-585) as a standalone program
    — used by the external-pose (ground truth) path.  The post-fuse index
    prediction clean consumes is derived in the pixel domain by fuse
    (return_updated_pred) instead of a second full-capacity render."""
    cam = cfg.camera
    pred = predict_indices(
        m, T_wc, cam, tick, cfg.time_delta, cfg.max_depth_processed
    )
    m2, stats, pred2 = fuse(
        m, pred, T_wc, tick, rgb, depth_raw_m, depth_filt_m, cam,
        cfg.max_depth_processed, weighting, return_updated_pred=True,
    )
    m3 = clean(
        m2, pred2, T_wc, tick, cam, cfg.confidence_threshold, cfg.time_delta,
        cfg.max_depth_processed, cfg.unstable_age, fx16_patch=cfg.fx16_clean,
    )
    return m3, stats


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def slam_step(
    m: SurfelMap,
    T_prev,            # (4,4) f32
    so3_hist,          # coarsest-level intensity of previous frame
    pred_vertex, pred_normal, pred_image,   # last frame's (filled) prediction
    depth_mm, rgb,     # current raw frame
    tick,              # f32 scalar
    weighting,         # f32 scalar fusion weight
    cfg: EngineConfig,
):
    """One whole SLAM frame as a single jitted device program: preprocess ->
    track -> fuse -> clean -> predict(+fill-in).  Retained as the minimal
    sharding/compile unit (the driver entry point and parallel tests);
    the Engine's own per-frame program is `_frame_main`, a superset.

    Returns (map', T_curr, so3_hist', (vertex, normal, image) fill-in,
    prediction, dense_frac, tracking stats)."""
    cam = cfg.camera
    raw_m, filt_m = _preprocess(depth_mm, cfg)

    res, so3_cur = _track(
        pred_vertex, pred_normal, pred_image, filt_m, rgb, so3_hist, T_prev,
        cfg, False,
    )
    T = res.T_curr

    pred_idx = predict_indices(m, T, cam, tick, cfg.time_delta, cfg.max_depth_processed)
    m, stats, pred_idx2 = fuse(
        m, pred_idx, T, tick, rgb, raw_m, filt_m, cam,
        cfg.max_depth_processed, weighting, return_updated_pred=True,
    )
    m = clean(
        m, pred_idx2, T, tick, cam, cfg.confidence_threshold, cfg.time_delta,
        cfg.max_depth_processed, cfg.unstable_age, fx16_patch=cfg.fx16_clean,
    )

    pred = combined_predict(
        m, T, cam, tick, tick, cfg.time_delta, cfg.confidence_threshold,
        cfg.max_depth_processed,
    )
    vtx, nrm, img = fill_all(
        pred, filt_m, rgb, cam, cfg.max_depth_processed,
        jnp.bool_(False), cfg.frame_to_frame_rgb,
    )
    dense = jnp.mean((jnp.sum(pred.image, axis=-1) > 0).astype(jnp.float32))
    return m, T, so3_cur, (vtx, nrm, img), pred, dense, res


def _decimate_views(img, vtx, nrm, factor: int):
    """Nearest decimation at output-pixel centres for the fern views
    (the reference's Resize GPU pass, Resize.cpp:69-146) — done on device so
    only ~100 KB crosses to the host, and only when a fern event fires."""
    off = factor // 2
    return (
        img[off::factor, off::factor],
        vtx[:, off::factor, off::factor],
        nrm[:, off::factor, off::factor],
    )


def _sample_nodes(m: SurfelMap, rate: int):
    """Every rate-th surfel's (position, init time) — the deformation-graph
    node sample (sample.geom:33-39), traced inside the frame program."""
    idx = jnp.arange(0, m.pos.shape[1], rate, dtype=jnp.int32)
    return jnp.take(m.pos, idx, axis=1).T, jnp.take(m.init_t, idx)


def _empty_tracking_result():
    z = jnp.float32(0.0)
    return TrackingResult(
        T_curr=jnp.eye(4, dtype=jnp.float32),
        icp_error=z, icp_count=z, rgb_error=z, rgb_count=z,
        so3_error=z, so3_count=z,
        A=jnp.zeros((6, 6), jnp.float32), b=jnp.zeros((6,), jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "do_compact"), donate_argnums=(0,)
)
def _frame_main(
    m: SurfelMap,
    T_prev,                                  # (4,4) f32 carried pose
    so3_hist,                                # prev frame coarsest intensity
    pred_vertex, pred_normal, pred_image,    # carried end-of-frame prediction
    fill_vertex, fill_normal, fill_image,    # its fill-in
    dense_prev,                              # f32: carried predict coverage
    depth_mm, rgb,                           # current raw frame
    tick, max_time,                          # f32 scalars
    lost,                                    # bool
    weight_mult,                             # f32 weightMultiplier
    fern_flat, fern_rgbd,                    # fern encode tables (see ferns)
    db_codes, db_good, db_time, db_count,    # fern keyframe code DB
    cfg: EngineConfig,
    do_compact: bool = True,
):
    """The whole SLAM frame as ONE device program (ElasticFusion.cpp:270-607
    minus the host-decided loop-closure applications):

      preprocess -> frame-to-model tracking (against the carried prediction or
      its fill-in, selected on-device by denseEnough, cpp:256-268,303-315) ->
      velocity fusion weight (cpp:371-383) -> tracking gates (cpp:326-344,
      on-device; the reference round-trips 29 floats per GN iteration) ->
      [fuse -> clean] under lax.cond -> end-of-frame combinedPredict + FillIn
      (cpp:599) -> fern views + on-device fern encoding (Ferns.cpp:108-127) ->
      deformation node sample (cpp:591-597) -> INACTIVE combinedPredict +
      model-to-model odometry under lax.cond (cpp:447-471, skipped while the
      inactive model is empty).

    Loop-closure deviations from the reference's in-frame ordering: ferns and
    the local (active/inactive) registration consume the END-of-frame
    prediction rather than the post-track pre-fuse one (cpp:387) — same tick,
    same pose, one fusion newer — and their *decisions* are made by the host
    up to pipeline_depth frames later, repaired by `_apply_closure`.
    """
    from .ferns import fern_encode_device, fern_score_device

    cam = cfg.camera
    raw_m, filt_m = _preprocess(depth_mm, cfg)

    use_fill = (dense_prev < 0.75) | jnp.bool_(cfg.frame_to_frame_rgb)
    pv = jnp.where(use_fill, fill_vertex, pred_vertex)
    pn = jnp.where(use_fill, fill_normal, pred_normal)
    pi = jnp.where(use_fill, fill_image, pred_image)

    res, so3_cur = _track(pv, pn, pi, filt_m, rgb, so3_hist, T_prev, cfg, False)
    T = res.T_curr

    # velocity-adaptive fusion weight (cpp:371-383)
    T_cp = jnp.linalg.inv(T) @ T_prev
    w = jnp.minimum(
        jnp.maximum(jnp.linalg.norm(T_cp[:3, 3]), se3_log_norm(T_cp)), 0.01
    )
    weighting = jnp.maximum(1.0 - w / 0.01, 0.5) * weight_mult

    # tracking-failure gates on-device (cpp:326-344; 1e-4 literals there —
    # config knobs here, see EngineConfig.reloc_icp_error)
    if cfg.reloc_mode:
        Ainv = jnp.linalg.inv(
            res.A.astype(jnp.float32) + jnp.eye(6, dtype=jnp.float32) * 1e-12
        )
        cov_ok = jnp.all(jnp.diag(Ainv) < cfg.reloc_cov_threshold)
        track_ok = (res.icp_error < cfg.reloc_icp_error) & cov_ok
    else:
        track_ok = jnp.bool_(True)

    sops = _sharded_ops(cfg)
    if sops is not None:
        # explicit shard_map scaling path (parallel/shard_step.py): one
        # region covers predictIndices -> fuse -> clean -> end-of-frame
        # predict -> node sample -> INACTIVE predict, with pixel-domain
        # merges as the only collectives
        do_fuse = (track_ok & ~lost) & jnp.bool_(not cfg.rgb_only)
        (m, stats, pred, old_pred, inact_px, node_pos,
         node_t) = sops.frame_map_section(
            m, T, tick, rgb, raw_m, filt_m, weighting,
            do_fuse, jnp.bool_(cfg.closeLoops), do_compact,
        )
        vtx, nrm, img = fill_all(
            pred, filt_m, rgb, cam, cfg.max_depth_processed,
            lost, cfg.frame_to_frame_rgb,
        )
        dense = jnp.mean((jnp.sum(pred.image, axis=-1) > 0).astype(jnp.float32))
    else:
        def _with_fuse(mm):
            pidx = predict_indices(
                mm, T, cam, tick, cfg.time_delta, cfg.max_depth_processed
            )
            # the post-fuse prediction clean needs is derived in the pixel
            # domain by fuse — no second full-capacity predictIndices sort
            m2, stats, pidx2 = fuse(
                mm, pidx, T, tick, rgb, raw_m, filt_m, cam,
                cfg.max_depth_processed, weighting, return_updated_pred=True,
            )
            m3 = clean(
                m2, pidx2, T, tick, cam, cfg.confidence_threshold,
                cfg.time_delta, cfg.max_depth_processed, cfg.unstable_age,
                do_compact=do_compact,
            )
            return m3, stats

        def _no_fuse(mm):
            z = jnp.int32(0)
            return mm, FuseStats(matched=z, added=z, count=mm.count)

        if cfg.rgb_only:
            m, stats = _no_fuse(m)
        else:
            m, stats = jax.lax.cond(track_ok & ~lost, _with_fuse, _no_fuse, m)

        # end-of-frame predict (cpp:599) — next frame's tracking target and
        # the fern/addFrame view source
        pred, vtx, nrm, img, dense = _predict(
            m, T, tick, max_time, filt_m, rgb, lost, cfg
        )

    out = dict(
        map=m, T=T, so3=so3_cur, res=res, track_ok=track_ok,
        pred=pred, fill=(vtx, nrm, img), dense=dense, stats=stats,
    )

    if cfg.closeLoops:
        img_s, vtx_s, nrm_s = _decimate_views(img, vtx, nrm, cfg.fern_pyramid_factor)
        codes, good = fern_encode_device(img_s, vtx_s, fern_flat, fern_rgbd)
        # on-device keyframe retrieval scoring (Ferns.cpp:108-228): the host
        # reads four scalars instead of rescoring the whole DB per frame
        add_min, best_id, best_d, block_hd = fern_score_device(
            codes, good, db_codes, db_good, db_time, db_count,
            tick, cfg.fern_min_age,
        )

        H, W = cam.height, cam.width
        hs, ws = -(-H // CONS_SAMPLE), -(-W // CONS_SAMPLE)

        if sops is not None:
            # INACTIVE prediction already merged by the region; the (heavy,
            # fully replicated) model-to-model solve still skips via cond —
            # its predicate and inputs are replicated, and it contains no
            # collectives
            def _m2m_run(_):
                r2 = _model_to_model(
                    pred.vertex, pred.normal, pred.image,
                    old_pred.vertex, old_pred.normal, old_pred.image, T, cfg,
                )
                return r2, old_pred.time[::CONS_SAMPLE, ::CONS_SAMPLE]

            def _m2m_skip(_):
                return (_empty_tracking_result(),
                        jnp.zeros((hs, ws), jnp.float32))

            m2m, cons_ot = jax.lax.cond(inact_px > 0, _m2m_run, _m2m_skip, 0)
        else:
            node_pos, node_t = _sample_nodes(m, cfg.def_graph_sample_rate)

            # local loop closure precompute (cpp:447-511): skip the INACTIVE
            # splat + model-to-model solve entirely while no inactive surfel
            # exists (the common case until the trajectory revisits old space)
            slot = jax.lax.broadcasted_iota(
                jnp.int32, (m.capacity, 1), 0).squeeze(-1)
            inact_exists = jnp.sum(
                ((slot < m.count)
                 & (m.conf >= cfg.confidence_threshold)
                 & (m.last_t <= tick - cfg.time_delta)).astype(jnp.int32)
            ) > 0

            def _m2m_run(_):
                old_pred = combined_predict(
                    m, T, cam, jnp.float32(0.0), tick - cfg.time_delta,
                    cfg.time_delta, cfg.confidence_threshold,
                    cfg.max_depth_processed,
                )
                icount = jnp.sum((old_pred.depth > 0).astype(jnp.int32))
                r2 = _model_to_model(
                    pred.vertex, pred.normal, pred.image,
                    old_pred.vertex, old_pred.normal, old_pred.image, T, cfg,
                )
                return r2, icount, old_pred.time[::CONS_SAMPLE, ::CONS_SAMPLE]

            def _m2m_skip(_):
                return (
                    _empty_tracking_result(), jnp.int32(0),
                    jnp.zeros((hs, ws), jnp.float32),
                )

            m2m, inact_px, cons_ot = jax.lax.cond(
                inact_exists, _m2m_run, _m2m_skip, 0
            )
        out.update(
            views=(img_s, vtx_s, nrm_s), codes=codes, good=good,
            add_min=add_min, best_id=best_id, best_d=best_d,
            block_hd=block_hd,
            node_pos=node_pos, node_t=node_t,
            m2m=m2m, inact_px=inact_px,
            cons_pv=pred.vertex[:, ::CONS_SAMPLE, ::CONS_SAMPLE],
            cons_ot=cons_ot,
        )

    # everything `_finish` reads, as ONE f32 vector: each separate
    # device->host read costs a tunnel RPC (~18 reads measured 76 ms/frame
    # of drain; one packed 15 KB vector is a single transfer).  All values
    # are integer-exact in f32 (counts < 2^24, 4-bit fern codes).
    fin = [
        T.reshape(-1),
        res.icp_error[None], res.icp_count[None],
        track_ok.astype(jnp.float32)[None],
        stats.count.astype(jnp.float32)[None],
        # max per-shard count (== count when single-device): the growth
        # trigger under sub-map sharding watches the fullest shard
        jnp.max(m.count).astype(jnp.float32)[None],
    ]
    if cfg.closeLoops:
        fin += [
            out["codes"].astype(jnp.float32),
            jnp.asarray(out["good"], jnp.float32)[None],
            out["m2m"].T_curr.reshape(-1),
            out["m2m"].icp_error[None], out["m2m"].icp_count[None],
            out["m2m"].A.reshape(-1),
            out["inact_px"].astype(jnp.float32)[None],
            out["cons_pv"].reshape(-1),
            out["cons_ot"].reshape(-1),
            out["add_min"][None], out["best_id"].astype(jnp.float32)[None],
            out["best_d"][None], out["block_hd"][None],
        ]
    out["finish_vec"] = jnp.concatenate(
        [jnp.asarray(x, jnp.float32) for x in fin]
    )
    return out


@functools.partial(
    jax.jit, static_argnames=("cfg", "fern_accepted"), donate_argnums=(0,)
)
def _apply_closure(
    m: SurfelMap,
    graph,                 # deformation.GraphState (optimized)
    T_fix,                 # (4,4) f32 world-frame left-correction
    closure_tick,          # f32: surfels with init_t >= this get the rigid fix
    T_carried,             # (4,4) f32 current carried pose (pre-fix)
    tick_now, max_time, lost,
    depth_mm, rgb,         # latest raw frame (for the re-predict fill-in)
    fern_flat, fern_rgbd,
    cfg: EngineConfig,
    fern_accepted: bool,
):
    """Deferred loop-closure repair.  The reference corrects the pose and
    deforms the map inside the same frame (ElasticFusion.cpp:410-534 +
    clean's graph application, copy_unstable.vert:132-321); the pipelined
    engine learns of the acceptance up to pipeline_depth frames later, so
    this program (a) deforms every surfel older than the closure frame
    through the optimized graph, (b) rigidly applies the pose correction to
    surfels fused at/after it (they were fused at the pre-correction poses,
    which differ by exactly T_fix), (c) refreshes timestamps against the
    synthesized inactive depth (cpp:561-570), (d) re-cleans, and (e)
    regenerates the carried prediction/fern state at the corrected pose."""
    from .deformation import apply_graph_to_surfels
    from .ferns import fern_encode_device

    cam = cfg.camera
    raw_m, filt_m = _preprocess(depth_mm, cfg)
    T_new = (T_fix @ T_carried).astype(jnp.float32)

    deformed_pos, deformed_nrm = apply_graph_to_surfels(m, graph)
    recent = m.init_t >= closure_tick
    Rf = T_fix[:3, :3].astype(jnp.float32)
    tf = T_fix[:3, 3].astype(jnp.float32)
    rig_pos = Rf @ m.pos + tf[:, None]
    rig_nrm = Rf @ m.normal
    new_pos = jnp.where(recent[None], rig_pos, deformed_pos)
    new_nrm = jnp.where(recent[None], rig_nrm, deformed_nrm)

    depth_synth = None
    if not fern_accepted:
        # time=tick, maxTime=tick-timeDelta, timeDelta=uint16-max (cpp:561-569)
        depth_synth = synthesize_depth(
            m, T_new, cam, tick_now, tick_now - cfg.time_delta, 65535,
            cfg.confidence_threshold, cfg.max_depth_processed,
        )

    m1 = m._replace(pos=new_pos, normal=new_nrm)
    if depth_synth is not None:
        # timestamp refresh of deformed surfels vs the synthesized old-model
        # depth (copy_unstable.vert:305-321)
        from .ops.gatherpack import packed_gather

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
            (m1.conf > cfg.confidence_threshold) & ~recent & inb
            & (d > 0) & (lp2[2] < d + 0.1)
        )
        m1 = m1._replace(
            last_t=jnp.where(refresh, jnp.float32(tick_now), m1.last_t)
        )

    pidx = predict_indices(
        m1, T_new, cam, tick_now, cfg.time_delta, cfg.max_depth_processed
    )
    m2 = clean(
        m1, pidx, T_new, tick_now, cam, cfg.confidence_threshold,
        cfg.time_delta, cfg.max_depth_processed, cfg.unstable_age,
    )

    pred, vtx, nrm, img, dense = _predict(
        m2, T_new, tick_now, max_time, filt_m, rgb, lost, cfg
    )
    img_s, vtx_s, nrm_s = _decimate_views(img, vtx, nrm, cfg.fern_pyramid_factor)
    codes, good = fern_encode_device(img_s, vtx_s, fern_flat, fern_rgbd)
    node_pos, node_t = _sample_nodes(m2, cfg.def_graph_sample_rate)
    return dict(
        map=m2, T=T_new, pred=pred, fill=(vtx, nrm, img), dense=dense,
        views=(img_s, vtx_s, nrm_s), codes=codes, good=good,
        node_pos=node_pos, node_t=node_t, count=m2.count,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "fern_accepted"), donate_argnums=(0,)
)
def _apply_closure_sharded(
    m: SurfelMap, graph, T_fix, closure_tick, T_carried,
    tick_now, max_time, lost, depth_mm, rgb, fern_flat, fern_rgbd,
    cfg: EngineConfig, fern_accepted: bool,
):
    """`_apply_closure` on the explicit shard_map path: the map section
    (graph application + rigid fix + timestamp refresh + clean + re-predict
    + node sample) runs per-shard with pixel-domain merges; fill-in and
    fern encoding stay replicated outside the region."""
    from .ferns import fern_encode_device

    cam = cfg.camera
    sops = _sharded_ops(cfg)
    raw_m, filt_m = _preprocess(depth_mm, cfg)
    T_new = (T_fix @ T_carried).astype(jnp.float32)
    m2, pred, node_pos, node_t = sops.closure_map_section(
        m, graph, T_fix.astype(jnp.float32), closure_tick, T_new, tick_now,
        fern_accepted,
    )
    vtx, nrm, img = fill_all(
        pred, filt_m, rgb, cam, cfg.max_depth_processed,
        lost, cfg.frame_to_frame_rgb,
    )
    dense = jnp.mean((jnp.sum(pred.image, axis=-1) > 0).astype(jnp.float32))
    img_s, vtx_s, nrm_s = _decimate_views(img, vtx, nrm, cfg.fern_pyramid_factor)
    codes, good = fern_encode_device(img_s, vtx_s, fern_flat, fern_rgbd)
    return dict(
        map=m2, T=T_new, pred=pred, fill=(vtx, nrm, img), dense=dense,
        views=(img_s, vtx_s, nrm_s), codes=codes, good=good,
        node_pos=node_pos, node_t=node_t, count=jnp.sum(m2.count),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fuse_and_clean_sharded(
    m: SurfelMap, T_wc, tick, rgb, depth_raw_m, depth_filt_m, weighting,
    cfg: EngineConfig,
):
    """Sharded `_fuse_and_clean` (the external-pose path)."""
    sops = _sharded_ops(cfg)
    m2, stats, _pred, *_ = sops.frame_map_section(
        m, T_wc, tick, rgb, depth_raw_m, depth_filt_m, weighting,
        jnp.bool_(True), jnp.bool_(False), True,
    )
    return m2, stats


@functools.partial(jax.jit, static_argnames=("cfg",))
def _predict_only(
    m: SurfelMap, T_wc, tick, max_time, depth_filt_m, rgb, lost,
    cfg: EngineConfig,
):
    """predict() + fill-in + fern views without fusion (first frame,
    relocalization teleport, checkpoint restore)."""
    pred, vtx, nrm, img, dense = _predict(
        m, T_wc, tick, max_time, depth_filt_m, rgb, lost, cfg
    )
    fern = _decimate_views(img, vtx, nrm, cfg.fern_pyramid_factor)
    return pred, (vtx, nrm, img), dense, fern


@jax.jit
def _encode_views(img_s, vtx_s, fern_flat, fern_rgbd):
    from .ferns import fern_encode_device

    return fern_encode_device(img_s, vtx_s, fern_flat, fern_rgbd)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _coarse_intensity(rgb, cfg: EngineConfig):
    """Coarsest-level intensity pyramid of a frame (for next frame's SO3
    pre-alignment history, RGBDOdometry initFirstRGB + image swap)."""
    img = rgb_to_intensity(rgb)
    for _ in range(1, cfg.num_pyramid_levels):
        img = pyr_down_intensity(img)
    return img


# ---------------------------------------------------------------------------
# Engine
# ---------------------------------------------------------------------------


@dataclass
class FrameResult:
    """Per-frame summary.  With pipeline_depth > 0 the fields describe the
    most recently FINISHED frame (up to depth frames behind the one just
    submitted); `flush()` drains the pipeline."""

    T_wc: np.ndarray
    tracking_ok: bool
    lost: bool
    icp_error: float
    icp_count: float
    fused: bool
    count_dev: object = None   # device i32 scalar; sync on access

    @property
    def surfel_count(self) -> int:
        """Live surfel count — materializing it synchronizes the device, so
        it is lazy (the per-frame loop should not read it every frame)."""
        if self.count_dev is None:
            return 0
        c = np.asarray(self.count_dev)
        return int(c.sum()) if c.ndim else int(c)


class Engine:
    """TPU-native dense RGB-D SLAM engine with the ElasticFusion surface
    (construct, process_frame per frame, save_ply / save_trajectory)."""

    def __init__(self, cfg: EngineConfig = EngineConfig()):
        self.cfg = cfg
        # multi-device: shard the surfel map over cfg.mesh_shape's 'map'
        # axis, replicate frame state; GSPMD inserts the collectives
        from .parallel.sharding import engine_mesh

        self.mesh = engine_mesh(cfg)
        self.tick = 1                             # starts at 1 (EF.cpp:55)
        self.T_wc = np.eye(4)                     # f64 host pose (Sophus parity)
        self.lost = False
        self.tracking_count = 0
        self.last_frame_recovery = False
        # t_T_wc: tick-keyed pose graph (deformations rewrite it) + the
        # parallel timestamp log (EF.cpp:588-589, 112-139)
        self.tick_poses: List[Tuple[int, np.ndarray]] = []
        self.pose_times: List[int] = []
        self.map: Optional[SurfelMap] = None
        self.stopwatch = Stopwatch()
        self.deforms = 0
        self.fern_deforms = 0
        # carried device state (producer side of the pipeline)
        self._T_dev = None          # (4,4) f32 device pose
        self._so3_hist = None       # prev frame coarsest intensity
        self._pred = None           # Prediction from end-of-last-frame predict()
        self._fill = None           # (vertex, normal, image) fill-in maps
        self._dense_dev = None      # f32 scalar device: last predict coverage
        self._views = None          # decimated (img, vtx, nrm) of last predict
        self._codes = None          # device fern codes of last predict
        self._good = None
        self._last_frame_dev = None  # (depth_d, rgb_d) of latest dispatch
        self._count_est = 0         # host upper bound on map.count
        self._count_finished = 0    # exact count of the last finished frame
        self._count_max_finished = 0  # max per-shard count (sharded growth)
        self._last_icp_error = 0.0
        self._last_icp_count = 0.0
        self._last_tracking_ok = True
        self._last_fused = False
        # pipeline
        self._inflight: deque = deque()
        self._seq = 0  # monotone dispatch counter (ticks can repeat while lost)
        # Pose corrections for frames that were IN FLIGHT when a closure (or
        # teleport) rewrote the carried device pose: list of
        # (closure_seq, last_inflight_seq, 4x4 np.float64).  A finished
        # frame's device pose needs fix F iff it was dispatched after F's
        # closure frame but before F was applied (closure_seq < seq <=
        # last_inflight_seq); frames dispatched later carry the corrected
        # _T_dev already.  Applying a fix outside its window double-corrects
        # (every post-closure pose would be off by T_fix, compounding).
        self._pose_fixes: List[Tuple[int, int, np.ndarray]] = []
        # loop-closure subsystems (ferns.py / deformation.py)
        self.ferns = None
        self.local_deformation = None
        self.global_deformation = None
        self.relative_cons: list = []
        if cfg.closeLoops:
            self.enable_loop_closure()

    def enable_loop_closure(self) -> None:
        """Construct the fern DB and the two deformations (local graph sampled
        from the map, global resampled 1/5 — ElasticFusion.h:259-266)."""
        from .deformation import Deformation
        from .ferns import Ferns

        self.ferns = Ferns(self.cfg)
        self.local_deformation = Deformation(
            node_capacity=self.cfg.max_deformation_nodes,
            sample_rate=self.cfg.def_graph_sample_rate,
        )
        self.global_deformation = Deformation(
            node_capacity=self.cfg.max_deformation_nodes,
            sample_rate=self.cfg.def_graph_sample_rate,
        )

    # -- public knobs (reference getters/setters, ElasticFusion.h:87-255) ----
    @property
    def surfel_count(self) -> int:
        self.flush()
        return 0 if self.map is None else self._count_total(self.map.count)

    @property
    def poses(self) -> List[Tuple[int, np.ndarray]]:
        """Timestamped (possibly deformation-corrected) trajectory."""
        self.flush()
        return [
            (ts, T) for ts, (_, T) in zip(self.pose_times, self.tick_poses)
        ]

    def flush(self) -> None:
        """Finish every in-flight frame (host reads + loop-closure logic)."""
        while self._inflight:
            self._finish(self._inflight.popleft())

    def _rep(self, x):
        """Replicate a host/device value onto the engine mesh (no-op when
        single-device)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(x, NamedSharding(self.mesh, P()))

    def _shard_map(self, m: SurfelMap) -> SurfelMap:
        """Bring a map into the engine's device layout: single-device maps
        are redistributed into the per-shard sub-map layout (round-robin,
        count -> [S] vector) for the explicit shard_map path; already-sharded
        maps pass through."""
        if self.mesh is None:
            return m
        if getattr(m.count, "ndim", 0) == 1:
            return m  # already in sub-map layout
        from .parallel.shard_step import distribute_map

        return distribute_map(m, self.mesh)

    def _count_total(self, count) -> int:
        c = np.asarray(jax.device_get(count))
        return int(c.sum()) if c.ndim else int(c)

    def _fern_tables(self):
        if self.ferns is not None:
            if getattr(self, "_fern_tables_dev", None) is None:
                self._fern_tables_dev = tuple(
                    self._rep(t) for t in self.ferns.encode_tables()
                )
            return self._fern_tables_dev
        if getattr(self, "_fern_tables_dev", None) is None:
            self._fern_tables_dev = (
                self._rep(jnp.zeros((1,), jnp.int32)),
                self._rep(jnp.zeros((1, 4), jnp.float32)),
            )
        return self._fern_tables_dev

    def _fern_db(self):
        if self.ferns is not None:
            c, g, t, n = self.ferns.device_db()
            return (self._rep(c), self._rep(g), self._rep(t), self._rep(n))
        one = self._rep(jnp.full((1, 1), 255, jnp.int32))
        z1 = self._rep(jnp.zeros((1,), jnp.float32))
        return one, z1, self._rep(jnp.full((1,), jnp.inf, jnp.float32)), \
            self._rep(jnp.int32(0))

    def process_frame(
        self,
        rgb: np.ndarray,           # [H,W,3] u8
        depth_mm: np.ndarray,      # [H,W] u16 millimetres
        timestamp: int = 0,
        weight_multiplier: float = 1.0,
        in_T_wc: Optional[np.ndarray] = None,
    ) -> FrameResult:
        cfg = self.cfg
        sw = self.stopwatch
        sw.tick("Run")
        sw.tick("Preprocess")
        rgb_d = self._rep(jnp.asarray(rgb))
        depth_d = self._rep(jnp.asarray(depth_mm))
        self._last_frame_dev = (depth_d, rgb_d)
        sw.tock("Preprocess")

        if self.tick == 1:
            self._first_frame(depth_d, rgb_d, timestamp, in_T_wc)
            sw.tock("Run")
            return self._result()

        if in_T_wc is not None:
            self._external_pose_frame(
                depth_d, rgb_d, timestamp, weight_multiplier, in_T_wc
            )
            sw.tock("Run")
            return self._result()

        # after a checkpoint restore there is no carried prediction yet:
        # regenerate it from the restored map at the restored pose
        if self._pred is None or self._T_dev is None:
            self._regenerate_carried(depth_d, rgb_d)

        self._maybe_grow()

        tick_dev = self._rep(jnp.float32(self.tick))
        # consume the recovery flag at dispatch and CARRY it into the inflight
        # record: _reloc_update must see the per-frame value at finish time,
        # not the engine attribute (already reset by then).  The whole-map
        # recovery render (combinedPredict time=0, ElasticFusion.cpp:624-631)
        # already happened in _teleport's _regenerate_carried — this frame
        # tracks against it; its own end-of-frame predict is normal (the
        # reference resets lastFrameRecovery before predict, cpp:361-364).
        was_recovery = self.last_frame_recovery
        self.last_frame_recovery = False
        fern_flat, fern_rgbd = self._fern_tables()
        db_codes, db_good, db_time, db_count = self._fern_db()

        # span names are honest about pipelining: "dispatch" is the async
        # submission of the whole frame program (not odometry time), "drain"
        # is the host-side completion of frames older than pipeline_depth.
        # Per-stage device costs live in tools_profile.py / PROFILE.md.
        sw.tick("dispatch")
        out = _frame_main(
            self.map, self._T_dev, self._so3_hist,
            self._pred.vertex, self._pred.normal, self._pred.image,
            self._fill[0], self._fill[1], self._fill[2],
            self._dense_dev, depth_d, rgb_d,
            tick_dev, tick_dev, self._rep(jnp.bool_(self.lost)),
            self._rep(jnp.float32(weight_multiplier)),
            fern_flat, fern_rgbd,
            db_codes, db_good, db_time, db_count, cfg,
            do_compact=(self.tick % cfg.compact_every == 0),
        )
        sw.tock("dispatch")

        # carried state advances immediately (device handles, no sync)
        self.map = out["map"]
        self._T_dev = out["T"]
        self._so3_hist = out["so3"]
        self._pred = out["pred"]
        self._fill = out["fill"]
        self._dense_dev = out["dense"]
        if cfg.closeLoops:
            self._views = out["views"]
            self._codes, self._good = out["codes"], out["good"]

        self._inflight.append(dict(
            tick=self.tick, timestamp=timestamp,
            lost_at_dispatch=self.lost, recovery=was_recovery,
            seq=self._seq, out=out,
        ))
        self._prefetch(self._finish_reads(out))
        self._seq += 1
        self._count_est += (cfg.camera.width * cfg.camera.height) // 4
        if not self.lost:
            self.tick += 1

        sw.tick("drain")
        while len(self._inflight) > cfg.pipeline_depth:
            self._finish(self._inflight.popleft())
        sw.tock("drain")
        sw.tock("Run")
        return self._result()

    # -- frame variants --------------------------------------------------------

    def _first_frame(self, depth_d, rgb_d, timestamp, in_T_wc):
        cfg = self.cfg
        raw_m, filt_m = _preprocess(depth_d, cfg)
        n_px = cfg.camera.width * cfg.camera.height
        # initial bucket: first frame fills at most n_px slots and every
        # per-surfel op costs O(capacity) — start tight, grow on demand
        # (or start at the caller-pinned bucket: one compile, no growth)
        cap0 = _next_bucket(
            max(n_px + n_px // 4, cfg.initial_surfels or 0), cfg.max_surfels
        )
        if self.mesh is not None:
            import math

            S = math.prod(cfg.mesh_shape)
            cap0 = -(-cap0 // S) * S  # sub-map layout: capacity % S == 0
        m_single = _init_map(raw_m, filt_m, rgb_d, cfg, cap0)
        # sample the deformation nodes from the single-device layout (its
        # slot order is time order); the sharded layout interleaves shards
        if self.local_deformation is not None:
            node_sample = _sample_nodes(m_single, cfg.def_graph_sample_rate)
            node_count = m_single.count
        self.map = self._shard_map(m_single)
        self._count_est = n_px
        self._so3_hist = _coarse_intensity(rgb_d, cfg)  # initFirstRGB
        if in_T_wc is not None:
            self.T_wc = np.asarray(in_T_wc, np.float64)
        self._T_dev = self._rep(jnp.asarray(self.T_wc, jnp.float32))
        one = self._rep(jnp.float32(1.0))
        (self._pred, self._fill, self._dense_dev, self._views) = _predict_only(
            self.map, self._T_dev, one, one,
            filt_m, rgb_d, self._rep(jnp.bool_(False)), cfg,
        )
        if self.ferns is not None:
            ff, fr = self._fern_tables()
            self._codes, self._good = _encode_views(
                self._views[0], self._views[1], ff, fr
            )
        self.tick_poses.append((1, self.T_wc.copy()))
        self.pose_times.append(int(timestamp))
        if self.local_deformation is not None:
            self.local_deformation.set_sampled(*node_sample, node_count)
            self.global_deformation.sample_graph_from(self.local_deformation)
        self.tick = 2

    def _external_pose_frame(self, depth_d, rgb_d, timestamp,
                             weight_multiplier, in_T_wc):
        """Ground-truth-pose path (ElasticFusion.cpp external pose): no
        tracking, no loop closures (closures are pointless under supplied
        poses) — synchronous."""
        cfg = self.cfg
        self.flush()
        self._maybe_grow()
        raw_m, filt_m = _preprocess(depth_d, cfg)
        T_prev = self.T_wc.copy()
        self.T_wc = np.asarray(in_T_wc, np.float64)
        self._T_dev = self._rep(jnp.asarray(self.T_wc, jnp.float32))
        self._so3_hist = _coarse_intensity(rgb_d, cfg)
        # velocity-adaptive fusion weight on host (cpp:371-383)
        T_cp = np.linalg.inv(self.T_wc) @ T_prev
        w = min(max(float(np.linalg.norm(T_cp[:3, 3])), _np_se3_log_norm(T_cp)), 0.01)
        weighting = self._rep(
            jnp.float32(max(1.0 - w / 0.01, 0.5) * weight_multiplier)
        )

        tick_dev = self._rep(jnp.float32(self.tick))
        if self.mesh is not None:
            self.map, stats = _fuse_and_clean_sharded(
                self.map, self._T_dev, tick_dev, rgb_d, raw_m, filt_m,
                weighting, cfg,
            )
        else:
            self.map, stats = _fuse_and_clean(
                self.map, self._T_dev, tick_dev, rgb_d, raw_m, filt_m,
                weighting, cfg,
            )
        (self._pred, self._fill, self._dense_dev, self._views) = _predict_only(
            self.map, self._T_dev, tick_dev, tick_dev, filt_m, rgb_d,
            self._rep(jnp.bool_(False)), cfg,
        )
        self._count_est = int(stats.count)
        self._last_fused = True
        self.tick_poses.append((self.tick, self.T_wc.copy()))
        self.pose_times.append(int(timestamp))
        self.tick += 1

    def _regenerate_carried(self, depth_d, rgb_d):
        cfg = self.cfg
        raw_m, filt_m = _preprocess(depth_d, cfg)
        self.map = self._shard_map(self.map)
        self._T_dev = self._rep(jnp.asarray(self.T_wc, jnp.float32))
        tick_dev = self._rep(jnp.float32(self.tick))
        # right after a fern teleport the reference renders the WHOLE map
        # (combinedPredict time=0, maxTime=tick, ElasticFusion.cpp:624-631):
        # time=0 passes every surfel through the active-window gate so the
        # confirming frame has a full prediction to track against
        pred_time = (
            self._rep(jnp.float32(0.0)) if self.last_frame_recovery else tick_dev
        )
        (self._pred, self._fill, self._dense_dev, self._views) = _predict_only(
            self.map, self._T_dev, pred_time, tick_dev, filt_m, rgb_d,
            self._rep(jnp.bool_(self.lost)), cfg,
        )
        if self.ferns is not None:
            ff, fr = self._fern_tables()
            self._codes, self._good = _encode_views(
                self._views[0], self._views[1], ff, fr
            )
        if self._so3_hist is None:
            self._so3_hist = _coarse_intensity(rgb_d, cfg)
        if self._count_est == 0 and self.map is not None:
            self._count_est = int(self.map.count)

    def _maybe_grow(self):
        """Grow to the next capacity bucket before the tail can overflow.

        `_count_est` is a host-side UPPER bound maintained without any sync:
        `_finish` resets it to the finished frame's exact count plus
        (H*W/4) per still-in-flight frame (fuse's per-frame append maximum —
        the measurement subsample), and each dispatch adds another H*W/4.
        Growing on the bound alone is safe (we only ever grow early, by at
        most pipeline_depth+1 frame-maxima) and keeps the pipeline async —
        an earlier flush()-to-resync here cost a full pipeline stall EVERY
        frame once the estimate sat above the threshold (measured 81 ms of
        device_get per frame at 640x480: the whole fps gap vs the chip
        profile)."""
        cfg = self.cfg
        if self.map is None:
            return
        cap = self.map.capacity
        # grow on the last FINISHED frame's exact count (the padded
        # _count_est overshoots by (depth+1) frame-maxima and would grow a
        # bucket early — per-surfel ops then run 2x slower for nothing).
        # Worst case a full-novel-view burst saturates fuse's append clamp
        # for the in-flight frames; the next finish triggers growth and the
        # dropped measurements re-enter on the following frames.
        # estimate of the ACTUAL live count: before the first finish,
        # _count_est carries (H*W/4) of padding per in-flight frame — growing
        # on the padded value over-grew two buckets during warmup (measured:
        # 565k -> 893k capacity at ~307k live; per-surfel ops are O(capacity),
        # the whole bench paid ~1.6x for nothing)
        hw4 = (cfg.camera.width * cfg.camera.height) // 4
        inflight_pad = len(self._inflight) * hw4
        est = self._count_finished or max(self._count_est - inflight_pad, 0)
        if self.mesh is not None:
            # sub-map layout: the trigger watches the FULLEST shard (each
            # shard overflows individually); grow keeps capacity a multiple
            # of S and pads every shard in a shard-local region
            import math

            S = math.prod(self.cfg.mesh_shape)
            cap_l = cap // S
            est_max = self._count_max_finished or (est // S)
            if cap < cfg.max_surfels and est_max > 0.8 * cap_l:
                target = _next_bucket(
                    int(1.35 * est_max) * S + hw4, cfg.max_surfels
                )
                target = -(-target // S) * S
                from .parallel.shard_step import make_sharded_map_ops

                sops = make_sharded_map_ops(cfg, self.mesh)
                self.map = sops.grow(self.map, target)
            return
        if cap < cfg.max_surfels and est > 0.8 * cap:
            # 1.35 > 1/0.8 so the new bucket sits below its own trigger; one
            # frame-maximum of explicit headroom absorbs the common in-flight
            # case — bursts beyond it are clamped in-bounds by fuse and the
            # dropped measurements re-enter after growth.  (Deliberately NOT
            # (pipeline_depth+1) maxima: capacity is the per-surfel-op cost,
            # so over-provisioning costs every frame; the clamp is safe.)
            self.map = _grow_map(
                self.map,
                _next_bucket(int(1.35 * est) + hw4, cfg.max_surfels),
            )

    def _result(self) -> FrameResult:
        return FrameResult(
            T_wc=self.T_wc.copy(),
            tracking_ok=self._last_tracking_ok,
            lost=self.lost,
            icp_error=self._last_icp_error,
            icp_count=self._last_icp_count,
            fused=self._last_fused,
            count_dev=None if self.map is None else self.map.count,
        )

    # -- consumer side of the pipeline ----------------------------------------

    def _finish_reads(self, out):
        """The per-frame outputs `_finish` materializes on the host — ONE
        packed f32 vector (see _frame_main's finish_vec)."""
        return [out["finish_vec"]]

    @staticmethod
    def _prefetch(reads) -> None:
        """Start device->host copies of a frame's small outputs right at
        dispatch: through the device tunnel a blocking device_get costs a
        full RPC round trip (~30 ms) even when the data is long since
        computed, so the copy must already be in flight by the time
        `_finish` reads it pipeline_depth frames later."""
        for r in reads:
            try:
                r.copy_to_host_async()
            except AttributeError:
                pass

    def _finish(self, rec) -> None:
        """Host-side completion of one frame: one batched device read
        (overlapped — see _prefetch), pose log, relocalization state machine,
        fern DB ops, loop-closure decisions."""
        cfg = self.cfg
        out = rec["out"]
        vec = np.asarray(jax.device_get(out["finish_vec"]), np.float64)
        T_np = vec[0:16].reshape(4, 4)
        err, cnt = vec[16], vec[17]
        tok = vec[18] != 0.0
        count = vec[19]
        max_shard_count = vec[20]

        T_host = self._fixed_pose(rec, np.asarray(T_np, np.float64))
        self.T_wc = T_host
        self._last_icp_error = float(err)
        self._last_icp_count = float(cnt)
        self._count_finished = int(count)
        self._count_max_finished = int(max_shard_count)
        self._count_est = int(count) + len(self._inflight) * (
            (cfg.camera.width * cfg.camera.height) // 4
        )

        tracking_ok = True
        if cfg.reloc_mode:
            tracking_ok = self._reloc_update(bool(tok), rec["recovery"])
        self._last_tracking_ok = tracking_ok
        self._last_fused = (
            (not cfg.rgb_only) and bool(tok) and not rec["lost_at_dispatch"]
        )

        self.tick_poses.append((rec["tick"], self.T_wc.copy()))
        self.pose_times.append(int(rec["timestamp"]))

        # deformation node sample of this frame's map state (cpp:591-597)
        if self.local_deformation is not None:
            self.local_deformation.set_sampled(
                out["node_pos"], out["node_t"], out["stats"].count
            )
            self.global_deformation.sample_graph_from(self.local_deformation)

        if cfg.closeLoops and self.ferns is not None:
            F = self.ferns.num
            H, W = cfg.camera.height, cfg.camera.width
            hs, ws = -(-H // CONS_SAMPLE), -(-W // CONS_SAMPLE)
            o = 21
            codes = vec[o:o + F].astype(np.int32); o += F
            good = int(vec[o]); o += 1
            m2m_T = vec[o:o + 16].reshape(4, 4); o += 16
            m2m_err, m2m_cnt = vec[o], vec[o + 1]; o += 2
            m2m_A = vec[o:o + 36].reshape(6, 6); o += 36
            inact_px = int(vec[o]); o += 1
            cons_pv = vec[o:o + 3 * hs * ws].reshape(3, hs, ws); o += 3 * hs * ws
            cons_ot = vec[o:o + hs * ws].reshape(hs, ws); o += hs * ws
            add_min, best_id, best_d, block_hd = vec[o:o + 4]
            self._close_loops(
                rec, float(best_id), float(best_d), float(block_hd),
                codes, good,
                m2m_T, float(m2m_err), float(m2m_cnt),
                m2m_A, inact_px,
                cons_pv, cons_ot,
            )
            # Ferns::addFrame at end of frame (cpp:601-604), not while lost
            if not rec["lost_at_dispatch"] and not self.lost:
                self.ferns.add_frame_scored(
                    float(add_min), np.asarray(codes), int(good),
                    out["views"], self.T_wc, rec["tick"],
                )
        # frames finish in dispatch order: fixes fully behind us are drained
        self._pose_fixes = [e for e in self._pose_fixes if rec["seq"] < e[1]]

    def _reloc_update(self, tracking_ok: bool, was_recovery: bool) -> bool:
        """Relocalization state machine (ElasticFusion.cpp:326-365); the
        per-frame gates were already evaluated on-device.  `was_recovery` is
        the per-frame flag captured at dispatch time (the frame right after a
        fern teleport): one further well-conditioned frame confirms recovery
        (cpp:348-364)."""
        if not self.lost:
            if not tracking_ok:
                self.tracking_count += 1
                if self.tracking_count > 10:
                    self.lost = True
                return False
            self.tracking_count = 0
            return True
        if was_recovery and tracking_ok:
            self.lost = False
            self.tracking_count = 0
        return tracking_ok

    def _fixed_pose(self, rec, T: np.ndarray) -> np.ndarray:
        """Apply (in closure order) every outstanding pose fix whose in-flight
        window contains this frame's dispatch seq.  No pruning here — a frame
        may need the same fixes for several device poses (its own + the m2m
        estimate); `_finish` prunes once the frame is fully processed."""
        seq = rec["seq"]
        for cs, us, fix in self._pose_fixes:
            if cs < seq <= us:
                T = fix @ T
        return np_orthonormalize(T)

    # -- loop closures ---------------------------------------------------------

    def _close_loops(self, rec, best_id, best_d, block_hd, codes, good,
                     m2m_T, m2m_err, m2m_cnt,
                     m2m_A, inact_px, cons_pv, cons_ot) -> None:
        """Global (fern) + local (model-to-model) loop closure decisions
        (ElasticFusion.cpp:391-534), running on the finished frame's small
        outputs; acceptance dispatches `_apply_closure` on the latest device
        state."""
        cfg = self.cfg
        sw = self.stopwatch

        # --- global: fern retrieval, scored on-device (cpp:394-404) ---
        sw.tick("Ferns::findFrame")
        recovery, constraints = self.ferns.find_frame_scored(
            int(best_id), best_d, block_hd, codes, good,
            rec["out"]["views"], self.T_wc, rec["tick"],
            rec["lost_at_dispatch"],
        )
        sw.tock("Ferns::findFrame")

        if self.ferns.last_closest != -1:
            if rec["lost_at_dispatch"]:
                # teleport relocalization (cpp:411-413)
                T_rec = np_orthonormalize(np.asarray(recovery, np.float64))
                self._teleport(rec, T_rec)
                return
            gd = self.global_deformation
            fern_time = self.ferns.closest_src_time()
            for c in constraints:
                gd.add_constraint(
                    c.source_point, c.target_point, rec["tick"], fern_time,
                    pin=True,
                )
            for rc in self.relative_cons:
                gd.constraints.append(rc)
            fern_poses = [(f.src_time, f.T_wc) for f in self.ferns.frames]
            ok, new_fern_poses, new_hist, _ = gd.constrain(
                fern_poses, rec["tick"], fern_match=True,
                pose_history=self.tick_poses, relax_graph=True,
            )
            if ok:
                T_rec = np_orthonormalize(np.asarray(recovery, np.float64))
                for f, (_, T) in zip(self.ferns.frames, new_fern_poses):
                    f.T_wc = T
                self.tick_poses = new_hist
                self.fern_deforms += 1
                self._dispatch_closure(rec, T_rec, gd.graph, fern_accepted=True)
                return

        # --- local: active-to-inactive model alignment (cpp:447-534) ---
        if rec["lost_at_dispatch"] or inact_px < 1:
            return
        if not _covariance_ok(m2m_A, cfg.cov_threshold):
            return
        if not (m2m_cnt > cfg.icp_count_threshold
                and m2m_err < cfg.icp_error_threshold):
            return
        # m2m_T was computed on-device at dispatch time: bring it into the
        # corrected frame exactly like the frame's own pose
        T_est = self._fixed_pose(rec, np.asarray(m2m_T, np.float64))

        # constraints from consSample-subsampled pixels (cpp:485-511)
        pv = cons_pv
        ot = cons_ot
        z_ok = (pv[2] > 0) & (pv[2] < cfg.max_depth_processed) & (ot > 0)
        ld = self.local_deformation
        pin = ld.deforms == 0
        srcs = self.T_wc[:3, :3] @ pv.reshape(3, -1) + self.T_wc[:3, 3:4]
        tgts = T_est[:3, :3] @ pv.reshape(3, -1) + T_est[:3, 3:4]
        flat_ok = z_ok.reshape(-1)
        flat_ot = ot.reshape(-1)
        for i in np.nonzero(flat_ok)[0]:
            ld.add_constraint(
                srcs[:, i], tgts[:, i], rec["tick"], int(flat_ot[i]), pin=pin
            )
        if not ld.constraints:
            return

        fern_poses = [(f.src_time, f.T_wc) for f in self.ferns.frames]
        ok, new_fern_poses, _, new_rel = ld.constrain(
            fern_poses, rec["tick"], fern_match=False,
            pose_history=self.tick_poses, relax_graph=False,
            collect_relative=True,
        )
        if ok:
            for f, (_, T) in zip(self.ferns.frames, new_fern_poses):
                f.T_wc = T
            self.deforms += 1
            self._dispatch_closure(rec, T_est, ld.graph, fern_accepted=False)
            # carry forward a third of the new relative constraints (cpp:529-531)
            if new_rel:
                step = max(len(new_rel) // 3, 1)
                self.relative_cons.extend(new_rel[::step])

    def _dispatch_closure(self, rec, T_target: np.ndarray, graph,
                          fern_accepted: bool) -> None:
        """Apply an accepted closure: rigid pose correction T_fix (world-frame
        left-multiply, taking the closure frame's pose to its corrected one)
        plus map deformation, via the `_apply_closure` program on the LATEST
        carried device state."""
        cfg = self.cfg
        T_fix = T_target @ np.linalg.inv(self.T_wc)
        self.T_wc = np_orthonormalize(T_target)
        # the closure frame's own logged pose becomes the corrected one
        # (currPose = estPose before the pose log, ElasticFusion.cpp:534+588)
        if self.tick_poses and self.tick_poses[-1][0] == rec["tick"]:
            self.tick_poses[-1] = (rec["tick"], self.T_wc.copy())
        # frames still in flight were dispatched at pre-correction poses and
        # get the same rigid fix when they finish; frames dispatched from now
        # on carry the corrected _T_dev (no fix — see _pose_fixes)
        if self._inflight:
            self._pose_fixes.append(
                (rec["seq"], self._inflight[-1]["seq"], T_fix.copy())
            )

        depth_d, rgb_d = self._last_frame_dev
        tick_now = self._rep(jnp.float32(max(self.tick - 1, rec["tick"])))
        max_time = tick_now
        ff, fr = self._fern_tables()
        graph = jax.tree.map(self._rep, graph)
        closure_fn = (
            _apply_closure_sharded if self.mesh is not None else _apply_closure
        )
        out = closure_fn(
            self.map, graph,
            self._rep(jnp.asarray(T_fix, jnp.float32)),
            self._rep(jnp.float32(rec["tick"])),
            self._T_dev, tick_now, max_time, self._rep(jnp.bool_(self.lost)),
            depth_d, rgb_d, ff, fr, cfg, fern_accepted,
        )
        self.map = out["map"]
        self._T_dev = out["T"]
        self._pred = out["pred"]
        self._fill = out["fill"]
        self._dense_dev = out["dense"]
        self._views = out["views"]
        self._codes, self._good = out["codes"], out["good"]

    def _teleport(self, rec, T_rec: np.ndarray) -> None:
        """Lost-mode fern relocalization: jump the carried pose to the
        recovery pose and regenerate the carried prediction there
        (ElasticFusion.cpp:411-413); confirmation happens over the next
        well-conditioned frame (cpp:348-364)."""
        fix = T_rec @ np.linalg.inv(self.T_wc)
        if self._inflight:
            self._pose_fixes.append(
                (rec["seq"], self._inflight[-1]["seq"], fix)
            )
        self.T_wc = T_rec
        self.last_frame_recovery = True
        self._pred = None  # force carried-state regeneration at the new pose
        depth_d, rgb_d = self._last_frame_dev
        self._regenerate_carried(depth_d, rgb_d)

    # -- outputs -------------------------------------------------------------

    def save_trajectory(self, path, iclnuim: bool = False) -> None:
        from .io.trajectory import write_freiburg

        self.flush()
        write_freiburg(path, self.poses, iclnuim=iclnuim)

    def export_map(self) -> Optional[SurfelMap]:
        """The map as ONE single-device-layout SurfelMap (scalar count):
        sharded sub-maps are gathered shard-by-shard (exports, checkpoints)."""
        self.flush()
        if self.map is None or getattr(self.map.count, "ndim", 0) == 0:
            return self.map
        from .parallel.shard_step import gather_shard_map

        return gather_shard_map(self.map, self.mesh)

    def save_ply(self, path) -> int:
        from .io.ply import save_ply

        return save_ply(path, self.export_map(), self.cfg.confidence_threshold)


def _np_se3_log_norm(T: np.ndarray) -> float:
    """|log SE3| used by the fusion weight (Sophus log norm) — host variant
    for the external-pose path."""
    R = T[:3, :3]
    cos_t = np.clip((np.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    theta = float(np.arccos(cos_t))
    if theta < 1e-8:
        w = np.zeros(3)
        V_inv = np.eye(3)
    else:
        w = (
            theta
            / (2.0 * np.sin(theta))
            * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        )
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]) / theta
        half = theta * 0.5
        cot = half / np.tan(half)
        V_inv = np.eye(3) - 0.5 * theta * K + (1.0 - cot) * (K @ K)
    v = V_inv @ T[:3, 3]
    return float(np.sqrt(np.dot(v, v) + np.dot(w, w)))


def _covariance_ok(A: np.ndarray, thresh: float = 1e-4) -> bool:
    """Covariance gate: diag of A^-1 all below thresh (cpp:330-344)."""
    try:
        cov = np.linalg.inv(A)
    except np.linalg.LinAlgError:
        return False
    return bool((np.diag(cov) < thresh).all())
