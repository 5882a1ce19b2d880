"""Engine facade — the TPU-native `ElasticFusion` class
(/root/reference/Core/ElasticFusion.{h,cpp}).

`process_frame` mirrors the reference pipeline (ElasticFusion.cpp:270-607,
SURVEY.md §3.1): preprocess -> frame-to-model tracking -> predict ->
[loop closures] -> fuse -> clean -> sample graph -> predict.  The host side
is a thin Python orchestrator (the idiomatic TPU analog of the reference's
C++ driving CUDA/GL); all per-frame compute runs in a handful of jitted
device programs with `tick`/pose passed as traced values so nothing
recompiles after frame 2.

Loop closure subsystems (ferns / deformation) plug in via closeLoops —
see ferns.py and deformation.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig
from .ops.fillin import fill_all
from .ops.fuse import clean, fuse
from .ops.preprocess import bilateral_filter, metricise_depth, pyr_down_intensity, rgb_to_intensity
from .ops.splat import Prediction, combined_predict, predict_indices, synthesize_depth
from .se3 import np_orthonormalize
from .surfels import SurfelMap, init_map_from_frame
from .tracking import (
    OdometryInputs,
    build_current_frame_pyramids,
    build_model_pyramids,
    get_incremental_transformation,
)
from .utils.stopwatch import Stopwatch


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
    in the smallest power-of-two arrays that fit (SURVEY.md §7 'capacity
    buckets'), growing toward cfg.max_surfels.  Each growth recompiles the
    jitted steps once for the new shape."""
    b = 1 << 16
    while b < n:
        b <<= 1
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


@functools.partial(jax.jit, static_argnames=("cfg",))
def _predict(m: SurfelMap, T_wc, tick, max_time, depth_filt_m, rgb, lost, cfg: EngineConfig):
    """predict() (ElasticFusion.cpp:621-653): ACTIVE combinedPredict + the
    three fill-in passes + the denseEnough statistic (cpp:256-268)."""
    pred = combined_predict(
        m, T_wc, cfg.camera, tick, max_time, cfg.time_delta,
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
def _predict_view(m: SurfelMap, T_wc, time, max_time, cfg: EngineConfig):
    """Bare combinedPredict at explicit (time, maxTime) — used for the
    INACTIVE model half (ElasticFusion.cpp:450-459)."""
    return combined_predict(
        m, T_wc, cfg.camera, time, max_time, cfg.time_delta,
        cfg.confidence_threshold, cfg.max_depth_processed,
    )


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


@functools.partial(jax.jit, static_argnames=("cfg", "fern_accepted"))
def _fuse_and_clean_deformed(
    m: SurfelMap, T_wc, tick, rgb, depth_raw_m, depth_filt_m, weighting,
    graph, fern_accepted: bool, cfg: EngineConfig,
):
    """The fuse/clean path of a deformation tick: synthesize old-model depth
    for timestamp refresh, apply the graph to every surfel inside clean
    (ElasticFusion.cpp:554-585)."""
    from .deformation import apply_graph_to_surfels

    cam = cfg.camera
    pred = predict_indices(m, T_wc, cam, tick, cfg.time_delta, cfg.max_depth_processed)
    m2, stats = fuse(
        m, pred, T_wc, tick, rgb, depth_raw_m, depth_filt_m, cam,
        cfg.max_depth_processed, weighting,
    )
    pred2 = predict_indices(m2, T_wc, cam, tick, cfg.time_delta, cfg.max_depth_processed)
    depth_synth = None
    if not fern_accepted:
        # time=tick, maxTime=tick-timeDelta, timeDelta=uint16-max (cpp:561-569)
        depth_synth = synthesize_depth(
            m2, T_wc, cam, tick, tick - cfg.time_delta, 65535,
            cfg.confidence_threshold, cfg.max_depth_processed,
        )
    deformed_pos, deformed_nrm = apply_graph_to_surfels(m2, graph)
    m3 = clean(
        m2, pred2, T_wc, tick, cam, cfg.confidence_threshold, cfg.time_delta,
        cfg.max_depth_processed, cfg.unstable_age,
        depth_synth=depth_synth, deformed=deformed_pos,
        deformed_normal=deformed_nrm, fern_accepted=fern_accepted,
    )
    return m3, stats


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fuse_and_clean(
    m: SurfelMap, T_wc, tick, rgb, depth_raw_m, depth_filt_m, weighting,
    cfg: EngineConfig,
):
    """predictIndices -> fuse -> predictIndices -> clean (cpp:536-585),
    without a deformation graph (the deformed path runs unjitted pieces in
    Deformation)."""
    cam = cfg.camera
    pred = predict_indices(
        m, T_wc, cam, tick, cfg.time_delta, cfg.max_depth_processed
    )
    m2, stats = fuse(
        m, pred, T_wc, tick, rgb, depth_raw_m, depth_filt_m, cam,
        cfg.max_depth_processed, weighting,
    )
    pred2 = predict_indices(
        m2, T_wc, cam, tick, cfg.time_delta, cfg.max_depth_processed
    )
    m3 = clean(
        m2, pred2, T_wc, tick, cam, cfg.confidence_threshold, cfg.time_delta,
        cfg.max_depth_processed, cfg.unstable_age,
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
    track -> fuse -> clean -> predict(+fill-in).  This is the multi-chip
    unit (sharded over the surfel axis via parallel/) and the minimum-
    dispatch fast path; the Engine class adds the host-side orchestration
    the jitted step can't hold (loop closures, relocalization control flow).

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
    m, stats = fuse(
        m, pred_idx, T, tick, rgb, raw_m, filt_m, cam,
        cfg.max_depth_processed, weighting,
    )
    pred_idx2 = predict_indices(m, T, cam, tick, cfg.time_delta, cfg.max_depth_processed)
    m = clean(
        m, pred_idx2, T, tick, cam, cfg.confidence_threshold, cfg.time_delta,
        cfg.max_depth_processed, cfg.unstable_age,
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
    only ~100 KB crosses to the host."""
    off = factor // 2
    return (
        img[off::factor, off::factor],
        vtx[:, off::factor, off::factor],
        nrm[:, off::factor, off::factor],
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def _frame_a(
    m: SurfelMap,
    T_prev,                       # (4,4) f32
    so3_hist,
    pred_vertex, pred_normal, pred_image,   # last predict() output
    fill_vertex, fill_normal, fill_image,   # its fill-in
    dense_prev,                   # f32 scalar: last predict's coverage
    depth_mm, rgb,
    tick, max_time,
    lost,                         # bool scalar
    cfg: EngineConfig,
):
    """First per-frame device program: preprocess -> frame-to-model tracking
    (against last prediction or its fill-in, selected on-device by the
    denseEnough test, ElasticFusion.cpp:256-268,303-315) -> ACTIVE
    combinedPredict + FillIn at the tracked pose (cpp:387) -> fern-resolution
    views.  Everything the host needs for loop closure / reloc decisions
    comes back as small arrays."""
    raw_m, filt_m = _preprocess(depth_mm, cfg)

    use_fill = (dense_prev < 0.75) | jnp.bool_(cfg.frame_to_frame_rgb)
    pv = jnp.where(use_fill, fill_vertex, pred_vertex)
    pn = jnp.where(use_fill, fill_normal, pred_normal)
    pi = jnp.where(use_fill, fill_image, pred_image)

    res, so3_cur = _track(pv, pn, pi, filt_m, rgb, so3_hist, T_prev, cfg, False)
    T = res.T_curr

    # velocity-adaptive fusion weight (cpp:371-383), on-device
    from .se3 import se3_log_norm

    T_cp = jnp.linalg.inv(T) @ T_prev
    w = jnp.minimum(
        jnp.maximum(jnp.linalg.norm(T_cp[:3, 3]), se3_log_norm(T_cp)), 0.01
    )
    weighting = jnp.maximum(1.0 - w / 0.01, 0.5)

    pred, vtx, nrm, img, dense = _predict(
        m, T, tick, max_time, filt_m, rgb, lost, cfg
    )
    fern = _decimate_views(img, vtx, nrm, cfg.fern_pyramid_factor)
    return raw_m, filt_m, res, so3_cur, weighting, pred, (vtx, nrm, img), dense, fern


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnums=(0,))
def _frame_b(
    m: SurfelMap,
    T_wc, tick, rgb, depth_raw_m, depth_filt_m, weighting, max_time,
    lost,
    cfg: EngineConfig,
):
    """Second per-frame device program: predictIndices -> fuse ->
    predictIndices -> clean (cpp:536-585), then the end-of-frame predict()
    (cpp:599) + fill-in + fern views for Ferns::addFrame and next-frame
    tracking."""
    m2, stats = _fuse_and_clean(
        m, T_wc, tick, rgb, depth_raw_m, depth_filt_m, weighting, cfg
    )
    pred, vtx, nrm, img, dense = _predict(
        m2, T_wc, tick, max_time, depth_filt_m, rgb, lost, cfg
    )
    fern = _decimate_views(img, vtx, nrm, cfg.fern_pyramid_factor)
    return m2, stats, pred, (vtx, nrm, img), dense, fern


@functools.partial(jax.jit, static_argnames=("cfg",))
def _frame_c(
    m: SurfelMap,
    new_vertex, new_normal, new_image,   # ACTIVE prediction (this frame)
    T_wc, tick,
    cfg: EngineConfig,
):
    """Local-loop-closure device program: INACTIVE combinedPredict
    (ElasticFusion.cpp:450-459) + modelToModel odometry (cpp:462-471) in one
    dispatch.  Returns the odometry result, the inactive depth-pixel count,
    and the consSample-subsampled constraint source points/time images the
    host needs (cpp:485-511)."""
    old_pred = combined_predict(
        m, T_wc, cfg.camera, jnp.float32(0.0), tick - cfg.time_delta,
        cfg.time_delta, cfg.confidence_threshold, cfg.max_depth_processed,
    )
    inactive_count = jnp.sum((old_pred.depth > 0).astype(jnp.int32))
    res = _model_to_model(
        new_vertex, new_normal, new_image,
        old_pred.vertex, old_pred.normal, old_pred.image,
        T_wc, cfg,
    )
    CONS_SAMPLE = 20
    pv = new_vertex[:, ::CONS_SAMPLE, ::CONS_SAMPLE]
    ot = old_pred.time[::CONS_SAMPLE, ::CONS_SAMPLE]
    return res, inactive_count, pv, ot


@functools.partial(jax.jit, static_argnames=("cfg",))
def _predict_only(
    m: SurfelMap, T_wc, tick, max_time, depth_filt_m, rgb, lost,
    cfg: EngineConfig,
):
    """predict() + fill-in + fern views without fusion (lost / not-fused
    frames, and post-deformation refresh)."""
    pred, vtx, nrm, img, dense = _predict(
        m, T_wc, tick, max_time, depth_filt_m, rgb, lost, cfg
    )
    fern = _decimate_views(img, vtx, nrm, cfg.fern_pyramid_factor)
    return pred, (vtx, nrm, img), dense, fern


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
        return 0 if self.count_dev is None else int(self.count_dev)


class Engine:
    """TPU-native dense RGB-D SLAM engine with the ElasticFusion surface
    (construct, process_frame per frame, save_ply / save_trajectory)."""

    def __init__(self, cfg: EngineConfig = EngineConfig()):
        self.cfg = cfg
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
        # per-frame carried device state
        self._so3_hist = None       # prev frame coarsest intensity
        self._pred = None           # Prediction from end-of-last-frame predict()
        self._fill = None           # (vertex, normal, image) fill-in maps
        self._dense_dev = None      # f32 scalar device: last predict coverage
        self._fern_views = None     # decimated (img, vtx, nrm) of last predict
        self._count_est = 0         # host upper bound on map.count
        self._last_icp_error = 0.0
        self._last_icp_count = 0.0
        # loop-closure subsystems (ferns.py / deformation.py)
        self.ferns = None
        self.local_deformation = None
        self.global_deformation = None
        self.relative_cons: list = []
        self._pending_graph = None    # GraphState to apply in this tick's clean
        self._fern_accepted = False
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
        return 0 if self.map is None else int(self.map.count)

    @property
    def poses(self) -> List[Tuple[int, np.ndarray]]:
        """Timestamped (possibly deformation-corrected) trajectory."""
        return [
            (ts, T) for ts, (_, T) in zip(self.pose_times, self.tick_poses)
        ]

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
        # "Preprocess" now spans the host->device frame upload; the bilateral
        # filter + metricisation run inside the fused per-frame programs
        sw.tick("Preprocess")
        rgb_d = jnp.asarray(rgb)
        depth_d = jnp.asarray(depth_mm)
        sw.tock("Preprocess")

        fused = False
        tracking_ok = True
        raw_m = filt_m = None

        if self.tick == 1:
            raw_m, filt_m = _preprocess(depth_d, cfg)
            n_px = cfg.camera.width * cfg.camera.height
            # initial bucket: first frame fills at most n_px slots and every
            # per-surfel op costs O(capacity) — start tight, grow on demand
            cap0 = _next_bucket(n_px + n_px // 4, cfg.max_surfels)
            self.map = _init_map(raw_m, filt_m, rgb_d, cfg, cap0)
            self._count_est = cfg.camera.width * cfg.camera.height
            self._so3_hist = _coarse_intensity(rgb_d, cfg)  # initFirstRGB
            if in_T_wc is not None:
                self.T_wc = np.asarray(in_T_wc, np.float64)
            (self._pred, self._fill, self._dense_dev,
             self._fern_views) = _predict_only(
                self.map, jnp.asarray(self.T_wc, jnp.float32),
                jnp.float32(1.0), jnp.float32(1.0), filt_m, rgb_d,
                jnp.bool_(False), cfg,
            )
        else:
            T_prev = self.T_wc.copy()
            tick_dev = jnp.float32(self.tick)
            max_time = (
                jnp.float32(0.0) if self.last_frame_recovery else tick_dev
            )
            weighting_dev = jnp.float32(1.0)

            # after a checkpoint restore there is no carried prediction yet:
            # regenerate it from the restored map at the restored pose
            if self._pred is None:
                raw_m, filt_m = _preprocess(depth_d, cfg)
                self._run_predict(
                    jnp.asarray(self.T_wc, jnp.float32), tick_dev,
                    filt_m, rgb_d,
                )
            if self._so3_hist is None:
                self._so3_hist = _coarse_intensity(rgb_d, cfg)

            if in_T_wc is None:
                # program A: preprocess + track + predict@tracked-pose + fern
                # views, one dispatch (cpp:278-402)
                sw.tick("odom")
                (raw_m, filt_m, res, so3_cur, weighting_dev, pred, fill,
                 dense, fern_views) = _frame_a(
                    self.map,
                    jnp.asarray(self.T_wc, jnp.float32), self._so3_hist,
                    self._pred.vertex, self._pred.normal, self._pred.image,
                    self._fill[0], self._fill[1], self._fill[2],
                    self._dense_dev, depth_d, rgb_d,
                    tick_dev, max_time, jnp.bool_(self.lost), cfg,
                )
                sw.tock("odom")
                self._pred = pred
                self._fill = fill
                self._dense_dev = dense
                self._fern_views = fern_views
                self._so3_hist = so3_cur
                # one batched device->host read for all per-frame scalars
                T_np, err_np, cnt_np = jax.device_get(
                    (res.T_curr, res.icp_error, res.icp_count)
                )
                self.T_wc = np_orthonormalize(np.asarray(T_np, np.float64))
                self._last_icp_error = float(err_np)
                self._last_icp_count = float(cnt_np)

                tracking_ok = (not cfg.reloc_mode) or self._last_icp_error < 1e-4
                if cfg.reloc_mode:
                    tracking_ok = self._reloc_update(res, tracking_ok)
            else:
                raw_m, filt_m = _preprocess(depth_d, cfg)
                self.T_wc = np.asarray(in_T_wc, np.float64)
                self._so3_hist = _coarse_intensity(rgb_d, cfg)
                # velocity-adaptive fusion weight on host (cpp:371-383)
                T_cp = np.linalg.inv(self.T_wc) @ T_prev
                w = min(
                    max(float(np.linalg.norm(T_cp[:3, 3])), _se3_log_norm(T_cp)),
                    0.01,
                )
                weighting_dev = jnp.float32(max(1.0 - w / 0.01, 0.5))
                self._run_predict(
                    jnp.asarray(self.T_wc, jnp.float32), tick_dev, filt_m, rgb_d
                )

            weighting = weighting_dev * jnp.float32(weight_multiplier)
            T_dev = jnp.asarray(self.T_wc, jnp.float32)

            # --- loop closures (ferns / local deformation) ---
            if cfg.closeLoops and self.ferns is not None:
                self._close_loops(T_dev, filt_m, rgb_d)
                T_dev = jnp.asarray(self.T_wc, jnp.float32)

            if (not cfg.rgb_only) and tracking_ok and not self.lost:
                sw.tick("Fuse")
                if self._pending_graph is not None:
                    self.map, stats = _fuse_and_clean_deformed(
                        self.map, T_dev, tick_dev, rgb_d, raw_m, filt_m,
                        weighting, self._pending_graph,
                        self._fern_accepted, cfg,
                    )
                    (self._pred, self._fill, self._dense_dev,
                     self._fern_views) = _predict_only(
                        self.map, T_dev, tick_dev, max_time, filt_m, rgb_d,
                        jnp.bool_(self.lost), cfg,
                    )
                else:
                    # program B: fuse/clean + end-of-frame predict (cpp:536-599)
                    (self.map, stats, self._pred, self._fill, self._dense_dev,
                     self._fern_views) = _frame_b(
                        self.map, T_dev, tick_dev, rgb_d, raw_m, filt_m,
                        weighting, max_time, jnp.bool_(self.lost), cfg,
                    )
                sw.tock("Fuse")
                fused = True
                # grow to the next capacity bucket before it can overflow.
                # `int(count)` would synchronize every frame, so track a
                # host-side UPPER BOUND (fuse appends at most n_px/4, clean
                # only removes) and read the real count only when the bound
                # crosses the threshold.
                cap = self.map.capacity
                if self._count_est == 0:   # e.g. after checkpoint restore
                    self._count_est = int(self.map.count)
                self._count_est += (cfg.camera.width * cfg.camera.height) // 4
                if cap < cfg.max_surfels and self._count_est > 0.70 * cap:
                    self._count_est = int(self.map.count)
                    if self._count_est > 0.70 * cap:
                        self.map = _grow_map(
                            self.map, _next_bucket(2 * cap, cfg.max_surfels)
                        )
            else:
                # end-of-frame predict without fusion (lost / gated frames)
                (self._pred, self._fill, self._dense_dev,
                 self._fern_views) = _predict_only(
                    self.map, T_dev, tick_dev, max_time, filt_m, rgb_d,
                    jnp.bool_(self.lost), cfg,
                )
        self._pending_graph = None

        self.tick_poses.append((self.tick, self.T_wc.copy()))
        self.pose_times.append(int(timestamp))

        # sample deformation graph nodes from the map (cpp:591-597)
        if self.local_deformation is not None:
            sw.tick("sampleGraph")
            self.local_deformation.sample_graph_model(self.map)
            if self.global_deformation is not None:
                self.global_deformation.sample_graph_from(self.local_deformation)
            sw.tock("sampleGraph")

        if not self.lost:
            if self.ferns is not None and self.tick > 1:
                sw.tick("Ferns::addFrame")
                img_s, vtx_s, nrm_s = self._fern_views
                self.ferns.add_frame(img_s, vtx_s, nrm_s, self.T_wc, self.tick)
                sw.tock("Ferns::addFrame")
            self.tick += 1
        sw.tock("Run")

        return FrameResult(
            T_wc=self.T_wc.copy(),
            tracking_ok=tracking_ok,
            lost=self.lost,
            icp_error=self._last_icp_error,
            icp_count=self._last_icp_count,
            fused=fused,
            count_dev=None if self.map is None else self.map.count,
        )

    # -- internals -----------------------------------------------------------

    def _run_predict(self, T_dev, tick_dev, filt_m, rgb_d):
        cfg = self.cfg
        max_time = jnp.float32(0.0) if self.last_frame_recovery else tick_dev
        (self._pred, self._fill, self._dense_dev,
         self._fern_views) = _predict_only(
            self.map, T_dev, tick_dev, max_time, filt_m, rgb_d,
            jnp.bool_(self.lost), cfg,
        )

    def _reloc_update(self, res, tracking_ok: bool) -> bool:
        """Relocalization state machine (ElasticFusion.cpp:326-365)."""
        cov_ok = _covariance_ok(np.asarray(res.A, np.float64))
        if not self.lost:
            if not (tracking_ok and cov_ok):
                self.tracking_count += 1
                if self.tracking_count > 10:
                    self.lost = True
                return False
            self.tracking_count = 0
            return True
        if self.last_frame_recovery:
            if tracking_ok and cov_ok:
                self.lost = False
                self.tracking_count = 0
            self.last_frame_recovery = False
        return tracking_ok and cov_ok

    def _close_loops(self, T_dev, filt_m, rgb_d):
        """Global (fern) + local (model-to-model) loop closure
        (ElasticFusion.cpp:391-534)."""
        from .ferns import SurfaceConstraint

        cfg = self.cfg
        sw = self.stopwatch
        self._pending_graph = None
        self._fern_accepted = False
        self.last_frame_recovery = False
        img_s, vtx_s, nrm_s = self._fern_views

        # --- global: fern retrieval (cpp:394-404) ---
        sw.tick("Ferns::findFrame")
        recovery, constraints = self.ferns.find_frame(
            img_s, vtx_s, nrm_s, self.T_wc, self.tick, self.lost
        )
        sw.tock("Ferns::findFrame")

        if self.ferns.last_closest != -1:
            if self.lost:
                # teleport relocalization (cpp:411-413)
                self.T_wc = np_orthonormalize(np.asarray(recovery, np.float64))
                self.last_frame_recovery = True
                return
            gd = self.global_deformation
            fern_time = self.ferns.frames[self.ferns.last_closest].src_time
            for c in constraints:
                gd.add_constraint(
                    c.source_point, c.target_point, self.tick, fern_time, pin=True
                )
            for rc in self.relative_cons:
                gd.constraints.append(rc)
            fern_poses = [(f.src_time, f.T_wc) for f in self.ferns.frames]
            ok, new_fern_poses, new_hist, _ = gd.constrain(
                fern_poses, self.tick, fern_match=True,
                pose_history=self.tick_poses, relax_graph=True,
            )
            if ok:
                self.T_wc = np_orthonormalize(np.asarray(recovery, np.float64))
                for f, (_, T) in zip(self.ferns.frames, new_fern_poses):
                    f.T_wc = T
                self.tick_poses = new_hist
                self.fern_deforms += 1
                self._pending_graph = gd.graph
                self._fern_accepted = True
                return

        # --- local: active-to-inactive model alignment (cpp:447-534) ---
        if self.lost or self._pred is None:
            return
        # the INACTIVE half (last seen more than timeDelta ticks ago) is
        # necessarily empty until the run is older than the window
        if self.tick <= cfg.time_delta:
            return
        sw.tick("IndexMap::INACTIVE")
        res, inactive_count, pv_d, ot_d = _frame_c(
            self.map,
            self._pred.vertex, self._pred.normal, self._pred.image,
            jnp.asarray(self.T_wc, jnp.float32), jnp.float32(self.tick), cfg,
        )
        sw.tock("IndexMap::INACTIVE")
        if int(inactive_count) < 1:
            return
        if not _covariance_ok(np.asarray(res.A, np.float64), cfg.cov_threshold):
            return
        if not (float(res.icp_count) > cfg.icp_count_threshold
                and float(res.icp_error) < cfg.icp_error_threshold):
            return
        T_est = np_orthonormalize(np.asarray(res.T_curr, np.float64))

        # constraints from consSample=20 subsampled pixels (cpp:485-511)
        pv = np.asarray(pv_d)
        ot = np.asarray(ot_d)
        z_ok = (pv[2] > 0) & (pv[2] < cfg.max_depth_processed) & (ot > 0)
        ld = self.local_deformation
        pin = ld.deforms == 0
        srcs = (self.T_wc[:3, :3] @ pv.reshape(3, -1) + self.T_wc[:3, 3:4])
        tgts = (T_est[:3, :3] @ pv.reshape(3, -1) + T_est[:3, 3:4])
        flat_ok = z_ok.reshape(-1)
        flat_ot = ot.reshape(-1)
        for i in np.nonzero(flat_ok)[0]:
            ld.add_constraint(
                srcs[:, i], tgts[:, i], self.tick, int(flat_ot[i]), pin=pin
            )
        if not ld.constraints:
            return

        fern_poses = [(f.src_time, f.T_wc) for f in self.ferns.frames]
        ok, new_fern_poses, _, new_rel = ld.constrain(
            fern_poses, self.tick, fern_match=False,
            pose_history=self.tick_poses, relax_graph=False,
            collect_relative=True,
        )
        if ok:
            for f, (_, T) in zip(self.ferns.frames, new_fern_poses):
                f.T_wc = T
            self.T_wc = T_est
            self.deforms += 1
            self._pending_graph = ld.graph
            # carry forward a third of the new relative constraints (cpp:529-531)
            if new_rel:
                step = max(len(new_rel) // 3, 1)
                self.relative_cons.extend(new_rel[::step])

    # -- outputs -------------------------------------------------------------

    def save_trajectory(self, path, iclnuim: bool = False) -> None:
        from .io.trajectory import write_freiburg

        write_freiburg(path, self.poses, iclnuim=iclnuim)

    def save_ply(self, path) -> int:
        from .io.ply import save_ply

        return save_ply(path, self.map, self.cfg.confidence_threshold)


def _se3_log_norm(T: np.ndarray) -> float:
    """|log SE3| used by the fusion weight (Sophus log norm)."""
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
