"""Frame-to-model RGB-D odometry — the TPU equivalent of
`RGBDOdometry::getIncrementalTransformation` (/root/reference/Core/Utils/
RGBDOdometry.cpp:259-571).

The whole pyramid Gauss-Newton (SO3 pre-align → 3-level coarse-to-fine
ICP+RGB) runs inside ONE jitted function: per-iteration 6×6 normal equations
are built by MXU matmuls (ops/odometry.py) and solved on-device, eliminating
the reference's per-iteration 29-float GPU→CPU download (reduce.cu:385-400).

Level iteration counts are static ({10,5,4}, RGBDOdometry.cpp:371-373) so the
loops unroll/fori cleanly under XLA; data-dependent early exits (SO3
divergence guard cpp:344, rgbOnly error check cpp:448-451) are carried as
boolean freeze flags."""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import CameraConfig, EngineConfig
from .ops.odometry import (
    Gram,
    compute_rgb_residual,
    icp_prev_table,
    icp_step,
    project_to_point_cloud,
    rgb_cloud_table,
    rgb_last_table,
    rgb_static_gates,
    rgb_step,
    so3_neighborhood_table,
    so3_step,
    solve_3x3,
    solve_6x6,
)
from .ops.preprocess import (
    SOBEL_SCALE,
    compute_derivatives,
    compute_nmap,
    compute_vmap,
    pyr_down_depth,
    pyr_down_gauss,
    pyr_down_intensity,
    resize_nmap,
    resize_vmap,
    rgb_to_intensity,
    vertices_to_depth,
)
from .se3 import apply_update, invert, orthonormalize, so3_exp


class OdometryInputs(NamedTuple):
    """Everything `getIncrementalTransformation` reads.  All tuples are
    per-pyramid-level (level 0 = full resolution)."""

    vmaps_curr: Tuple[jax.Array, ...]    # (3,H,W) camera frame
    nmaps_curr: Tuple[jax.Array, ...]
    vmaps_prev_g: Tuple[jax.Array, ...]  # (3,H,W) WORLD frame (model pred.)
    nmaps_prev_g: Tuple[jax.Array, ...]
    last_images: Tuple[jax.Array, ...]   # (H,W) f32 intensity (model pred.)
    next_images: Tuple[jax.Array, ...]   # (H,W) f32 intensity (current)
    last_depths: Tuple[jax.Array, ...]   # (H,W) f32 m
    next_depths: Tuple[jax.Array, ...]
    so3_last_image: jax.Array            # prev frame intensity at coarsest lvl
    T_prev: jax.Array                    # (4,4) f32 world←camera


class TrackingResult(NamedTuple):
    T_curr: jax.Array          # (4,4)
    icp_error: jax.Array       # sqrt(Σr²)/inliers  (lastICPError)
    icp_count: jax.Array
    rgb_error: jax.Array
    rgb_count: jax.Array
    so3_error: jax.Array
    so3_count: jax.Array
    A: jax.Array               # (6,6) last combined normal matrix (lastA)
    b: jax.Array


def _K_mats(cam: CameraConfig, level: int):
    c = cam.scaled(level)
    K = jnp.array(
        [[c.fx, 0.0, c.cx], [0.0, c.fy, c.cy], [0.0, 0.0, 1.0]], jnp.float32
    )
    Kinv = jnp.array(
        [
            [1.0 / c.fx, 0.0, -c.cx / c.fx],
            [0.0, 1.0 / c.fy, -c.cy / c.fy],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    return K, Kinv


def _rigid_inverse(T: jax.Array) -> jax.Array:
    return invert(T)


def _so3_prealign(
    cam: CameraConfig, last_img: jax.Array, next_img: jax.Array, iters: int
):
    """SO(3) pre-alignment loop (RGBDOdometry.cpp:284-369) with the
    convergence/divergence guards carried through a while_loop."""
    K, Kinv = _K_mats(cam, 2)
    big = jnp.float32(3.4e38 / 2)
    tables = (so3_neighborhood_table(next_img), so3_neighborhood_table(last_img))

    def cond(state):
        i, done, *_ = state
        return (~done) & (i < iters)

    def body(state):
        i, done, resultR, lastResultR, lastError, lastCount, so3e, so3c = state
        basis = K @ resultR @ Kinv
        krlr = K @ resultR
        G = so3_step(last_img, next_img, basis, Kinv, krlr, tables=tables)
        count = jnp.maximum(G.count, 1.0)
        err = jnp.sqrt(G.sum_sq) / count

        converged = (err < lastError) & (lastCount == G.count)
        diverged = err > lastError + 0.001

        delta = solve_3x3(G.A, G.b)
        newR = so3_exp(delta) @ resultR

        resultR_next = jnp.where(
            diverged, lastResultR, jnp.where(converged, resultR, newR)
        )
        so3e_next = jnp.where(diverged, lastError, err)
        so3c_next = jnp.where(diverged, lastCount, G.count)
        done_next = converged | diverged
        return (
            i + 1,
            done_next,
            resultR_next,
            resultR,
            jnp.where(done_next, lastError, err),
            jnp.where(done_next, lastCount, G.count),
            so3e_next,
            so3c_next,
        )

    init = (
        jnp.int32(0),
        jnp.bool_(False),
        jnp.eye(3, dtype=jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
        big,
        big,
        jnp.float32(0.0),
        jnp.float32(0.0),
    )
    _, _, resultR, _, _, _, so3e, so3c = jax.lax.while_loop(cond, body, init)
    return resultR, so3e, so3c


@functools.partial(
    jax.jit, static_argnames=("cfg",)
)
def get_incremental_transformation(
    inputs: OdometryInputs, cfg: EngineConfig
) -> TrackingResult:
    """One full tracking solve.  Mirrors RGBDOdometry.cpp:259-571; see module
    docstring for the structural differences."""
    cam = cfg.camera
    icp_on = (not cfg.rgb_only) and cfg.icp_weight > 0
    rgb_on = cfg.rgb_only or cfg.icp_weight < 100

    T_prev = inputs.T_prev
    Rprev = T_prev[:3, :3]
    tprev = T_prev[:3, 3]

    n_lvls = cfg.num_pyramid_levels
    if rgb_on:
        derivs = [compute_derivatives(img) for img in inputs.next_images]
    else:
        derivs = [(jnp.zeros_like(img), jnp.zeros_like(img)) for img in inputs.next_images]

    # --- SO(3) pre-alignment at the coarsest level (cpp:284-369) ---
    if cfg.so3:
        resultR, so3e, so3c = _so3_prealign(
            cam, inputs.so3_last_image, inputs.next_images[2], cfg.so3_iterations
        )
    else:
        resultR = jnp.eye(3, dtype=jnp.float32)
        so3e = jnp.float32(0.0)
        so3c = jnp.float32(0.0)

    resultRt = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(resultR)

    iters = list(cfg.fast_odom_iterations if cfg.fast_odom else cfg.gn_iterations)
    if not cfg.pyramid:
        iters[1] = iters[2] = 0

    zero6 = jnp.zeros((6,), jnp.float32)
    zero66 = jnp.zeros((6, 6), jnp.float32)
    carry = dict(
        resultRt=resultRt,
        Rcurr=Rprev,
        tcurr=tprev,
        icp_error=jnp.float32(0.0),
        icp_count=jnp.float32(0.0),
        rgb_error=jnp.float32(0.0),
        rgb_count=jnp.float32(0.0),
        A=zero66,
        b=zero6,
        stop=jnp.bool_(False),
    )

    for lvl in range(n_lvls - 1, -1, -1):
        if iters[lvl] == 0:
            continue
        c = cam.scaled(lvl)
        K, Kinv = _K_mats(cam, lvl)
        cloud = (
            project_to_point_cloud(inputs.last_depths[lvl], c.fx, c.fy, c.cx, c.cy)
            if rgb_on
            else None
        )
        dIdx, dIdy = derivs[lvl]
        min_grad2 = (cfg.rgb_grad_thresholds[lvl]) / (SOBEL_SCALE * SOBEL_SCALE)

        # loop-invariant packed gather tables (hoisted out of the GN body);
        # narrow gathers are ROW-count-bound on this chip (r5 measurement:
        # a 4-channel z-ray table and a 2-channel rgb table were neutral to
        # slightly negative vs these), so the tables keep their full widths
        prev_table = (
            icp_prev_table(inputs.vmaps_prev_g[lvl], inputs.nmaps_prev_g[lvl],
                           fx16=cfg.fx16_tables)
            if icp_on else None
        )
        last_table = (
            rgb_last_table(inputs.last_depths[lvl], inputs.last_images[lvl],
                           cloud)
            if rgb_on else None
        )
        cloud_table = None
        static_gates = (
            rgb_static_gates(min_grad2, dIdx, dIdy,
                             inputs.next_depths[lvl], inputs.next_images[lvl])
            if rgb_on else None
        )

        def gn_iter(_, carry, lvl=lvl, K=K, Kinv=Kinv, cloud=cloud,
                    dIdx=dIdx, dIdy=dIdy, min_grad2=min_grad2, c=c,
                    prev_table=prev_table, last_table=last_table,
                    cloud_table=cloud_table, static_gates=static_gates):
            prev = dict(carry)
            # per-level divergence reference (cpp:406: reset to FLT_MAX)
            lastRGBError = carry["rgb_err_break"]

            Rt = _rigid_inverse(carry["resultRt"])
            krkinv = K @ Rt[:3, :3] @ Kinv
            kt = K @ Rt[:3, 3]

            if rgb_on:
                corres = compute_rgb_residual(
                    min_grad2,
                    dIdx, dIdy,
                    inputs.last_depths[lvl], inputs.next_depths[lvl],
                    inputs.last_images[lvl], inputs.next_images[lvl],
                    kt, krkinv,
                    last_table=last_table, static_gates=static_gates,
                )
                sigma = corres.sigma_sum
                rgb_size = corres.count
                # reference quirk (RGBDOdometry.cpp:441): operator precedence
                # makes sigmaVal = sqrt(count) unless σ==0 or count==0
                sigma_val = jnp.sqrt(
                    jnp.where(rgb_size == 0, 0.0, jnp.where(sigma == 0, 1.0, rgb_size))
                )
                rgb_error = jnp.sqrt(sigma) / jnp.where(rgb_size == 0, 1.0, rgb_size)
                if cfg.rgb_only:
                    sigma_val = jnp.float32(-1.0)
            else:
                sigma_val = jnp.float32(0.0)
                rgb_error = jnp.float32(0.0)
                rgb_size = jnp.float32(0.0)

            # rgbOnly divergence break (cpp:448-451): REVERT to the pre-update
            # state (the update made things worse).  Distinct from the
            # convergence exits below, which keep this iteration's freshly
            # computed stats — they describe the final pose and must come
            # from the level actually reached (the reference reports the
            # last executed icpStep's residual/count, RGBDOdometry.cpp:
            # 492-493, which is always the finest level).
            revert = jnp.bool_(False)
            if cfg.rgb_only:
                revert = rgb_error > lastRGBError
            stop = carry["stop"] | revert

            T_curr = (
                jnp.eye(4, dtype=jnp.float32)
                .at[:3, :3].set(carry["Rcurr"])
                .at[:3, 3].set(carry["tcurr"])
            )

            if icp_on:
                gi = icp_step(
                    T_curr,
                    inputs.vmaps_curr[lvl], inputs.nmaps_curr[lvl],
                    T_prev,
                    inputs.vmaps_prev_g[lvl], inputs.nmaps_prev_g[lvl],
                    c.fx, c.fy, c.cx, c.cy,
                    cfg.dist_threshold, cfg.angle_threshold_sin,
                    prev_table=prev_table,
                )
                icp_error = jnp.sqrt(gi.sum_sq) / jnp.maximum(gi.count, 1.0)
                icp_count = gi.count
            else:
                gi = Gram(zero66, zero6, jnp.float32(0.0), jnp.float32(0.0))
                icp_error = jnp.float32(0.0)
                icp_count = jnp.float32(0.0)

            if rgb_on:
                gr = rgb_step(corres, sigma_val, cloud, c.fx, c.fy, dIdx, dIdy,
                              cloud_table=cloud_table, cx=c.cx, cy=c.cy)
            else:
                gr = Gram(zero66, zero6, jnp.float32(0.0), jnp.float32(0.0))

            if icp_on and rgb_on:
                w = cfg.icp_weight
                A = gr.A + (w * w) * gi.A
                b = gr.b + w * gi.b
            elif icp_on:
                A, b = gi.A, gi.b
            else:
                A, b = gr.A, gr.b

            result = solve_6x6(A, b)
            # convergence exits (the reference always runs the fixed {10,5,4}
            # budget; converged iterations are pure waste — the coarse level
            # alone measured ~25 ms of them):
            #  - update-norm: below gn_early_exit (10 um / 10 urad) further
            #    updates cannot change the result;
            #  - error-plateau: once the per-pixel residual stops changing
            #    relatively (correspondence rounding makes coarse-level
            #    updates oscillate ~1e-4 around the optimum forever, so the
            #    norm test alone never fires there)
            total_err = icp_error + rgb_error
            stop = stop | (jnp.linalg.norm(result) < cfg.gn_early_exit)
            if cfg.gn_plateau_exit > 0:
                plateau = (
                    jnp.abs(total_err - carry["prev_err"])
                    < cfg.gn_plateau_exit * jnp.maximum(total_err, 1e-12)
                )
                stop = stop | plateau

            # computeUpdateSE3 (OdometryProvider.h:73-96): left-multiply
            Rt_up = (
                jnp.eye(4, dtype=jnp.float32)
                .at[:3, :3].set(so3_exp(result[3:6]))
                .at[:3, 3].set(result[:3])
            )
            new_resultRt = Rt_up @ carry["resultRt"]
            # currentT = prevT * rgbOdom⁻¹ (cpp:553-560)
            currentT = T_prev @ _rigid_inverse(new_resultRt)

            new = dict(
                resultRt=new_resultRt,
                Rcurr=currentT[:3, :3],
                tcurr=currentT[:3, 3],
                icp_error=icp_error,
                icp_count=icp_count,
                rgb_error=rgb_error,
                rgb_count=rgb_size,
                A=A.astype(jnp.float32),
                b=b.astype(jnp.float32),
                rgb_err_break=rgb_error,
                prev_err=total_err,
                stop=stop,
            )
            # revert only on divergence; a convergence stop keeps this
            # iteration's values (stats from the level reached, and an
            # update that is below gn_early_exit anyway)
            return {
                k: jnp.where(revert, prev[k], new[k]) if k != "stop" else new[k]
                for k in new
            }

        def gn_cond(state):
            i, carry = state
            return (i < iters[lvl]) & ~carry["stop"]

        def gn_body(state):
            i, carry = state
            return i + 1, gn_iter(i, carry)

        carry = dict(carry)
        carry["stop"] = jnp.bool_(False)
        carry["rgb_err_break"] = jnp.float32(3.4e38)
        carry["prev_err"] = jnp.float32(3.4e38)
        _, carry = jax.lax.while_loop(gn_cond, gn_body, (jnp.int32(0), carry))
        carry.pop("prev_err")

    Rcurr, tcurr = carry["Rcurr"], carry["tcurr"]

    # sanity clamp — unconditional in the reference (cpp:553-558)
    bad = jnp.linalg.norm(tcurr - tprev) > cfg.translation_sanity
    Rcurr = jnp.where(bad, Rprev, Rcurr)
    tcurr = jnp.where(bad, tprev, tcurr)

    T_curr = (
        jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(Rcurr).at[:3, 3].set(tcurr)
    )
    T_curr = orthonormalize(T_curr)

    return TrackingResult(
        T_curr=T_curr,
        icp_error=carry["icp_error"],
        icp_count=carry["icp_count"],
        rgb_error=carry["rgb_error"],
        rgb_count=carry["rgb_count"],
        so3_error=so3e,
        so3_count=so3c,
        A=carry["A"],
        b=carry["b"],
    )


# ---------------------------------------------------------------------------
# Pyramid construction (initICP / initRGB equivalents)
# ---------------------------------------------------------------------------


def build_current_frame_pyramids(
    filtered_depth_m: jax.Array,
    rgb: jax.Array,
    cfg: EngineConfig,
):
    """initICP(filteredDepth)+initRGB equivalent for the CURRENT frame
    (RGBDOdometry.cpp:121-147, 240-244): depth pyramid w/ 3σ rejection,
    vmaps/nmaps per level, intensity pyramid.

    Returns (vmaps, nmaps, images, depth_pyr) tuples coarse…fine ordered
    fine→coarse (level 0 first)."""
    cam = cfg.camera
    depths = [filtered_depth_m]
    for _ in range(1, cfg.num_pyramid_levels):
        depths.append(pyr_down_depth(depths[-1]))
    vmaps = tuple(
        compute_vmap(d, cam.scaled(l), cfg.max_depth_processed)
        for l, d in enumerate(depths)
    )
    nmaps = tuple(compute_nmap(v) for v in vmaps)

    intens = [rgb_to_intensity(rgb)]
    for _ in range(1, cfg.num_pyramid_levels):
        intens.append(pyr_down_intensity(intens[-1]))
    return vmaps, nmaps, tuple(intens), tuple(depths)


def build_current_model_pyramids(
    pred_vmap: jax.Array,     # (3,H,W) predicted vertices, CAMERA frame
    pred_nmap: jax.Array,
    pred_image: jax.Array,    # (H,W,3) predicted RGB
    cfg: EngineConfig,
):
    """initICP(predictedVertices, predictedNormals) + initRGB equivalent for
    the CURRENT side of model-to-model odometry (RGBDOdometry.cpp:149-173,
    212-244): the 'current frame' is itself a map prediction, so vmaps come
    from resize (not depth pyrDown) and depths from verticesToDepth."""
    vmaps = [pred_vmap]
    nmaps = [pred_nmap]
    for _ in range(1, cfg.num_pyramid_levels):
        vmaps.append(resize_vmap(vmaps[-1]))
        nmaps.append(resize_nmap(nmaps[-1]))
    depths = [vertices_to_depth(pred_vmap)]
    for _ in range(1, cfg.num_pyramid_levels):
        depths.append(pyr_down_gauss(depths[-1]))
    intens = [rgb_to_intensity(pred_image)]
    for _ in range(1, cfg.num_pyramid_levels):
        intens.append(pyr_down_intensity(intens[-1]))
    return tuple(vmaps), tuple(nmaps), tuple(intens), tuple(depths)


def build_model_pyramids(
    pred_vmap: jax.Array,     # (3,H,W) predicted vertices, CAMERA frame
    pred_nmap: jax.Array,
    pred_image: jax.Array,    # (H,W,3) u8 predicted RGB
    T_wc: jax.Array,          # (4,4) pose used to lift prediction to world
    cfg: EngineConfig,
):
    """initICPModel + initRGBModel equivalent (RGBDOdometry.cpp:149-244):
    resize the predicted maps per level, transform to world frame, derive the
    model depth (verticesToDepth, 6 m cutoff) and intensity pyramids."""
    vmaps_c = [pred_vmap]
    nmaps_c = [pred_nmap]
    for _ in range(1, cfg.num_pyramid_levels):
        vmaps_c.append(resize_vmap(vmaps_c[-1]))
        nmaps_c.append(resize_nmap(nmaps_c[-1]))

    R = T_wc[:3, :3]
    t = T_wc[:3, 3]

    def to_world(v, n):
        valid = v[2] > 0
        C, H, W = v.shape
        vg = (R @ v.reshape(3, -1) + t[:, None]).reshape(3, H, W)
        nvalid = jnp.sum(n * n, axis=0) > 1e-12
        ng = (R @ n.reshape(3, -1)).reshape(3, H, W)
        return (
            jnp.where(valid[None], vg, 0.0),
            jnp.where(nvalid[None], ng, 0.0),
        )

    world = [to_world(v, n) for v, n in zip(vmaps_c, nmaps_c)]
    vmaps_g = tuple(w[0] for w in world)
    nmaps_g = tuple(w[1] for w in world)

    # model depth from the camera-frame prediction (maxDepthRGB=6 m cutoff)
    depths = [vertices_to_depth(pred_vmap)]
    for _ in range(1, cfg.num_pyramid_levels):
        depths.append(pyr_down_gauss(depths[-1]))

    intens = [rgb_to_intensity(pred_image)]
    for _ in range(1, cfg.num_pyramid_levels):
        intens.append(pyr_down_intensity(intens[-1]))

    return vmaps_g, nmaps_g, tuple(intens), tuple(depths)
