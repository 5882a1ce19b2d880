"""Randomized fern place recognition / global loop closure — TPU-native
equivalent of `Ferns` (/root/reference/Core/Ferns.{h,cpp}).

Behavior matched (SURVEY.md §2.6): 500 ferns at random pixels of the
8x-downsampled predicted view, 4-bit codes (r>,g>,b>,depth_mm>)
(Ferns.cpp:114-117, badCode=255 when no depth), keyframe added when minimum
dissimilarity over the DB exceeds the threshold (cpp:129-152), retrieval by
co-occurrence scoring with an age>300 gate (cpp:213-222), blockHDAware>0.3
verification (cpp:378-393), fern-resolution depth-only ICP from the keyframe
pose (cpp:241-250), and a photometric reprojection check (cpp:300-364).

TPU design differences:
  - fern generation is seeded from config (the reference seeds time(0),
    Ferns.cpp:52 — run-to-run nondeterministic; SURVEY §4.5).
  - encoding is one vectorized gather+compare; co-occurrence scoring is an
    equality matmul over the stored code matrix [frames, num] instead of an
    inverted index (SURVEY §7) — the DB itself is host-side numpy, sharded
    per host at scale.
  - the fern-resolution ICP reuses the main tracking pyramid solver with
    icpWeight=100 / no pyramid / no SO3, exactly the reference's parameters.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .config import CameraConfig, EngineConfig
from .ops.preprocess import resize_nmap, resize_vmap
from .tracking import OdometryInputs, get_incremental_transformation

BAD_CODE = 255


def fern_encode_device(img_s, vtx_s, fern_flat, fern_rgbd):
    """Device-side fern encoding (Ferns.cpp:108-127): gather the fern pixels
    from the decimated predicted view and compare against the per-fern RGBD
    thresholds.  Traced inside the per-frame program so only the ~500-byte
    code vector crosses to the host (the reference reads back whole 80x60
    images per frame, Ferns.cpp:176-178).

    img_s: [h,w,3] f32 RGB, vtx_s: [3,h,w] camera-frame vertices,
    fern_flat: [F] i32 flat pixel index (y*w+x), fern_rgbd: [F,4] f32
    thresholds (r,g,b,depth_mm).  Returns (codes i32 [F], good i32)."""
    import jax.numpy as jnp

    from .ops.gatherpack import packed_gather

    r, g, b, z = packed_gather(
        (img_s[:, :, 0], img_s[:, :, 1], img_s[:, :, 2], vtx_s[2]), fern_flat
    )
    code = (
        (r > fern_rgbd[:, 0]).astype(jnp.int32) * 8
        + (g > fern_rgbd[:, 1]).astype(jnp.int32) * 4
        + (b > fern_rgbd[:, 2]).astype(jnp.int32) * 2
        + (jnp.floor(z * 1000.0) > fern_rgbd[:, 3]).astype(jnp.int32)
    )
    valid = z > 0
    codes = jnp.where(valid, code, BAD_CODE)
    return codes, jnp.sum(valid.astype(jnp.int32))


def fern_score_device(codes, good, db_codes, db_good, db_times, db_count,
                      tick, min_age: int):
    """On-device retrieval scoring against the keyframe code DB — the whole
    per-frame host compute of Ferns::addFrame/findFrame (Ferns.cpp:108-228)
    reduced to four scalars in the frame program's batched read:

      add_min   — min dissimilarity over ALL keyframes (addFrame gate)
      best_id   — argmin dissimilarity over age-gated keyframes
      best_d    — its dissimilarity
      block_hd  — blockHDAware agreement with that keyframe (cpp:378-393)
    """
    import jax
    import jax.numpy as jnp

    F = db_codes.shape[0]
    goodf = good.astype(jnp.float32)
    co = jnp.sum(
        ((db_codes == codes[None, :]) & (codes[None, :] != BAD_CODE)
         ).astype(jnp.float32), axis=1,
    )
    max_co = jnp.minimum(goodf, db_good)
    dissim = (max_co - co) / jnp.maximum(max_co, 1.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0).squeeze(-1)
    valid = row < db_count
    add_min = jnp.min(jnp.where(valid, dissim, jnp.inf))

    old = valid & ((tick - db_times) > min_age)
    find_d = jnp.where(old, dissim, jnp.inf)
    best_id = jnp.argmin(find_d)
    best_d = find_d[best_id]
    brow = db_codes[best_id]
    both = (codes != BAD_CODE) & (brow != BAD_CODE)
    block_hd = (
        jnp.sum(((codes == brow) & both).astype(jnp.float32))
        / jnp.maximum(jnp.sum(both.astype(jnp.float32)), 1.0)
    )
    return add_min, best_id.astype(jnp.int32), best_d, block_hd


@dataclass
class FernFrame:
    """Keyframe record (Ferns.h:76-137)."""

    id: int
    codes: np.ndarray        # [num] uint8
    good_codes: int
    T_wc: np.ndarray         # 4x4
    src_time: int
    rgb: np.ndarray          # [h, w, 3] u8 (downsampled predicted view)
    verts: np.ndarray        # [3, h, w] f32 camera frame
    norms: np.ndarray        # [3, h, w] f32


@dataclass
class SurfaceConstraint:
    source_point: np.ndarray   # world, via current pose
    target_point: np.ndarray   # world, via estimated (recovery) pose


def _downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Nearest decimation at output-pixel centres (the reference's Resize
    shader samples the big texture at small-pixel centres)."""
    off = factor // 2
    if img.ndim == 3 and img.shape[0] == 3:  # [3,H,W]
        return img[:, off::factor, off::factor]
    return img[off::factor, off::factor]


def _to_small(img, verts, norms, height, width, factor):
    """Accept either full-resolution views or views already decimated on
    device (engine._decimate_views) — the latter avoids an ~8 MB/frame
    device->host transfer.  Device arrays come back in ONE batched get."""
    import jax

    if hasattr(img, "devices"):
        img, verts, norms = jax.device_get((img, verts, norms))
    img = np.asarray(img)
    if img.shape[0] != height:
        img = _downsample(img, factor)
        verts = _downsample(np.asarray(verts), factor)
        norms = _downsample(np.asarray(norms), factor)
    return (
        np.clip(img, 0, 255).astype(np.uint8),
        np.asarray(verts, np.float32),
        np.asarray(norms, np.float32),
    )


class Ferns:
    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.num = cfg.num_ferns
        self.factor = cfg.fern_pyramid_factor
        cam = cfg.camera
        self.width = cam.width // self.factor
        self.height = cam.height // self.factor
        self.max_depth_mm = int(cfg.depth_cutoff * 1000)
        # decimated pixel u_s samples full-res pixel u = factor*u_s + factor/2,
        # so the principal point shifts by half a small pixel: without this
        # the fern-res ICP association flickers and the GN oscillates
        self.fern_cam = CameraConfig(
            width=self.width, height=self.height,
            fx=cam.fx / self.factor, fy=cam.fy / self.factor,
            cx=cam.cx / self.factor - 0.5, cy=cam.cy / self.factor - 0.5,
        )
        # fern odometry config: depth-only, single level, no SO3 (Ferns.cpp:250)
        self.fern_cfg = cfg.with_(
            camera=self.fern_cam, icp_weight=100.0, pyramid=False, so3=False,
            fast_odom=False, rgb_only=False,
        )
        rng = np.random.default_rng(cfg.fern_seed)
        self.pos = np.stack(
            [rng.integers(0, self.width, self.num),
             rng.integers(0, self.height, self.num)], axis=1
        )  # [num, 2] = (x, y)
        self.rgbd = np.concatenate(
            [rng.integers(0, 256, (self.num, 3)),
             rng.integers(400, max(self.max_depth_mm, 401), (self.num, 1))],
            axis=1,
        )  # [num, 4] thresholds
        self.frames: List[FernFrame] = []
        self._code_db = np.zeros((0, self.num), np.uint8)
        self._good_db = np.zeros((0,), np.int64)
        self._time_db = np.zeros((0,), np.int64)
        self.last_closest = -1
        self._dev_tables = None
        # device-resident keyframe DB for on-device retrieval scoring
        # (replaces the reference's host inverted index, Ferns.cpp:121-152)
        self.db_capacity = cfg.max_fern_keyframes
        self._db_codes_dev = None   # [F, num] i32
        self._db_good_dev = None    # [F] f32
        self._db_time_dev = None    # [F] f32

    def device_db(self):
        """(codes [F,num] i32, good [F] f32, times [F] f32, count i32) —
        fixed-capacity device arrays for in-frame-program scoring."""
        if self._db_codes_dev is None:
            F = self.db_capacity
            self._db_codes_dev = jnp.full((F, self.num), BAD_CODE, jnp.int32)
            self._db_good_dev = jnp.zeros((F,), jnp.float32)
            # +inf time = a dead row can never pass the age>min_age gate
            self._db_time_dev = jnp.full((F,), jnp.inf, jnp.float32)
            for i, fr in enumerate(self.frames[: F]):
                self._db_codes_dev = self._db_codes_dev.at[i].set(
                    jnp.asarray(fr.codes.astype(np.int32)))
                self._db_good_dev = self._db_good_dev.at[i].set(fr.good_codes)
                self._db_time_dev = self._db_time_dev.at[i].set(fr.src_time)
        return (self._db_codes_dev, self._db_good_dev, self._db_time_dev,
                jnp.int32(min(len(self.frames), self.db_capacity)))

    def _grow_db(self) -> None:
        """Double the device code-DB capacity (the reference DB is unbounded,
        Ferns.cpp:78-160; a fixed device buffer that silently drops keyframes
        would make retrieval go blind on long runs).  Costs one recompile of
        the frame program per doubling — O(log frames) over a whole run."""
        self.db_capacity *= 2
        if self._db_codes_dev is None:
            return
        F = self.db_capacity
        old_c, old_g, old_t = (
            self._db_codes_dev, self._db_good_dev, self._db_time_dev)
        n = old_c.shape[0]
        self._db_codes_dev = jnp.full((F, self.num), BAD_CODE, jnp.int32
                                      ).at[:n].set(old_c)
        self._db_good_dev = jnp.zeros((F,), jnp.float32).at[:n].set(old_g)
        self._db_time_dev = jnp.full((F,), jnp.inf, jnp.float32
                                     ).at[:n].set(old_t)

    def _db_upload(self, idx: int, codes: np.ndarray, good: int,
                   src_time: int) -> None:
        if idx >= self.db_capacity:
            self._grow_db()
        if self._db_codes_dev is None:
            return
        self._db_codes_dev = self._db_codes_dev.at[idx].set(
            jnp.asarray(codes.astype(np.int32)))
        self._db_good_dev = self._db_good_dev.at[idx].set(float(good))
        self._db_time_dev = self._db_time_dev.at[idx].set(float(src_time))

    def encode_tables(self):
        """Device constants for fern_encode_device: (flat pixel index [F] i32,
        RGBD thresholds [F,4] f32)."""
        if self._dev_tables is None:
            flat = (self.pos[:, 1] * self.width + self.pos[:, 0]).astype(np.int32)
            self._dev_tables = (
                jnp.asarray(flat),
                jnp.asarray(self.rgbd.astype(np.float32)),
            )
        return self._dev_tables

    # -- encoding ------------------------------------------------------------

    def _encode(self, rgb_small: np.ndarray, verts_small: np.ndarray) -> Tuple[np.ndarray, int]:
        """4-bit fern codes (Ferns.cpp:108-127)."""
        x, y = self.pos[:, 0], self.pos[:, 1]
        z = verts_small[2, y, x]
        px = rgb_small[y, x].astype(np.int64)          # [num, 3]
        code = (
            ((px[:, 0] > self.rgbd[:, 0]).astype(np.uint8) << 3)
            | ((px[:, 1] > self.rgbd[:, 1]).astype(np.uint8) << 2)
            | ((px[:, 2] > self.rgbd[:, 2]).astype(np.uint8) << 1)
            | ((z * 1000.0).astype(np.int64) > self.rgbd[:, 3]).astype(np.uint8)
        )
        valid = z > 0
        code = np.where(valid, code, BAD_CODE).astype(np.uint8)
        return code, int(valid.sum())

    def _score(self, codes: np.ndarray, good: int, time):
        """Retrieval scoring of host codes against the DB — ONE
        implementation: the device-scored path (`fern_score_device`), the
        same program the engine traces in-frame.  Returns host scalars
        (add_min, best_id, best_d, block_hd)."""
        db_c, db_g, db_t, db_n = self.device_db()
        add_min, best_id, best_d, block_hd = fern_score_device(
            jnp.asarray(np.asarray(codes, np.int64).astype(np.int32)),
            jnp.int32(good), db_c, db_g, db_t, db_n,
            jnp.float32(time), self.cfg.fern_min_age,
        )
        return (float(add_min), int(best_id), float(best_d), float(block_hd))

    # -- public surface (addFrame / findFrame) -------------------------------

    def add_frame(self, image, vertex, normal, T_wc: np.ndarray, src_time: int,
                  threshold: Optional[float] = None) -> bool:
        """Ferns::addFrame (Ferns.cpp:78-160): encode the predicted view,
        keep as keyframe iff min dissimilarity over the DB > threshold."""
        rgb_s, vert_s, norm_s = _to_small(
            image, vertex, normal, self.height, self.width, self.factor
        )
        codes, good = self._encode(rgb_s, vert_s)
        return self.add_frame_codes(
            codes, good, (rgb_s, vert_s, norm_s), T_wc, src_time, threshold
        )

    def add_frame_codes(self, codes: np.ndarray, good: int, views,
                        T_wc: np.ndarray, src_time: int,
                        threshold: Optional[float] = None) -> bool:
        """addFrame with codes precomputed on-device (fern_encode_device);
        `views` (image, vertex, normal — device handles or numpy) are only
        materialized to the host when the keyframe is actually kept, which
        is rare (dissimilarity gate ~0.3095)."""
        threshold = self.cfg.fern_threshold if threshold is None else threshold
        if good == 0:
            return False
        codes = np.asarray(codes, np.uint8).reshape(-1)
        minimum = (
            self._score(codes, good, src_time)[0] if self.frames else np.inf
        )
        if minimum > threshold or len(self.frames) == 0:
            return self._append_keyframe(codes, good, views, T_wc, src_time)
        return False

    def _append_keyframe(self, codes, good, views, T_wc, src_time) -> bool:
        rgb_s, vert_s, norm_s = _to_small(
            views[0], views[1], views[2],
            self.height, self.width, self.factor,
        )
        f = FernFrame(
            id=len(self.frames), codes=codes, good_codes=int(good),
            T_wc=np.asarray(T_wc, np.float64).copy(), src_time=int(src_time),
            rgb=rgb_s, verts=vert_s, norms=norm_s,
        )
        self.frames.append(f)
        self._code_db = np.concatenate([self._code_db, codes[None]], axis=0)
        self._good_db = np.concatenate([self._good_db, [good]])
        self._time_db = np.concatenate([self._time_db, [src_time]])
        self._db_upload(f.id, codes, int(good), int(src_time))
        return True

    def add_frame_scored(self, add_min: float, codes, good, views,
                         T_wc: np.ndarray, src_time: int) -> bool:
        """addFrame with the dissimilarity minimum already computed on-device
        (fern_score_device): zero per-frame host compute; codes/views only
        materialize on the accept branch."""
        if good == 0:
            return False
        if len(self.frames) == 0 or add_min > self.cfg.fern_threshold:
            return self._append_keyframe(
                np.asarray(codes, np.uint8).reshape(-1), int(good), views,
                T_wc, src_time,
            )
        return False

    def closest_src_time(self) -> int:
        """src_time of the last accepted retrieval winner (callers must
        check `last_closest != -1` first).  Indirection so the multi-host
        `PartitionedFerns` can answer for winners owned by another host."""
        return self.frames[self.last_closest].src_time

    def find_frame_scored(self, best_id: int, best_d: float, block_hd: float,
                          codes, good, views, T_wc: np.ndarray, time: int,
                          lost: bool):
        """findFrame with retrieval scoring + blockHDAware already computed
        on-device; the host only runs the (rare) accept branch: fern-res ICP
        + photometric check + constraint emission (Ferns.cpp:231-291)."""
        self.last_closest = -1
        constraints: List[SurfaceConstraint] = []
        if (not self.frames or good == 0 or not np.isfinite(best_d)
                or best_id >= len(self.frames) or block_hd <= 0.3):
            return None, constraints
        fern = self.frames[int(best_id)]

        rgb_s, vert_s, norm_s = _to_small(
            views[0], views[1], views[2], self.height, self.width, self.factor
        )
        T_est = self._fern_icp(fern, vert_s, norm_s)
        if T_est is None:
            return None, constraints
        T_est_mat, icp_error, icp_count = T_est

        photo = self._photometric_check(vert_s, rgb_s, T_est_mat, fern)
        icp_count_thresh = (
            self.cfg.lost_inlier_relax if lost else self.cfg.fern_inlier_count
        )
        if not (icp_error < self.cfg.fern_icp_error
                and icp_count > icp_count_thresh
                and photo < self.cfg.photo_threshold):
            return None, constraints

        self.last_closest = int(best_id)
        return T_est_mat, self._emit_constraints(vert_s, T_wc, T_est_mat)

    def _emit_constraints(self, vert_s, T_wc, T_est_mat):
        """Surface constraints sampled every num/50 ferns (Ferns.cpp:265-291)."""
        constraints: List[SurfaceConstraint] = []
        T_wc = np.asarray(T_wc, np.float64)
        step = max(self.num // 50, 1)
        for i in range(0, self.num, step):
            x, y = self.pos[i]
            z = vert_s[2, y, x]
            if z > 0 and int(z * 1000.0) < self.max_depth_mm:
                p = np.array([vert_s[0, y, x], vert_s[1, y, x], z, 1.0])
                constraints.append(SurfaceConstraint(
                    source_point=(T_wc @ p)[:3],
                    target_point=(T_est_mat @ p)[:3],
                ))
        return constraints

    def find_frame(self, image, vertex, normal, T_wc: np.ndarray, time: int,
                   lost: bool):
        """Ferns::findFrame (Ferns.cpp:162-298).  Returns
        (T_wc_recovery | None, [SurfaceConstraint]); sets self.last_closest."""
        rgb_s, vert_s, norm_s = _to_small(
            image, vertex, normal, self.height, self.width, self.factor
        )
        codes, good = self._encode(rgb_s, vert_s)
        return self.find_frame_codes(
            codes, good, (rgb_s, vert_s, norm_s), T_wc, time, lost
        )

    def find_frame_codes(self, codes: np.ndarray, good: int, views,
                         T_wc: np.ndarray, time: int, lost: bool):
        """findFrame with codes precomputed on-device.  Scoring goes through
        the single device implementation (`_score` -> fern_score_device);
        the accept branch (fern ICP + photometric check) is
        `find_frame_scored`."""
        self.last_closest = -1
        if not self.frames or good == 0:
            return None, []
        codes = np.asarray(codes, np.uint8).reshape(-1)
        _, best_id, best_d, block_hd = self._score(codes, good, time)
        return self.find_frame_scored(
            best_id, best_d, block_hd, codes, good, views, T_wc, time, lost
        )

    # -- internals -----------------------------------------------------------

    def _fern_icp(self, fern: FernFrame, vert_s, norm_s):
        cfg = self.fern_cfg
        h, w = self.height, self.width
        zeros_img = [jnp.zeros((h >> l, w >> l), jnp.float32) for l in range(3)]

        vmaps_c = [jnp.asarray(vert_s)]
        nmaps_c = [jnp.asarray(norm_s)]
        for _ in range(2):
            vmaps_c.append(resize_vmap(vmaps_c[-1]))
            nmaps_c.append(resize_nmap(nmaps_c[-1]))

        T_fern = jnp.asarray(fern.T_wc, jnp.float32)
        R = T_fern[:3, :3]
        t = T_fern[:3, 3]
        vm = [jnp.asarray(fern.verts)]
        nm = [jnp.asarray(fern.norms)]
        for _ in range(2):
            vm.append(resize_vmap(vm[-1]))
            nm.append(resize_nmap(nm[-1]))

        def to_world(v, n):
            valid = v[2] > 0
            C, H, W = v.shape
            vg = (R @ v.reshape(3, -1) + t[:, None]).reshape(3, H, W)
            ng = (R @ n.reshape(3, -1)).reshape(3, H, W)
            nvalid = jnp.sum(n * n, axis=0) > 1e-12
            return jnp.where(valid[None], vg, 0.0), jnp.where(nvalid[None], ng, 0.0)

        world = [to_world(v, n) for v, n in zip(vm, nm)]

        inputs = OdometryInputs(
            vmaps_curr=tuple(vmaps_c),
            nmaps_curr=tuple(nmaps_c),
            vmaps_prev_g=tuple(w_[0] for w_ in world),
            nmaps_prev_g=tuple(w_[1] for w_ in world),
            last_images=tuple(zeros_img),
            next_images=tuple(zeros_img),
            last_depths=tuple(zeros_img),
            next_depths=tuple(zeros_img),
            so3_last_image=zeros_img[2],
            T_prev=T_fern,
        )
        res = get_incremental_transformation(inputs, cfg)
        return (
            np.asarray(res.T_curr, np.float64),
            float(res.icp_error),
            float(res.icp_count),
        )

    def _photometric_check(self, vert_s, rgb_s, T_est, fern: FernFrame) -> float:
        """Reprojection color error at fern pixels (Ferns.cpp:300-364)."""
        cam = self.fern_cam
        T = np.linalg.inv(fern.T_wc) @ T_est
        x, y = self.pos[:, 0], self.pos[:, 1]
        z = vert_s[2, y, x]
        ok = (z > 0) & ((z * 1000.0).astype(np.int64) < self.max_depth_mm)
        p = np.stack([vert_s[0, y, x], vert_s[1, y, x], z], axis=0)
        pf = T[:3, :3] @ p + T[:3, 3:4]
        with np.errstate(divide="ignore", invalid="ignore"):
            u = (pf[0] * cam.fx / pf[2] + cam.cx).astype(np.int64)
            v = (pf[1] * cam.fy / pf[2] + cam.cy).astype(np.int64)
        inb = (u >= 0) & (v >= 0) & (u < cam.width) & (v < cam.height) & ok
        uc = np.clip(u, 0, cam.width - 1)
        vc = np.clip(v, 0, cam.height - 1)
        fern_px = fern.rgb[vc, uc].astype(np.int64)     # [num, 3]
        cur_px = rgb_s[y, x].astype(np.int64)
        nonblack = fern_px.sum(axis=1) > 0
        use = inb & nonblack
        if use.sum() == 0:
            return np.inf
        return float(np.abs(fern_px[use] - cur_px[use]).sum() / use.sum())
