"""Map prediction by surfel splatting — TPU-native equivalent of `IndexMap`
(/root/reference/Core/IndexMap.cpp) and its GLSL programs (index_map.vert/frag,
splat.vert, combo_splat.frag, depth_splat.frag).

The reference rasterizes surfels with OpenGL: `predictIndices` renders each
in-window surfel as a 1-px point carrying its VBO index into 4 MRT targets
(IndexMap.cpp:190-258), and `combinedPredict` renders variable-size point
sprites whose fragments do ray/disk intersection with perspective-correct
depth (splat.vert:70-85, combo_splat.frag:37-60).

TPU design — "rasterization without a rasterizer" (SURVEY.md §7):
  1. *Point pass* (scatter): every surfel projects to one pixel; two
     scatter-min passes z-resolve a winner-surfel-id image.  Deterministic:
     ties at equal depth go to the lowest surfel index.
  2. *Splat resolve* (gather/stencil): each output pixel examines the winning
     surfels of its KxK neighbourhood (pure VPU shifts — no scatter), does the
     same ray/disk intersection as combo_splat.frag against each candidate's
     tangent disk, and keeps the nearest hit.

This turns the scatter-heavy splat into one small scatter plus a fused
elementwise stencil, which is the shape XLA/TPU runs fastest.  The
approximation vs. the reference: a surfel only contributes if it won at least
one point-pass pixel in the neighbourhood — occluded-at-centre surfels drop
out; `FillIn` covers any extra holes exactly as it covers splat holes in the
reference.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CameraConfig
from ..surfels import SurfelMap
from .gatherpack import packed_gather

INVALID_ID = jnp.int32(2147483647)


class IndexPrediction(NamedTuple):
    """predictIndices output — the reference's index/vertConf/colorTime/
    normRad MRTs (index_map.frag:31-37) as pixel-domain images.  Keeping
    every attribute consumers need in pixel space (rather than N-indexed
    gathers) is what makes fuse/clean local under surfel-axis sharding:
    the images are replicated, the surfel arrays stay sharded."""

    index: jax.Array    # [H, W] i32 surfel id, -1 where empty
    vert: jax.Array     # [3, H, W] camera-frame surfel position
    normal: jax.Array   # [3, H, W] camera-frame surfel normal
    radius: jax.Array   # [H, W]
    conf: jax.Array     # [H, W]
    init_t: jax.Array   # [H, W] creation tick (colorTime.z)
    last_t: jax.Array   # [H, W] last-seen tick (colorTime.w)


class Prediction(NamedTuple):
    """combinedPredict output (camera frame), mirroring the 4 MRTs of
    combo_splat.frag: image, vertex+conf, normal+radius, init-time."""

    image: jax.Array    # [H, W, 3] f32 RGB 0..255
    vertex: jax.Array   # [3, H, W] camera-frame positions (0 = empty)
    conf: jax.Array     # [H, W]
    normal: jax.Array   # [3, H, W]
    radius: jax.Array   # [H, W]
    time: jax.Array     # [H, W] f32 surfel init time (colTime.z)
    depth: jax.Array    # [H, W] perspective-corrected depth


def _camera_frame(m: SurfelMap, T_wc: jax.Array):
    T_cw_R = T_wc[:3, :3].T
    t = T_wc[:3, 3]
    pos_c = T_cw_R @ (m.pos - t[:, None])
    normal_c = T_cw_R @ m.normal
    return pos_c, normal_c


def _point_raster(
    pos_c: jax.Array,
    valid: jax.Array,
    cam: CameraConfig,
    slot_live: jax.Array,
) -> jax.Array:
    """Sort-based z-buffer of 1-px points -> winner id image [H,W] (i32,
    INVALID_ID where empty).  Replaces the GL depth-tested point render of
    index_map.vert.

    Duplicate-index scatter-min lowers poorly on TPU; instead sort surfels by
    a single packed (pixel << 13 | quantized depth) key with a stable sort
    and keep the first entry of every pixel run.  One u32 key + the id value
    keeps the bitonic network to two operands (vs pixel/z-bits/id = three —
    each operand rides every pass of the network).  Depth quantizes to 13
    bits over [0, 2^13) cm — 2.4 mm buckets at the 20 m cutoff — which only
    coarsens the *winner tie-break*; all downstream geometry uses exact
    values.  Stability gives the deterministic lowest-id tie-break within a
    bucket, mirroring the GL depth test's fixed-point depth compare."""
    H, W = cam.height, cam.width
    N = pos_c.shape[1]
    z = pos_c[2]
    safe_z = jnp.where(jnp.abs(z) > 1e-12, z, 1.0)
    u = jnp.floor(pos_c[0] * cam.fx / safe_z + cam.cx).astype(jnp.int32)
    v = jnp.floor(pos_c[1] * cam.fy / safe_z + cam.cy).astype(jnp.int32)
    ok = valid & slot_live & (z > 0) & (u >= 0) & (v >= 0) & (u < W) & (v < H)
    pix = jnp.where(ok, v * W + u, H * W)  # out-of-range -> dropped

    ZB = 13
    ids = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    if (H * W + 1) << ZB <= (1 << 32):
        zq = jnp.clip((z * (8192.0 / 20.0)).astype(jnp.uint32), 0, (1 << ZB) - 1)
        key = (pix.astype(jnp.uint32) << ZB) | jnp.where(ok, zq, 0)
        skey, sid = jax.lax.sort((key, ids), num_keys=1, is_stable=True)
        spix = (skey >> ZB).astype(jnp.int32)
    else:
        # resolutions whose pixel ids don't fit 32-ZB bits: exact 2-key sort
        zbits = jax.lax.bitcast_convert_type(z, jnp.uint32)
        zkey = jnp.where(ok, zbits, jnp.uint32(0xFFFFFFFF))
        spix, _, sid = jax.lax.sort((pix, zkey, ids), num_keys=2, is_stable=True)

    head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), spix[1:] != spix[:-1]]
    ) & (spix < H * W)
    # dropped (non-head) rows get UNIQUE spill destinations past the image:
    # scattering into an oversized buffer with promise_in_bounds measured
    # ~15% faster than mode="drop" with out-of-bounds dests (every dest is
    # genuinely in-bounds and unique, so the promise is honest)
    drop_ids = H * W + jax.lax.broadcasted_iota(
        jnp.int32, (spix.shape[0], 1), 0).squeeze(-1)
    dest = jnp.where(head, spix, drop_ids)
    winner = (
        jnp.full((H * W + spix.shape[0],), INVALID_ID, jnp.int32)
        .at[dest]
        .set(sid, mode="promise_in_bounds", unique_indices=True)
    )[: H * W]
    return winner.reshape(H, W)


def predict_indices(
    m: SurfelMap,
    T_wc: jax.Array,
    cam: CameraConfig,
    time,
    time_delta: int,
    max_depth: float,
) -> IndexPrediction:
    """IndexMap::predictIndices (IndexMap.cpp:190-258 + index_map.vert):
    render every in-time-window surfel as a point; no confidence gate.
    The reference's `current > 0` empty test (data.vert:131) cannot represent
    surfel 0 — here empty is an explicit -1."""
    pos_c, normal_c = _camera_frame(m, T_wc)
    N = m.capacity
    slot = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    live = slot < m.count
    # index_map.vert:45: discard if z > maxDepth || z < 0 || time - last > delta
    gate = (pos_c[2] <= max_depth) & ((time - m.last_t) <= time_delta)
    winner = _point_raster(pos_c, gate, cam, live)

    H, W = cam.height, cam.width
    empty = (winner == INVALID_ID).reshape(-1)
    idx = jnp.where(empty, 0, jnp.clip(winner.reshape(-1), 0, N - 1))

    ch = packed_gather(
        (pos_c[0], pos_c[1], pos_c[2], normal_c[0], normal_c[1], normal_c[2],
         m.radius, m.conf, m.init_t, m.last_t),
        idx,
    )
    ch = [jnp.where(empty, 0.0, c).reshape(H, W) for c in ch]

    return IndexPrediction(
        index=jnp.where(winner == INVALID_ID, -1, winner),
        vert=jnp.stack(ch[0:3]),
        normal=jnp.stack(ch[3:6]),
        radius=ch[6],
        conf=ch[7],
        init_t=ch[8],
        last_t=ch[9],
    )


def _gather_surfel_channels(
    m: SurfelMap, pos_c: jax.Array, normal_c: jax.Array, pid: jax.Array
):
    """Gather per-pixel surfel attributes for an id image [H,W] (INVALID_ID
    = empty).  Returns dict of [.,H,W] channel images."""
    H, W = pid.shape
    empty = (pid == INVALID_ID).reshape(-1)
    idx = jnp.where(empty, 0, jnp.clip(pid.reshape(-1), 0, m.capacity - 1))

    ch = packed_gather(
        (pos_c[0], pos_c[1], pos_c[2], normal_c[0], normal_c[1], normal_c[2],
         m.radius, m.conf, m.color[0], m.color[1], m.color[2], m.init_t),
        idx,
    )
    ch = [jnp.where(empty, 0.0, c).reshape(H, W) for c in ch]

    return dict(
        p=jnp.stack(ch[0:3]),
        n=jnp.stack(ch[3:6]),
        rad=ch[6],
        conf=ch[7],
        col=jnp.stack(ch[8:11]),
        it=ch[11],
        empty=empty.reshape(H, W),
    )


def _shift(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift so out[y,x] = in[y+dy, x+dx], zero-filled at borders."""
    out = jnp.roll(jnp.roll(x, -dy, axis=-2), -dx, axis=-1)
    H, W = x.shape[-2], x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = (row + dy >= 0) & (row + dy < H) & (col + dx >= 0) & (col + dx < W)
    return jnp.where(inb, out, 0.0) if x.dtype != jnp.bool_ else out & inb


def combined_predict(
    m: SurfelMap,
    T_wc: jax.Array,
    cam: CameraConfig,
    time,
    max_time,
    time_delta: int,
    conf_threshold: float,
    max_depth: float,
    footprint: int = 5,
    use_pallas: Optional[bool] = None,
) -> Prediction:
    """IndexMap::combinedPredict (IndexMap.cpp:293-393) — splat-render the
    image/vertex/normal/time prediction.  Gates from splat.vert:57:
    z in (0, maxDepth], conf >= confThreshold, time - last <= timeDelta,
    last <= maxTime.  ACTIVE vs INACTIVE model halves are selected purely by
    the (time, maxTime) arguments (ElasticFusion.cpp:621-644 vs 450-459)."""
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
    return splat_resolve_images(ch, cam, footprint, use_pallas)


def splat_resolve_images(
    ch: dict,
    cam: CameraConfig,
    footprint: int = 5,
    use_pallas: Optional[bool] = None,
) -> Prediction:
    """The splat-resolve stage of combinedPredict on winner channel IMAGES
    (the _gather_surfel_channels dict).  Split out so the shard_map scaling
    path (parallel/shard_step.py) can run it on the cross-shard MERGED
    images — the stage is pure pixel-domain (replicated) compute."""
    H, W = cam.height, cam.width

    # hot path: the fused one-read Pallas stencil (z-min + blend in VMEM)
    on_tpu = jax.default_backend() == "tpu"
    if footprint == 5 and (use_pallas if use_pallas is not None else on_tpu):
        from .splat_pallas import splat_resolve

        valid = (~ch["empty"] & (ch["p"][2] > 0)).astype(jnp.float32)
        chan = jnp.concatenate(
            [ch["p"], ch["n"], ch["rad"][None], ch["conf"][None],
             ch["col"], ch["it"][None], valid[None]], axis=0
        )
        out = splat_resolve(chan, cam.fx, cam.fy, cam.cx, cam.cy,
                            interpret=not on_tpu)
        return Prediction(
            image=jnp.moveaxis(out[0:3], 0, -1),
            vertex=out[3:6],
            conf=out[6],
            normal=out[7:10],
            radius=out[10],
            time=out[11],
            depth=out[12],
        )

    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    # pixel ray (un-normalized; scale cancels in the plane intersection)
    lx = (u - cam.cx) / cam.fx
    ly = (v - cam.cy) / cam.fy

    big = jnp.float32(3.4e38)
    r = footprint // 2
    offsets = [
        (dy, dx) for dy in range(-r, footprint - r) for dx in range(-r, footprint - r)
    ]

    def candidate(dy, dx):
        p = jnp.stack([_shift(ch["p"][i], dy, dx) for i in range(3)])
        n = jnp.stack([_shift(ch["n"][i], dy, dx) for i in range(3)])
        rad = _shift(ch["rad"], dy, dx)
        nonempty = ~_shift(ch["empty"] | (ch["p"][2] <= 0), dy, dx)
        # ray/disk intersection (combo_splat.frag:37-50)
        ln = lx * n[0] + ly * n[1] + n[2]
        pn = p[0] * n[0] + p[1] * n[1] + p[2] * n[2]
        zc = pn / jnp.where(jnp.abs(ln) > 1e-12, ln, 1.0)
        d2 = (zc * lx - p[0]) ** 2 + (zc * ly - p[1]) ** 2 + (zc - p[2]) ** 2
        hit = nonempty & (jnp.abs(ln) > 1e-12) & (zc > 0) & (d2 <= rad * rad)
        return p, n, rad, zc, d2, hit

    # pass 1: front depth per pixel.  The GL pipeline's depth test resolves
    # overlapping splats winner-take-all, which biases depth toward the
    # nearest tilted-disk extrapolation (~2 mm near-bias measured); instead
    # we z-test to find the front surface ...
    zmin = jnp.full((H, W), big)
    for dy, dx in offsets:
        _, _, _, zc, _, hit = candidate(dy, dx)
        zmin = jnp.where(hit & (zc < zmin), zc, zmin)

    # pass 2: ... then blend every splat within BLEND_EPS of it, weighted by
    # confidence x radial-falloff over the disk (surface-splatting style).
    BLEND_EPS = 0.01  # m; occlusion boundaries stay crisp
    wsum = jnp.zeros((H, W))
    acc = dict(
        z=jnp.zeros((H, W)), conf=jnp.zeros((H, W)),
        nx=jnp.zeros((H, W)), ny=jnp.zeros((H, W)), nz=jnp.zeros((H, W)),
        rad=jnp.zeros((H, W)),
        r=jnp.zeros((H, W)), g=jnp.zeros((H, W)), b=jnp.zeros((H, W)),
    )
    wbest = jnp.zeros((H, W))
    it_best = jnp.zeros((H, W))
    for dy, dx in offsets:
        p, n, rad, zc, d2, hit = candidate(dy, dx)
        front = hit & (zc <= zmin + BLEND_EPS)
        conf = _shift(ch["conf"], dy, dx)
        gauss = 1.0 - d2 / jnp.maximum(rad * rad, 1e-12)
        w = jnp.where(front, jnp.maximum(conf, 1e-3) * jnp.maximum(gauss, 0.05), 0.0)
        wsum = wsum + w
        acc["z"] += w * zc
        acc["conf"] += w * conf
        acc["nx"] += w * n[0]
        acc["ny"] += w * n[1]
        acc["nz"] += w * n[2]
        acc["rad"] += w * rad
        acc["r"] += w * _shift(ch["col"][0], dy, dx)
        acc["g"] += w * _shift(ch["col"][1], dy, dx)
        acc["b"] += w * _shift(ch["col"][2], dy, dx)
        # discrete attrs (init time) come from the dominant splat
        it = _shift(ch["it"], dy, dx)
        take = w > wbest
        it_best = jnp.where(take, it, it_best)
        wbest = jnp.maximum(w, wbest)

    found = wsum > 0
    inv_w = jnp.where(found, 1.0 / jnp.maximum(wsum, 1e-12), 0.0)
    zed = acc["z"] * inv_w
    nx, ny, nz = acc["nx"] * inv_w, acc["ny"] * inv_w, acc["nz"] * inv_w
    nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    nscale = jnp.where(found & (nlen > 1e-12), 1.0 / jnp.maximum(nlen, 1e-12), 0.0)
    return Prediction(
        image=jnp.stack(
            [acc["r"] * inv_w, acc["g"] * inv_w, acc["b"] * inv_w], axis=-1
        ),
        vertex=jnp.stack([zed * lx, zed * ly, zed]),
        conf=acc["conf"] * inv_w,
        normal=jnp.stack([nx * nscale, ny * nscale, nz * nscale]),
        radius=acc["rad"] * inv_w,
        time=it_best,
        depth=zed,
    )


def synthesize_info(
    m: SurfelMap,
    T_wc: jax.Array,
    cam: CameraConfig,
    conf_threshold: float,
    max_depth: float,
) -> Prediction:
    """IndexMap::synthesizeInfo (IndexMap.cpp:478-556): splat prediction with
    NO time windowing — every confident surfel renders regardless of age.
    Utility pass for whole-map views (visualization, relocalization debug)."""
    return combined_predict(
        m, T_wc, cam,
        time=jnp.float32(0.0), max_time=jnp.float32(3.4e38),
        time_delta=int(2 ** 30), conf_threshold=conf_threshold,
        max_depth=max_depth,
    )


def synthesize_depth(
    m: SurfelMap,
    T_wc: jax.Array,
    cam: CameraConfig,
    time,
    max_time,
    time_delta: int,
    conf_threshold: float,
    max_depth: float,
    footprint: int = 5,
) -> jax.Array:
    """IndexMap::synthesizeDepth (IndexMap.cpp:395-476, depth_splat.frag):
    depth-only splat used for post-deformation timestamp refresh and cleanup
    occlusion checks.  Same gates as combinedPredict."""
    return combined_predict(
        m, T_wc, cam, time, max_time, time_delta, conf_threshold, max_depth, footprint
    ).depth
