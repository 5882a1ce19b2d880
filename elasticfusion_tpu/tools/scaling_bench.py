"""Map-axis scaling measurement + collective inventory.

Runs the sharded per-frame program on a 1-device and an N-device mesh at a
fixed (large) map capacity, reports the per-surfel-op speedup/efficiency,
and extracts the collectives GSPMD inserted from the compiled HLO — the
evidence artifact behind SCALING.md.

On this sandbox only virtual CPU meshes exist
(XLA_FLAGS=--xla_force_host_platform_device_count=N); CPU-mesh wall time is
NOT TPU wall time, but the sharding (memory per device, collective
placement) is the real GSPMD partition the TPU build would run.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python -m elasticfusion_tpu.tools.scaling_bench [-n 8] [-cap 20]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time


def crossover(argv=None) -> int:
    """Per-surfel-op scaling evidence at the >=4M-surfel regime
    (GlobalModel.cpp:22-24's 9.4M capacity; r4 VERDICT prescription #6).

    On this sandbox the N 'devices' are threads on a 2-core host, so 8-way
    WALL time can never beat 1-device (the replicated pixel work runs Nx on
    shared silicon and even ideal map ops only have 2 cores).  The
    measurable evidence is therefore:
      * pixel work is made negligible (64x48 camera) so the step is ~pure
        per-surfel map ops, and
      * total PROCESS CPU seconds per step, 1-dev vs N-way: a ratio ~1 means
        the shard formulation adds no work at 4M surfels — on real chips
        (one shard per chip, pixel work once per chip) that work runs N-wide.
    """
    p = argparse.ArgumentParser()
    p.add_argument("-n", dest="n_devices", type=int, default=8)
    p.add_argument("-cap", dest="cap_log2", type=int, default=22,
                   help="log2 surfel capacity (default 2^22 = 4.2M)")
    p.add_argument("-fill", type=float, default=0.9,
                   help="live fraction of capacity to fill")
    p.add_argument("-frames", type=int, default=3)
    args = p.parse_args(argv)

    import os

    import jax

    # the sandbox's sitecustomize eagerly registers the TPU plugin, so the
    # JAX_PLATFORMS env var alone is too late — honor it through the config
    # (the N-way leg needs the virtual CPU mesh)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ..config import CameraConfig, EngineConfig
    from ..ops.preprocess import metricise_depth
    from ..parallel.sharding import make_mesh, replicate
    from ..parallel.shard_step import distribute_map, make_shardmap_step
    from ..surfels import empty_map
    from ..utils.synthetic import make_scene, render_frame

    w, h = 64, 48
    cam = CameraConfig(width=w, height=h, fx=52.8, fy=52.8, cx=32.0, cy=24.0)
    cap = 1 << args.cap_log2
    cfg = EngineConfig(camera=cam, max_surfels=cap, confidence_threshold=0.3)
    scene = make_scene(n_side=160)
    depth_mm, rgb = render_frame(scene[0], scene[1], np.eye(4), cam)

    # fill the map with synthetic in-frustum surfels (live fraction -fill)
    rng = np.random.default_rng(0)
    n_live = int(cap * args.fill)
    z = rng.uniform(0.8, 3.0, n_live).astype(np.float32)
    u = rng.uniform(0, w, n_live).astype(np.float32)
    v = rng.uniform(0, h, n_live).astype(np.float32)
    pos = np.zeros((3, cap), np.float32)
    pos[0, :n_live] = (u - cam.cx) * z / cam.fx
    pos[1, :n_live] = (v - cam.cy) * z / cam.fy
    pos[2, :n_live] = z
    nrm = np.zeros((3, cap), np.float32)
    nrm[2, :n_live] = -1.0
    m0 = empty_map(cap)._replace(
        pos=jnp.asarray(pos),
        normal=jnp.asarray(nrm),
        conf=jnp.asarray((np.arange(cap) < n_live) * 1.0, jnp.float32),
        radius=jnp.asarray((np.arange(cap) < n_live) * 0.01, jnp.float32),
        last_t=jnp.asarray((np.arange(cap) < n_live) * 1.0, jnp.float32),
        init_t=jnp.asarray((np.arange(cap) < n_live) * 1.0, jnp.float32),
        count=jnp.int32(n_live),
    )

    out = {"capacity": cap, "live": n_live, "camera": f"{w}x{h}",
           "backend": jax.default_backend(), "results": {}}
    for n in sorted({1, args.n_devices}):
        mesh = make_mesh(n)
        m = distribute_map(m0, mesh)
        step = make_shardmap_step(cfg, mesh)
        mk = lambda x: replicate(x, mesh)  # noqa: E731
        sargs = lambda mm, i: (  # noqa: E731
            mm, mk(jnp.eye(4, dtype=jnp.float32)),
            mk(jnp.zeros((h >> 2, w >> 2), jnp.float32)),
            mk(jnp.zeros((3, h, w), jnp.float32)),
            mk(jnp.zeros((3, h, w), jnp.float32)),
            mk(jnp.zeros((h, w, 3), jnp.float32)),
            mk(jnp.asarray(depth_mm)), mk(jnp.asarray(rgb)),
            mk(jnp.float32(2.0 + i)), mk(jnp.float32(1.0)),
        )
        r = step(*sargs(m, 0))
        jax.block_until_ready(r)
        mm = distribute_map(m0, mesh)
        t0 = time.perf_counter()
        c0 = os.times()
        for i in range(args.frames):
            r = step(*sargs(mm, i))
            mm = r[0]
        jax.block_until_ready(r)
        wall = (time.perf_counter() - t0) / args.frames * 1e3
        ct = os.times()
        cpu = ((ct.user - c0.user) + (ct.system - c0.system)) / args.frames
        out["results"][str(n)] = {
            "wall_ms_per_step": round(wall, 1),
            "cpu_s_per_step": round(cpu, 3),
            "cpu_us_per_Msurfel": round(cpu / (n_live / 1e6) * 1e6 / 1e3, 1),
        }
    r1 = out["results"].get("1")
    rN = out["results"].get(str(args.n_devices))
    if r1 and rN:
        out["work_ratio_Nway_vs_1"] = round(
            rN["cpu_s_per_step"] / max(r1["cpu_s_per_step"], 1e-9), 3
        )
    print(json.dumps(out, indent=2))
    return 0


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "-crossover":
        return crossover(argv[1:])
    p = argparse.ArgumentParser()
    p.add_argument("-n", dest="n_devices", type=int, default=8)
    p.add_argument("-cap", dest="cap_log2", type=int, default=20,
                   help="log2 surfel capacity (default 2^20)")
    p.add_argument("-frames", type=int, default=5)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config import CameraConfig, EngineConfig
    from ..ops.preprocess import metricise_depth
    from ..parallel.sharding import (
        make_mesh, replicate, shard_surfel_map, sharded_slam_step,
    )
    from ..surfels import init_map_from_frame
    from ..utils.synthetic import make_scene, pose_from_xyzrpy, render_frame

    w, h = 320, 240
    cam = CameraConfig(width=w, height=h, fx=264.0, fy=264.0, cx=160.0, cy=120.0)
    cfg = EngineConfig(camera=cam, max_surfels=1 << args.cap_log2,
                       confidence_threshold=0.3)
    scene = make_scene(n_side=900)
    depth_mm, rgb = render_frame(scene[0], scene[1], np.eye(4), cam)
    raw = metricise_depth(jnp.asarray(depth_mm, jnp.float32), cfg.depth_cutoff)
    m0 = init_map_from_frame(cfg.max_surfels, raw, raw, jnp.asarray(rgb),
                             cam, cfg.depth_cutoff)

    results = {}
    hlo_collectives = {}
    for n in sorted({1, args.n_devices}):
        mesh = make_mesh(n)
        m = shard_surfel_map(m0, mesh)
        step = sharded_slam_step(cfg, mesh)
        mk = lambda x: replicate(x, mesh)  # noqa: E731
        argv_ = lambda mm, i: (  # noqa: E731
            mm, mk(jnp.eye(4, dtype=jnp.float32)),
            mk(jnp.zeros((h >> 2, w >> 2), jnp.float32)),
            mk(jnp.zeros((3, h, w), jnp.float32)),
            mk(jnp.zeros((3, h, w), jnp.float32)),
            mk(jnp.zeros((h, w, 3), jnp.float32)),
            mk(jnp.asarray(depth_mm)), mk(jnp.asarray(rgb)),
            mk(jnp.float32(2.0 + i)), mk(jnp.float32(1.0)),
        )
        # collective inventory from the compiled module
        try:
            txt = step.lower(*argv_(m, 0)).compile().as_text()
            colls = re.findall(
                r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
                r"|all-to-all)\b", txt)
            from collections import Counter

            hlo_collectives[n] = dict(Counter(colls))
        except Exception as e:  # noqa: BLE001
            hlo_collectives[n] = f"hlo unavailable: {e}"

        out = step(*argv_(m, 0))
        jax.block_until_ready(out)
        mm = shard_surfel_map(m0, mesh)
        t0 = time.perf_counter()
        for i in range(args.frames):
            out = step(*argv_(mm, i))
            mm = out[0]
        jax.block_until_ready(out)
        results[n] = (time.perf_counter() - t0) / args.frames * 1e3

    # --- the explicit shard_map formulation (parallel/shard_step.py) ---
    from ..parallel.shard_step import make_shardmap_step, shard_empty_map

    sm_results = {}
    sm_collectives = {}
    for n in sorted({1, args.n_devices}):
        mesh = make_mesh(n)
        step = make_shardmap_step(cfg, mesh)
        cap_l = cfg.max_surfels // n
        n0 = int(m0.count)

        def boot():
            ms = shard_empty_map(cfg.max_surfels, mesh)
            upd = {}
            for k in ("pos", "conf", "color", "init_t", "last_t",
                      "normal", "radius"):
                full = np.zeros(getattr(ms, k).shape, np.float32)
                src = np.asarray(jax.device_get(getattr(m0, k)))
                keep = min(n0, cap_l)
                full[..., :keep] = src[..., :keep]
                upd[k] = jax.device_put(
                    jnp.asarray(full), getattr(ms, k).sharding)
            counts = np.zeros((n,), np.int32)
            counts[0] = min(n0, cap_l)
            upd["count"] = jax.device_put(
                jnp.asarray(counts), ms.count.sharding)
            return ms._replace(**upd)

        mk = lambda x: replicate(x, mesh)  # noqa: E731
        sm_args = lambda mm, i: (  # noqa: E731
            mm, mk(jnp.eye(4, dtype=jnp.float32)),
            mk(jnp.zeros((h >> 2, w >> 2), jnp.float32)),
            mk(jnp.zeros((3, h, w), jnp.float32)),
            mk(jnp.zeros((3, h, w), jnp.float32)),
            mk(jnp.zeros((h, w, 3), jnp.float32)),
            mk(jnp.asarray(depth_mm)), mk(jnp.asarray(rgb)),
            mk(jnp.float32(2.0 + i)), mk(jnp.float32(1.0)),
        )
        try:
            txt = step.lower(*sm_args(boot(), 0)).compile().as_text()
            colls = re.findall(
                r"\b(all-reduce|all-gather|reduce-scatter|collective-permute"
                r"|all-to-all)\b", txt)
            from collections import Counter

            sm_collectives[n] = dict(Counter(colls))
        except Exception as e:  # noqa: BLE001
            sm_collectives[n] = f"hlo unavailable: {e}"

        mm = boot()
        out = step(*sm_args(mm, 0))
        jax.block_until_ready(out)
        mm = boot()
        t0 = time.perf_counter()
        for i in range(args.frames):
            out = step(*sm_args(mm, i))
            mm = out[0]
        jax.block_until_ready(out)
        sm_results[n] = (time.perf_counter() - t0) / args.frames * 1e3

    n = args.n_devices
    speedup = results[1] / results[n] if n in results and 1 in results else None
    sm_speedup = (
        sm_results[1] / sm_results[n]
        if n in sm_results and 1 in sm_results else None
    )
    print(json.dumps({
        "backend": jax.default_backend(),
        "capacity": 1 << args.cap_log2,
        "gspmd": {
            "ms_per_step": {str(k): round(v, 2) for k, v in results.items()},
            "speedup": None if speedup is None else round(speedup, 3),
            "efficiency": None if speedup is None else round(speedup / n, 3),
            "collectives": hlo_collectives,
        },
        "shard_map": {
            "ms_per_step": {str(k): round(v, 2) for k, v in sm_results.items()},
            "speedup": None if sm_speedup is None else round(sm_speedup, 3),
            "efficiency": (
                None if sm_speedup is None else round(sm_speedup / n, 3)
            ),
            "collectives": sm_collectives,
        },
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
