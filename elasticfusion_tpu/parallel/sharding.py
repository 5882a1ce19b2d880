"""Multi-device sharding of the surfel map — the TPU-native scaling path
that the reference does not have (SURVEY.md §2.11, §5.7-5.8: no multi-GPU /
multi-node anywhere; BASELINE.json's north star demands sharding the 9.4 M x
48 B surfel "model" across devices).

Design: one mesh axis `"map"` over which every per-surfel array is sharded
along its N dimension.  All pixel-domain state (frames, prediction images,
index maps) is replicated.  Because prediction carries its attributes as
pixel-domain images (ops/splat.IndexPrediction), the per-frame step
decomposes as:

  - point raster / splat resolve: local scatter over the surfel shard ->
    replicated z/winner images; XLA's SPMD partitioner inserts the
    all-reduce-min over `"map"` (the psum/all_gather of SURVEY §5.8).
  - fuse scatter-adds: each device applies updates for ids in its shard
    (scatter-with-drop is shard-local under GSPMD).
  - clean / compact: elementwise in N + cumsum (partitioned prefix sum).

The entry points here just build meshes and shardings and wrap
`engine.slam_step` with them; the step body is unchanged — annotate and let
XLA insert collectives."""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..surfels import SurfelMap


def make_mesh(n_devices: Optional[int] = None, axis: str = "map") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def map_shardings(mesh: Mesh, axis: str = "map") -> SurfelMap:
    """A SurfelMap of NamedShardings: vector fields [3, N] shard N (the lane
    dim), scalar fields [N] shard N, count replicated."""
    vec = NamedSharding(mesh, P(None, axis))
    sca = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return SurfelMap(
        pos=vec, conf=sca, color=vec, init_t=sca, last_t=sca,
        normal=vec, radius=sca, count=rep,
    )


def shard_surfel_map(m: SurfelMap, mesh: Mesh) -> SurfelMap:
    sh = map_shardings(mesh)
    return jax.tree.map(jax.device_put, m, sh)


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def engine_mesh(cfg: EngineConfig) -> Optional[Mesh]:
    """Build the engine's device mesh from cfg.mesh_shape (None = single
    device).  The Engine shards its SurfelMap over the 'map' axis and
    replicates frame state; XLA's SPMD partitioner propagates those input
    shardings through `_frame_main` and inserts the collectives
    (SURVEY.md §2.11/§5.8: all-reduce z-min merges for the point raster,
    all-gathers for pixel-domain composites)."""
    if cfg.mesh_shape is None:
        return None
    import math

    n = math.prod(cfg.mesh_shape)
    devs = jax.devices()
    if n > len(devs):
        raise ValueError(
            f"cfg.mesh_shape={cfg.mesh_shape} needs {n} devices, "
            f"{len(devs)} visible"
        )
    return Mesh(np.asarray(devs[:n]).reshape(cfg.mesh_shape), cfg.mesh_axes)


def sharded_slam_step(cfg: EngineConfig, mesh: Mesh):
    """jit of engine.slam_step with the map sharded over `mesh` and frame
    state replicated.  Output shardings mirror the inputs so the step can be
    called in a loop without resharding."""
    from ..engine import slam_step

    msh = map_shardings(mesh)
    rep = NamedSharding(mesh, P())

    in_sh = (
        msh,            # m
        rep, rep,       # T_prev, so3_hist
        rep, rep, rep,  # pred_vertex, pred_normal, pred_image
        rep, rep,       # depth_mm, rgb
        rep, rep,       # tick, weighting
    )
    # outputs: (map', T, so3', (vtx,nrm,img), Prediction, dense, TrackingResult)
    out_sh = (
        msh, rep, rep,
        (rep, rep, rep),
        jax.tree.map(lambda _: rep, _prediction_struct()),
        rep,
        jax.tree.map(lambda _: rep, _tracking_struct()),
    )
    return jax.jit(
        functools.partial(slam_step, cfg=cfg),
        in_shardings=in_sh,
        out_shardings=out_sh,
    )


def _prediction_struct():
    from ..ops.splat import Prediction

    return Prediction(*(0,) * len(Prediction._fields))


def _tracking_struct():
    from ..tracking import TrackingResult

    return TrackingResult(*(0,) * len(TrackingResult._fields))
