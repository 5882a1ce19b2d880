"""Multi-host distribution — the TPU-native scaling path the reference never
had (SURVEY.md §2.11/§5.8: single GPU, single process, no NCCL/MPI anywhere).

Model
-----
* `jax.distributed.initialize` connects the hosts; every host runs the same
  Engine loop over the same frame stream (streaming SLAM is batch=1: frames
  are broadcast, compute is sharded).
* The surfel map — the "model", up to 9.4M x 48B surfels — is sharded over
  the global `map` mesh axis spanning all hosts (ICI within a slice, DCN
  across).  `engine_mesh` builds the mesh from `jax.devices()`, which is
  already global after initialize; nothing else in the Engine changes:
  GSPMD inserts the cross-host collectives (all-reduce z-min merges of the
  point raster, all-gathers of pixel-domain composites) exactly as it does
  on a single-host mesh.
* The deformation graph stays replicated by design: <=1024 nodes x 12
  variables (GlobalModel.cpp:25-26) is ~50 KB of state — the Schur-
  complement distribution SURVEY §7 sketched would move more bytes in
  collectives per CG iteration than the whole replicated solve touches.
  The graph's per-surfel application IS sharded (it maps over the surfel
  axis).
* The fern DB is partitioned per host (`partition_ferns`): each host scores
  its keyframe shard against the (replicated, 500-byte) frame code and the
  best candidate is resolved by a host all-gather of (dissimilarity, id) —
  O(matches) work per host, O(n_hosts) bytes on the wire.

This module is exercised on virtual CPU meshes (tests, dryrun_multichip);
real multi-host hardware is not available in this environment — see
SCALING.md for the measured single-host scaling evidence and the projected
collective inventory.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def initialize_from_env(coordinator: Optional[str] = None,
                        num_processes: Optional[int] = None,
                        process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up.  With no arguments, defers to JAX's
    environment autodetection (TPU pods set everything automatically)."""
    import jax

    if num_processes is not None and num_processes > 1 or coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    # else: single process; nothing to do (jax.devices() is already final)


def partition_ferns(n_frames: int, n_hosts: int, host_id: int) -> np.ndarray:
    """Round-robin keyframe partition: host h owns keyframes {h, h+n, ...}.
    Round-robin (vs block) keeps every host's shard temporally spread, so
    the age>300 retrieval gate (Ferns.cpp:218) never empties one host."""
    return np.arange(host_id, n_frames, n_hosts)


def merge_fern_candidates(
    local_best: Tuple[float, int], axis_name: str = "hosts"
):
    """Resolve the global best fern candidate from per-host (dissim, id)
    pairs inside a pmapped/shard_mapped context: an argmin all-gather."""
    import jax
    import jax.numpy as jnp

    d, i = local_best
    ds = jax.lax.all_gather(d, axis_name)
    is_ = jax.lax.all_gather(i, axis_name)
    k = jnp.argmin(ds)
    return ds[k], is_[k]


class PartitionedFerns:
    """Host-sharded fern DB wrapper: `add_frame_codes` keeps only keyframes
    this host owns (round-robin by global keyframe index); `find_frame_codes`
    scores the local shard.  The engine resolves the global winner by
    comparing each host's best dissimilarity (merge_fern_candidates when run
    under a collective context, or host-side gather in the driver loop)."""

    def __init__(self, ferns, n_hosts: int, host_id: int):
        self.ferns = ferns
        self.n_hosts = n_hosts
        self.host_id = host_id
        self._global_count = 0

    def add_frame_codes(self, codes, good, views, T_wc, src_time, **kw) -> bool:
        owner = self._global_count % self.n_hosts
        self._global_count += 1
        if owner != self.host_id:
            return False
        return self.ferns.add_frame_codes(codes, good, views, T_wc, src_time, **kw)

    def find_frame_codes(self, *a, **kw):
        return self.ferns.find_frame_codes(*a, **kw)
