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
    """Host-sharded fern DB: keyframe ownership is `src_time % n_hosts` —
    deterministic on every host with zero communication (each host's accept
    gate scores only its own shard, so accept decisions may differ slightly
    across hosts; ownership must not depend on them).  The modulo spreads
    each host's shard temporally, so the age>min_age retrieval gate
    (Ferns.cpp:218) never empties one host.  Retrieval scores the local
    shard; the global winner is resolved from the per-host (dissimilarity,
    id) bests by `merge_fern_candidates`.

    Drop-in for the Engine's `ferns` attribute: the engine-facing surface
    (`add_frame_scored`, `find_frame_scored`, `device_db`, `encode_tables`,
    `frames`, `last_closest`, ...) delegates to the wrapped `Ferns`, with
    the add path intercepted for ownership."""

    def __init__(self, ferns, n_hosts: int, host_id: int):
        # bypass __getattr__ recursion during construction
        object.__setattr__(self, "ferns", ferns)
        object.__setattr__(self, "n_hosts", n_hosts)
        object.__setattr__(self, "host_id", host_id)
        object.__setattr__(self, "_merged_accept", False)
        object.__setattr__(self, "_merged_src_time", -1)
        object.__setattr__(self, "_merge_seq", 0)

    def _host_allgather(self, tag: str, arr) -> np.ndarray:
        """All-gather a small f64 vector across hosts.

        Uses the jax.distributed coordination-service KV store when
        connected: device collectives (gloo on CPU) carry a hard ~30 s
        context/KV timeout, and ranks legitimately desync by minutes when
        one is cold-compiling a frame program while the other waits at the
        merge.  The KV round has an explicit 10-minute timeout instead.
        Falls back to multihost_utils.process_allgather when no distributed
        client exists (single-process callers / unit-test monkeypatching)."""
        import json

        from jax._src import distributed as _dist

        client = getattr(_dist.global_state, "client", None)
        if client is None:
            from jax.experimental import multihost_utils as mhu

            return np.asarray(mhu.process_allgather(np.asarray(arr)))
        seq = self._merge_seq
        base = f"elasticfusion/fern/{seq}/{tag}"
        client.key_value_set(
            f"{base}/{self.host_id}",
            json.dumps(np.asarray(arr, np.float64).tolist()),
        )
        rows = []
        for r in range(self.n_hosts):
            v = client.blocking_key_value_get(f"{base}/{r}", 600_000)
            rows.append(np.asarray(json.loads(v), np.float64))
        return np.stack(rows)

    def __getattr__(self, name):
        # everything not intercepted delegates to the wrapped Ferns
        return getattr(self.ferns, name)

    @property
    def last_closest(self) -> int:
        """-1 = no accepted closure this frame (the only engine-side test);
        a non-negative value means the MERGED global winner accepted — it is
        NOT a local frame index (the winning keyframe may live on another
        host; use `closest_src_time()` for its identity)."""
        if self.n_hosts == 1:
            return self.ferns.last_closest
        return 0 if self._merged_accept else -1

    def closest_src_time(self) -> int:
        if self.n_hosts == 1:
            return self.ferns.closest_src_time()
        return self._merged_src_time

    def _owns(self, src_time: int) -> bool:
        return int(src_time) % self.n_hosts == self.host_id

    def add_frame_codes(self, codes, good, views, T_wc, src_time, **kw) -> bool:
        if not self._owns(src_time):
            return False
        return self.ferns.add_frame_codes(
            codes, good, views, T_wc, src_time, **kw
        )

    def add_frame_scored(self, add_min, codes, good, views, T_wc,
                         src_time) -> bool:
        if not self._owns(src_time):
            return False
        return self.ferns.add_frame_scored(
            add_min, codes, good, views, T_wc, src_time
        )

    def find_frame_codes(self, *a, **kw):
        return self.ferns.find_frame_codes(*a, **kw)

    def find_frame_scored(self, best_id, best_d, block_hd, codes, good,
                          views, T_wc, time, lost):
        """Global retrieval: each host scored its DB shard on-device; the
        winner is resolved by a host all-gather of (dissimilarity, src_time,
        blockHD) triples, the winner's OWNER runs the accept branch (fern
        ICP + photometric check need the keyframe images, which only the
        owner holds), and the accept flag + recovery pose broadcast back.
        Every host then emits identical constraints from the shared current
        views + merged pose, so closure decisions are bit-identical across
        ranks (reference: one DB, one winner — Ferns.cpp:162-298)."""
        f = self.ferns
        if self.n_hosts == 1:
            return f.find_frame_scored(
                best_id, best_d, block_hd, codes, good, views, T_wc, time,
                lost,
            )
        object.__setattr__(self, "_merged_accept", False)
        object.__setattr__(self, "_merged_src_time", -1)
        object.__setattr__(self, "_merge_seq", self._merge_seq + 1)
        f.last_closest = -1

        valid = (
            bool(f.frames) and good != 0 and np.isfinite(best_d)
            and 0 <= int(best_id) < len(f.frames)
        )
        local_time = f.frames[int(best_id)].src_time if valid else -1
        payload = np.array(
            [best_d if valid else np.inf, float(local_time),
             float(block_hd) if valid else 0.0],
            np.float64,
        )
        allp = self._host_allgather("cand", payload)          # [n_hosts, 3]
        order = np.lexsort((allp[:, 1], allp[:, 0]))          # d, then time
        k = int(order[0])
        win_d, win_time, win_hd = allp[k]

        if not np.isfinite(win_d) or win_hd <= 0.3:
            # every host derives the same reject from the same allp
            return None, []

        owner = int(win_time) % self.n_hosts
        res = np.zeros((18,), np.float64)
        if owner == self.host_id:
            local_id = next(
                (i for i, fr in enumerate(f.frames)
                 if fr.src_time == int(win_time)), -1,
            )
            if local_id >= 0:
                T_est, _cons = f.find_frame_scored(
                    local_id, win_d, win_hd, codes, good, views, T_wc,
                    time, lost,
                )
                if f.last_closest != -1:
                    res[0] = 1.0
                    res[1:17] = np.asarray(T_est, np.float64).reshape(-1)
                    res[17] = win_time
        merged = self._host_allgather("verdict", res)[owner]
        if merged[0] == 0.0:
            f.last_closest = -1
            return None, []

        T_est = merged[1:17].reshape(4, 4)
        object.__setattr__(self, "_merged_accept", True)
        object.__setattr__(self, "_merged_src_time", int(merged[17]))
        # identical constraints on every rank: deterministic function of the
        # (replicated) current views + the merged estimated pose
        from ..ferns import _to_small

        rgb_s, vert_s, norm_s = _to_small(
            views[0], views[1], views[2], f.height, f.width, f.factor
        )
        return T_est, f._emit_constraints(vert_s, T_wc, T_est)
