"""Real 2-process `jax.distributed` bring-up test (SURVEY §5.8): two
subprocesses connect through a local coordinator, form a global 2x-CPU-device
mesh, run a psum across hosts, partition a fern DB, and resolve the global
retrieval winner with the argmin merge.  No fakes — this is the same
`initialize_from_env` path `run_slam -dist-*` uses on a real pod."""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    rank = int(sys.argv[1]); coord = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from elasticfusion_tpu.parallel.distributed import (
        PartitionedFerns, initialize_from_env, merge_fern_candidates,
        partition_ferns,
    )

    initialize_from_env(coordinator=coord, num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank
    assert len(jax.devices()) == 4, len(jax.devices())   # 2 local x 2 hosts

    # cross-host collective over the global mesh
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()), ("hosts",))
    x = jnp.ones((8,), jnp.float32)

    def body(v):
        return jax.lax.psum(v, "hosts")

    y = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P("hosts"), out_specs=P("hosts"),
    ))(jax.device_put(x, NamedSharding(mesh, P("hosts"))))
    # global arrays span non-addressable devices: read a local shard
    got = float(np.asarray(y.addressable_shards[0].data)[0])
    assert got == 4.0, got

    # fern partition: round-robin keyframe ownership is disjoint + complete
    mine = partition_ferns(10, 2, rank)
    assert set(mine) == set(range(rank, 10, 2))

    # argmin merge of per-host retrieval bests: host0 offers 0.4, host1 0.1
    sh = NamedSharding(mesh, P("hosts"))

    def mk_global(val, dtype):
        shards = [
            jax.device_put(jnp.asarray([val], dtype), dev)
            for dev in jax.local_devices()
        ]
        return jax.make_array_from_single_device_arrays((4,), sh, shards)

    dvec = mk_global(0.4 if rank == 0 else 0.1, jnp.float32)
    ivec = mk_global(7 if rank == 0 else 3, jnp.int32)

    def merge(d, i):
        return merge_fern_candidates((d[0], i[0]), "hosts")

    d, i = jax.jit(jax.shard_map(
        merge, mesh=mesh,
        in_specs=(P("hosts"), P("hosts")), out_specs=(P(), P()),
        check_vma=False,
    ))(dvec, ivec)
    dv = float(np.asarray(d.addressable_shards[0].data))
    iv = int(np.asarray(i.addressable_shards[0].data))
    assert abs(dv - 0.1) < 1e-6, dv
    assert iv == 3, iv

    # PartitionedFerns ownership is deterministic per src_time
    class _Stub:
        frames = []
        def add_frame_scored(self, *a):  # noqa: D401
            return True
    pf = PartitionedFerns(_Stub(), 2, rank)
    owned = [t for t in range(6) if pf.add_frame_scored(1.0, None, 1, None, None, t)]
    assert owned == list(range(rank, 6, 2)), owned

    print(f"RANK{rank}_OK", flush=True)
""")


def test_two_process_distributed(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker.py"
    # the worker inserts its own dir on sys.path; point it at the repo instead
    worker.write_text(
        _WORKER.replace(
            "os.path.dirname(os.path.abspath(__file__))", repr(str(repo))
        )
    )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(repo),
        )
        for rank in (0, 1)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank}_OK" in out, out[-3000:]


_ENGINE_WORKER = textwrap.dedent("""
    import os, sys
    rank = int(sys.argv[1]); coord = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", REPO + "/.jax_cache/dist")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, REPO)

    import numpy as np
    from elasticfusion_tpu.parallel.distributed import (
        PartitionedFerns, initialize_from_env,
    )

    # initialize BEFORE importing engine modules: they create module-level
    # device constants, which would initialise the single-process backend
    initialize_from_env(coordinator=coord, num_processes=2, process_id=rank)
    assert jax.process_count() == 2

    from elasticfusion_tpu.config import CameraConfig, EngineConfig
    from elasticfusion_tpu.engine import Engine
    from elasticfusion_tpu.utils.synthetic import (
        make_scene, render_frame, synthetic_trajectory,
    )

    cam = CameraConfig(width=64, height=48, fx=52.8, fy=52.8, cx=32., cy=24.)
    # gates scaled to 64x48 like __graft_entry__.dryrun_multichip; fern
    # keyframe/retrieval gates loosened so the DB grows and retrieval fires
    cfg = EngineConfig(
        camera=cam, max_surfels=1 << 12, closeLoops=True, time_delta=6,
        confidence_threshold=0.3, pipeline_depth=2,
        def_graph_sample_rate=31,
        icp_count_threshold=600, icp_error_threshold=5e-4,
        cov_threshold=2e-4,
        fern_threshold=0.05, fern_min_age=6, fern_inlier_count=15,
        fern_icp_error=5e-3,
    )
    eng = Engine(cfg)
    eng.ferns = PartitionedFerns(eng.ferns, 2, rank)
    merges = [0]
    _orig = eng.ferns.find_frame_scored
    def _counting(*a, **kw):
        merges[0] += 1
        return _orig(*a, **kw)
    eng.ferns.find_frame_scored = _counting

    scene = make_scene(n_side=160)
    for i, T in enumerate(synthetic_trajectory("there_back", 24)):
        depth_mm, rgb = render_frame(scene[0], scene[1], T, cam)
        eng.process_frame(rgb, depth_mm, timestamp=i)
    eng.flush()

    assert eng.surfel_count > 0
    assert len(eng.tick_poses) == 24
    assert eng.deforms + eng.fern_deforms >= 1, (
        "revisit must fire a loop closure")
    assert merges[0] >= 20, merges[0]   # merge path engaged every frame

    # bit-identical trajectories across ranks: all-gather the pose log
    from jax.experimental import multihost_utils as mhu
    poses = np.stack([T for _, T in eng.tick_poses]).astype(np.float64)
    both = np.asarray(mhu.process_allgather(poses))
    assert both.shape[0] == 2
    diff = np.abs(both[0] - both[1]).max()
    assert diff == 0.0, f"rank trajectories diverged: max |dT|={diff}"

    # keyframe ownership is disjoint: every keyframe's src_time matches rank
    for fr in eng.ferns.ferns.frames:
        assert fr.src_time % 2 == rank
    n_kf = np.asarray(mhu.process_allgather(
        np.array([len(eng.ferns.ferns.frames)], np.int64)))
    assert n_kf.sum() >= 1, "no keyframes were added on either rank"
    print(f"ENGRANK{rank}_OK kf={int(n_kf.sum())} deforms={eng.deforms}+{eng.fern_deforms}", flush=True)
""")


@pytest.mark.slow
def test_two_process_engine_e2e(tmp_path):
    """Full Engine on 2 jax.distributed processes with the partitioned fern
    DB: closure decisions resolve through the global-winner merge and the
    per-rank trajectories must be BIT-identical (r4 VERDICT Missing #4 /
    prescription #3).  Reference: one DB, one winner (Ferns.cpp:162-298)."""
    repo = Path(__file__).resolve().parent.parent
    worker = tmp_path / "worker_engine.py"
    worker.write_text(_ENGINE_WORKER.replace("REPO", repr(str(repo))))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), coord],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(repo),
        )
        for rank in (0, 1)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            # generous: both ranks cold-compile the whole engine on a 2-core
            # box, and the suite may run under further compile contention
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"ENGRANK{rank}_OK" in out, out[-4000:]
