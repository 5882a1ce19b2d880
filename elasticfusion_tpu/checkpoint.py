"""Map/engine checkpointing — a capability the reference lacks entirely
(SURVEY.md §5.4: outputs only, reset = destroy + reconstruct).  All engine
state is plain arrays (surfel SoA, pose log, fern DB, deformation graph), so
a checkpoint is one compressed npz; restore rebuilds a running Engine
mid-sequence."""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


def save_checkpoint(path: str | Path, engine) -> None:
    if hasattr(engine, "flush"):
        engine.flush()   # drain the frame pipeline so host state is current
    # sharded sub-maps serialize through the single-device layout; restore
    # redistributes via Engine._shard_map when mesh_shape is set
    m = engine.export_map() if hasattr(engine, "export_map") else engine.map
    data = {
        "version": FORMAT_VERSION,
        "tick": engine.tick,
        "T_wc": engine.T_wc,
        "lost": engine.lost,
        "tracking_count": engine.tracking_count,
        "deforms": engine.deforms,
        "fern_deforms": engine.fern_deforms,
        "pose_ticks": np.array([t for t, _ in engine.tick_poses], np.int64),
        "pose_mats": np.stack([T for _, T in engine.tick_poses])
        if engine.tick_poses else np.zeros((0, 4, 4)),
        "pose_times": np.array(engine.pose_times, np.int64),
    }
    if m is not None:
        n = int(m.count)
        data.update(
            map_count=n,
            map_capacity=m.capacity,
            map_pos=np.asarray(m.pos[:, :n]),
            map_conf=np.asarray(m.conf[:n]),
            map_color=np.asarray(m.color[:, :n]),
            map_init_t=np.asarray(m.init_t[:n]),
            map_last_t=np.asarray(m.last_t[:n]),
            map_normal=np.asarray(m.normal[:, :n]),
            map_radius=np.asarray(m.radius[:n]),
        )
    f = engine.ferns
    if f is not None and f.frames:
        data.update(
            fern_codes=np.stack([fr.codes for fr in f.frames]),
            fern_good=np.array([fr.good_codes for fr in f.frames], np.int64),
            fern_poses=np.stack([fr.T_wc for fr in f.frames]),
            fern_times=np.array([fr.src_time for fr in f.frames], np.int64),
            fern_rgb=np.stack([fr.rgb for fr in f.frames]),
            fern_verts=np.stack([fr.verts for fr in f.frames]),
            fern_norms=np.stack([fr.norms for fr in f.frames]),
        )
    # loop-closure carry state (EF.cpp:529-531 semantics): the downsampled
    # relative constraints fed into future global deformations, plus each
    # deformation's incremental-activation clock
    if engine.relative_cons:
        rc = engine.relative_cons
        data.update(
            rel_src=np.stack([c.src for c in rc]),
            rel_target=np.stack([c.target for c in rc]),
            rel_src_time=np.array([c.src_time for c in rc], np.int64),
            rel_target_time=np.array([c.target_time for c in rc], np.int64),
        )
    if engine.local_deformation is not None:
        data.update(
            local_last_deform=engine.local_deformation.last_deform_time,
            local_deforms=engine.local_deformation.deforms,
            global_last_deform=engine.global_deformation.last_deform_time,
            global_deforms=engine.global_deformation.deforms,
        )
    np.savez_compressed(path, **data)


def load_checkpoint(path: str | Path, cfg=None):
    """Rebuild an Engine from a checkpoint.  `cfg` must match the sensor
    geometry the checkpoint was recorded with."""
    from .config import EngineConfig
    from .engine import Engine
    from .ferns import FernFrame
    from .surfels import empty_map

    z = np.load(path, allow_pickle=False)
    if int(z["version"]) != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {int(z['version'])} unsupported")
    cfg = cfg or EngineConfig()
    eng = Engine(cfg)
    eng.tick = int(z["tick"])
    eng.T_wc = np.asarray(z["T_wc"])
    eng.lost = bool(z["lost"])
    eng.tracking_count = int(z["tracking_count"])
    eng.deforms = int(z["deforms"])
    eng.fern_deforms = int(z["fern_deforms"])
    eng.tick_poses = [
        (int(t), T) for t, T in zip(z["pose_ticks"], z["pose_mats"])
    ]
    eng.pose_times = [int(t) for t in z["pose_times"]]

    if "map_count" in z:
        from .engine import _next_bucket

        n = int(z["map_count"])
        cap = _next_bucket(2 * n, max(cfg.max_surfels, 2 * n))
        m = empty_map(cap)
        eng.map = m._replace(
            pos=m.pos.at[:, :n].set(jnp.asarray(z["map_pos"])),
            conf=m.conf.at[:n].set(jnp.asarray(z["map_conf"])),
            color=m.color.at[:, :n].set(jnp.asarray(z["map_color"])),
            init_t=m.init_t.at[:n].set(jnp.asarray(z["map_init_t"])),
            last_t=m.last_t.at[:n].set(jnp.asarray(z["map_last_t"])),
            normal=m.normal.at[:, :n].set(jnp.asarray(z["map_normal"])),
            radius=m.radius.at[:n].set(jnp.asarray(z["map_radius"])),
            count=jnp.int32(n),
        )
    if "fern_codes" in z and eng.ferns is not None:
        f = eng.ferns
        for i in range(len(z["fern_times"])):
            f.frames.append(FernFrame(
                id=i, codes=z["fern_codes"][i],
                good_codes=int(z["fern_good"][i]),
                T_wc=np.asarray(z["fern_poses"][i]),
                src_time=int(z["fern_times"][i]),
                rgb=z["fern_rgb"][i], verts=z["fern_verts"][i],
                norms=z["fern_norms"][i],
            ))
        f._code_db = z["fern_codes"].copy()
        f._good_db = z["fern_good"].copy()
        f._time_db = z["fern_times"].copy()
    if "rel_src" in z:
        from .deformation import HostConstraint

        eng.relative_cons = [
            HostConstraint(s, t, st, tt, relative=True)
            for s, t, st, tt in zip(
                z["rel_src"], z["rel_target"],
                z["rel_src_time"], z["rel_target_time"],
            )
        ]
    if "local_last_deform" in z and eng.local_deformation is not None:
        eng.local_deformation.last_deform_time = int(z["local_last_deform"])
        eng.local_deformation.deforms = int(z["local_deforms"])
        eng.global_deformation.last_deform_time = int(z["global_last_deform"])
        eng.global_deformation.deforms = int(z["global_deforms"])
    return eng
