"""Binary PLY surfel export/import — byte-compatible with
`ElasticFusion::savePly` (/root/reference/Core/ElasticFusion.cpp:684-781):
binary_little_endian 1.0 with per-vertex `x y z (f32) r g b (u8)
nx ny nz radius (f32)`, normals negated, surfels below the confidence
threshold dropped."""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

_DTYPE = np.dtype(
    [
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
        ("red", "u1"), ("green", "u1"), ("blue", "u1"),
        ("nx", "<f4"), ("ny", "<f4"), ("nz", "<f4"),
        ("radius", "<f4"),
    ]
)


def save_ply(path: str | Path, surfel_map, conf_threshold: float) -> int:
    """Write live surfels with conf > threshold.  Returns the vertex count."""
    n = int(surfel_map.count)
    pos = np.asarray(surfel_map.pos[:, :n])
    conf = np.asarray(surfel_map.conf[:n])
    col = np.asarray(surfel_map.color[:, :n])
    nrm = np.asarray(surfel_map.normal[:, :n])
    rad = np.asarray(surfel_map.radius[:n])
    keep = conf > conf_threshold
    m = int(keep.sum())

    rec = np.empty(m, _DTYPE)
    rec["x"], rec["y"], rec["z"] = pos[0, keep], pos[1, keep], pos[2, keep]
    rec["red"] = np.clip(col[0, keep], 0, 255).astype(np.uint8)
    rec["green"] = np.clip(col[1, keep], 0, 255).astype(np.uint8)
    rec["blue"] = np.clip(col[2, keep], 0, 255).astype(np.uint8)
    # the reference flips normals on export (ElasticFusion.cpp:741-743)
    rec["nx"], rec["ny"], rec["nz"] = -nrm[0, keep], -nrm[1, keep], -nrm[2, keep]
    rec["radius"] = rad[keep]

    header = (
        "ply\nformat binary_little_endian 1.0"
        f"\nelement vertex {m}"
        "\nproperty float x\nproperty float y\nproperty float z"
        "\nproperty uchar red\nproperty uchar green\nproperty uchar blue"
        "\nproperty float nx\nproperty float ny\nproperty float nz"
        "\nproperty float radius"
        "\nend_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())
    return m


def load_ply(path: str | Path) -> np.ndarray:
    """Read a PLY written by save_ply (or the reference) into a structured
    array with fields x,y,z,red,green,blue,nx,ny,nz,radius."""
    raw = Path(path).read_bytes()
    end = raw.index(b"end_header\n") + len(b"end_header\n")
    header = raw[:end].decode("ascii")
    count = 0
    for line in header.splitlines():
        if line.startswith("element vertex"):
            count = int(line.split()[-1])
    return np.frombuffer(raw[end:], dtype=_DTYPE, count=count)
