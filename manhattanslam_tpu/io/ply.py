"""PLY export of the surfel cloud.

Matches the reference's tinyply output schema (System::saveSurfels,
System.cc:296-382): vertex element with position, normal, intensity,
quality (fuse weight) and radius.  Binary little-endian.
"""

from __future__ import annotations

import struct

import numpy as np

HEADER = """ply
format binary_little_endian 1.0
element vertex {n}
property float x
property float y
property float z
property float nx
property float ny
property float nz
property float intensity
property float quality
property float radius
end_header
"""


def save_surfel_ply(
    path: str,
    pos: np.ndarray,
    normal: np.ndarray,
    intensity: np.ndarray,
    quality: np.ndarray,
    radius: np.ndarray,
) -> None:
    n = len(pos)
    data = np.concatenate(
        [
            pos.astype("<f4"),
            normal.astype("<f4"),
            intensity[:, None].astype("<f4"),
            quality[:, None].astype("<f4"),
            radius[:, None].astype("<f4"),
        ],
        axis=1,
    )
    with open(path, "wb") as f:
        f.write(HEADER.format(n=n).encode())
        f.write(data.tobytes())


def load_surfel_ply(path: str) -> dict:
    """Reads back the schema written by save_surfel_ply (for tests)."""
    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int(
            [ln for ln in header.decode().splitlines() if ln.startswith("element vertex")][
                0
            ].split()[-1]
        )
        data = np.frombuffer(f.read(), dtype="<f4").reshape(n, 9)
    return {
        "pos": data[:, 0:3],
        "normal": data[:, 3:6],
        "intensity": data[:, 6],
        "quality": data[:, 7],
        "radius": data[:, 8],
    }
