"""Map checkpoint / resume.

The reference leaves SaveMap/LoadMap as a TODO stub (System.h:90-92);
here the map is plain arrays, so checkpointing is one compressed npz.
Restores everything needed to continue tracking or localize against the
saved map: landmarks (points/lines/planes), keyframes with their feature
payloads and plane observations, covisibility, and the Manhattan
registries.
"""

from __future__ import annotations

import json

import numpy as np

from manhattanslam_tpu.slam_map import SlamMap

_ARRAYS = [
    "mp_pos", "mp_desc", "mp_normal", "mp_min_dist", "mp_max_dist",
    "mp_level", "mp_valid", "mp_n_obs", "mp_visible", "mp_found",
    "mp_first_kf",
    "ml_sp", "ml_ep", "ml_desc", "ml_valid", "ml_n_obs", "ml_visible",
    "ml_found", "ml_first_kf",
    "pl_coeffs", "pl_pts", "pl_n_pts", "pl_valid", "pl_n_obs",
    "pl_first_kf", "pl_color",
    "kf_pose", "kf_time", "kf_frame_id", "kf_valid", "kf_xy", "kf_uright",
    "kf_depth", "kf_level", "kf_angle", "kf_desc", "kf_kp_valid",
    "kf_mp_idx", "kf_ml_idx", "kf_pl_idx", "kf_plane_coeffs",
    "kf_plane_npts", "covis", "kf_parent",
]


def save_map(path: str, slam_map: SlamMap) -> None:
    payload = {name: getattr(slam_map, name) for name in _ARRAYS}
    payload["_scalars"] = np.frombuffer(
        json.dumps(
            {
                "n_kf": slam_map.n_kf,
                "manhattan_pairs": {
                    ",".join(map(str, k)): v
                    for k, v in slam_map.manhattan_pairs.items()
                },
                "manhattan_triples": {
                    ",".join(map(str, k)): v
                    for k, v in slam_map.manhattan_triples.items()
                },
                "kf_not_erase": sorted(slam_map.kf_not_erase),
            }
        ).encode(),
        dtype=np.uint8,
    )
    np.savez_compressed(path, **payload)


def load_map(path: str, slam_map: SlamMap) -> SlamMap:
    """Load into an existing (freshly constructed) SlamMap in place."""
    data = np.load(path, allow_pickle=False)
    for name in _ARRAYS:
        getattr(slam_map, name)[...] = data[name]
    meta = json.loads(bytes(data["_scalars"]).decode())
    slam_map.n_kf = int(meta["n_kf"])
    slam_map.manhattan_pairs = {
        tuple(int(x) for x in k.split(",")): int(v)
        for k, v in meta["manhattan_pairs"].items()
    }
    slam_map.manhattan_triples = {
        tuple(int(x) for x in k.split(",")): int(v)
        for k, v in meta["manhattan_triples"].items()
    }
    slam_map.kf_not_erase = set(meta["kf_not_erase"])
    return slam_map
