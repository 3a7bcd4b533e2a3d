"""Plane + Manhattan end-to-end (BASELINE config-2 analog: synthetic
'living-room' with clean depth -> plane extraction + Manhattan alignment)."""

import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.system import System


@pytest.fixture(scope="module")
def tracked_planes(small_cfg):
    seq = SyntheticSequence(n_frames=10, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, enable_planes=True, enable_lines=False,
                 enable_surfels=False)
    manhattan_hits = 0
    poses = []
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        T = sys.track(gray, depth, t)
        poses.append(T)
        pm = sys.tracker.plane_module
        if pm is not None and pm.manhattan_Rcw is not None:
            manhattan_hits += 1
    return seq, sys, poses, manhattan_hits


def test_planes_frames_tracked(tracked_planes):
    seq, sys, poses, _ = tracked_planes
    assert sum(p is not None for p in poses) == len(seq)


def test_map_planes_created(tracked_planes):
    seq, sys, poses, _ = tracked_planes
    n_pl = int(sys.map.pl_valid.sum())
    assert n_pl >= 2  # box room: floor + walls
    # world plane clouds satisfy their plane equations loosely
    for j in np.nonzero(sys.map.pl_valid)[0]:
        c = sys.map.pl_coeffs[j]
        cl = sys.map.pl_pts[j, : sys.map.pl_n_pts[j]]
        assert np.abs(cl @ c[:3] + c[3]).mean() < 0.1


def test_manhattan_registry_populated(tracked_planes):
    seq, sys, poses, _ = tracked_planes
    # the box room's perpendicular planes must register at least one pair
    assert len(sys.map.manhattan_pairs) >= 1


def test_manhattan_detected_and_used(tracked_planes):
    seq, sys, poses, hits = tracked_planes
    assert hits >= 3  # Manhattan frame recovered in most frames after init


def test_manhattan_rotation_matches_gt(tracked_planes):
    """Decoupled rotation estimate must equal the ground-truth camera
    rotation (up to the world-gauge fixed at frame 0)."""
    seq, sys, poses, _ = tracked_planes
    pm = sys.tracker.plane_module
    if pm.manhattan_Rcw is None:
        pytest.skip("no Manhattan at final frame")
    # gauge: our world = camera-0 frame; gt: room frame
    # R_est_cw maps our-world -> camera; R_gt_cw maps room -> camera
    # relative rotation between the last camera and camera 0:
    R_gt_rel = np.linalg.inv(seq.poses[-1])[:3, :3] @ seq.poses[0][:3, :3]
    err = pm.manhattan_Rcw @ R_gt_rel.T
    angle = np.degrees(
        np.arccos(np.clip((np.trace(err) - 1) / 2, -1, 1))
    )
    assert angle < 2.0, f"Manhattan rotation off by {angle:.2f} deg"


def test_planes_ate(tracked_planes, tmp_path):
    seq, sys, poses, _ = tracked_planes
    est = tmp_path / "est.txt"
    sys.save_trajectory_tum(str(est))
    ts, pos, _ = traj_io.load_trajectory_tum(str(est))
    gt_rows = seq.gt_rows()
    ate = traj_io.ate_rmse(
        (ts, pos),
        (np.array([r[0] for r in gt_rows]), np.array([r[1] for r in gt_rows])),
    )
    assert ate < 0.05, f"ATE {ate:.4f}"
