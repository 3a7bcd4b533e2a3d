"""Full point+line+plane tracking (BASELINE config-3 analog)."""

import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.system import System


@pytest.fixture(scope="module")
def tracked_full(small_cfg):
    seq = SyntheticSequence(n_frames=10, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, enable_planes=True, enable_lines=True,
                 enable_surfels=False)
    poses = []
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        poses.append(sys.track(gray, depth, t))
    return seq, sys, poses


def test_full_stack_tracks(tracked_full):
    seq, sys, poses = tracked_full
    assert sum(p is not None for p in poses) == len(seq)


def test_map_lines_created(tracked_full):
    seq, sys, poses = tracked_full
    assert sys.tracker.line_module is not None
    n_ml = int(sys.map.ml_valid.sum())
    assert n_ml >= 3  # box-room edges + texture boundaries
    # line endpoints differ (nonzero length)
    for j in np.nonzero(sys.map.ml_valid)[0]:
        assert np.linalg.norm(sys.map.ml_sp[j] - sys.map.ml_ep[j]) > 0.05


def test_lines_associated_across_frames(tracked_full):
    seq, sys, poses = tracked_full
    lm_ = sys.tracker.line_module
    # at the final frame some lines matched to the map
    assert (lm_.assoc >= 0).sum() >= 1


def test_full_stack_ate(tracked_full, tmp_path):
    seq, sys, poses = tracked_full
    est = tmp_path / "est.txt"
    sys.save_trajectory_tum(str(est))
    ts, pos, _ = traj_io.load_trajectory_tum(str(est))
    gt_rows = seq.gt_rows()
    ate = traj_io.ate_rmse(
        (ts, pos),
        (np.array([r[0] for r in gt_rows]), np.array([r[1] for r in gt_rows])),
    )
    assert ate < 0.05, f"ATE {ate:.4f}"
