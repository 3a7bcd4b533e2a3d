"""E2E tests for the fused device tracker (System(fast=True))."""

import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.system import System


@pytest.fixture(scope="module")
def fast_tracked(small_cfg):
    seq = SyntheticSequence(n_frames=10, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=True)
    poses = []
    manhattan_used = 0
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        T = sys.track(gray, depth, t)
        poses.append(T)
    return seq, sys, poses


def test_fast_all_frames_tracked(fast_tracked):
    seq, sys, poses = fast_tracked
    assert sum(p is not None for p in poses) == len(seq)


def test_fast_ate(fast_tracked, tmp_path):
    seq, sys, poses = fast_tracked
    est = tmp_path / "est.txt"
    sys.save_trajectory_tum(str(est))
    ts, pos, _ = traj_io.load_trajectory_tum(str(est))
    gt_rows = seq.gt_rows()
    ate = traj_io.ate_rmse(
        (ts, pos),
        (np.array([r[0] for r in gt_rows]), np.array([r[1] for r in gt_rows])),
    )
    assert ate < 0.05, f"ATE {ate:.4f}"


def test_fast_map_contents(fast_tracked):
    seq, sys, poses = fast_tracked
    m = sys.map
    assert m.n_kf >= 1
    assert m.mp_valid.sum() > 100
    assert m.pl_valid.sum() >= 2  # planes fused in the step
    assert len(m.manhattan_pairs) >= 1


def test_fast_manhattan_device_detection(fast_tracked):
    """The device registry must produce Manhattan hits after the first
    perpendicular pair is registered."""
    import jax

    seq, sys, poses = fast_tracked
    tr = sys.tracker
    # run one more frame and inspect the summary
    t, gray, depth = seq.frame(len(seq) - 1)
    T = sys.track(gray, depth, t + 1.0)
    from manhattanslam_tpu.frontend import device_tracker as dt

    s = dt.pull_summary(tr.last_result)
    assert bool(s["manhattan_found"])


def test_fast_surfels(fast_tracked, tmp_path):
    seq, sys, poses = fast_tracked
    if sys.surfel_mapper is None:
        pytest.skip("surfels disabled")
    p = tmp_path / "s.ply"
    sys.save_surfels(str(p))
    from manhattanslam_tpu.io.ply import load_surfel_ply

    assert len(load_surfel_ply(str(p))["pos"]) > 100


def test_fast_localization_mode(small_cfg):
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False)
    for i in range(6):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    n_kf = sys.map.n_kf
    sys.activate_localization_mode()
    for i in range(6, 12):
        t, gray, depth = seq.frame(i)
        assert sys.track(gray, depth, t) is not None
    assert sys.map.n_kf == n_kf


def test_fast_localization_beyond_map(small_cfg):
    """Localization mode keeps tracking via temporal VO landmarks even when
    the map only covers the start of the trajectory (UpdateLastFrame
    capability in the fused step)."""
    seq = SyntheticSequence(n_frames=16, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False)
    # map only the first 2 frames, then freeze the map
    for i in range(2):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.activate_localization_mode()
    ok = 0
    for i in range(2, 16):
        t, gray, depth = seq.frame(i)
        ok += sys.track(gray, depth, t) is not None
    assert ok >= 12  # tolerate at most 2 drops across the sweep
    assert sys.map.n_kf <= 2  # no keyframes added in localization mode
