"""End-to-end tracking on the synthetic box room (BASELINE config-1 analog:
ORB-only tracking + pose optimization, CPU-runnable)."""

import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.system import System


@pytest.fixture(scope="module")
def tracked(small_cfg):
    seq = SyntheticSequence(n_frames=10, cam=small_cfg.camera)
    sys = System(small_cfg, enable_planes=False, enable_lines=False,
                 enable_surfels=False)
    poses = []
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        T = sys.track(gray, depth, t)
        poses.append(T)
    return seq, sys, poses


def test_all_frames_tracked(tracked):
    seq, sys, poses = tracked
    n_ok = sum(p is not None for p in poses)
    assert n_ok == len(seq), f"only {n_ok}/{len(seq)} frames tracked"


def test_trajectory_accuracy(tracked, tmp_path):
    seq, sys, poses = tracked
    est = tmp_path / "est.txt"
    sys.save_trajectory_tum(str(est))
    ts, pos, _ = traj_io.load_trajectory_tum(str(est))
    assert len(ts) == len(seq)
    gt_rows = seq.gt_rows()
    gt_ts = np.array([r[0] for r in gt_rows])
    gt_pos = np.array([r[1] for r in gt_rows])
    ate = traj_io.ate_rmse((ts, pos), (gt_ts, gt_pos))
    assert ate < 0.05, f"ATE {ate:.4f} m too large"


def test_keyframe_trajectory_export(tracked, tmp_path):
    seq, sys, poses = tracked
    kf = tmp_path / "kf.txt"
    sys.save_keyframe_trajectory_tum(str(kf))
    ts, pos, q = traj_io.load_trajectory_tum(str(kf))
    assert len(ts) >= 1
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1, atol=1e-5)


def test_map_grows(tracked):
    seq, sys, poses = tracked
    assert sys.map.n_kf >= 1
    assert sys.map.mp_valid.sum() > 100


def test_localization_mode(small_cfg):
    # 12-frame orbit = same per-frame motion scale as the main test; the
    # dataset-rate contract (30 fps motion) is what tracking is built for
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera)
    sys = System(small_cfg, enable_planes=False, enable_lines=False,
                 enable_surfels=False)
    for i in range(6):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    n_kf = sys.map.n_kf
    n_mp = sys.map.mp_valid.sum()
    sys.activate_localization_mode()
    for i in range(6, 12):
        t, gray, depth = seq.frame(i)
        T = sys.track(gray, depth, t)
        assert T is not None
    # no new keyframes or map points in localization mode
    assert sys.map.n_kf == n_kf
    assert sys.map.mp_valid.sum() == n_mp


def test_reset(small_cfg):
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera)
    sys = System(small_cfg, enable_planes=False, enable_lines=False,
                 enable_surfels=False)
    for i in range(3):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.reset()
    assert sys.map.n_kf == 0
    t, gray, depth = seq.frame(0)
    assert sys.track(gray, depth, t) is not None  # re-initializes


def test_reset_with_all_modules(small_cfg):
    """Reset must re-point line/plane/reloc modules and the local mapper at
    the NEW map (Tracking::Reset, Tracking.cc:2057-2087); regression for the
    stale line_module.map / stale recent_points bugs."""
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera)
    sys = System(small_cfg, enable_planes=True, enable_lines=True,
                 enable_surfels=False)
    for i in range(4):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.reset()
    assert sys.map.n_kf == 0
    assert sys.tracker.line_module.map is sys.map
    assert sys.tracker.plane_module.map is sys.map
    assert sys.local_mapper.map is sys.map
    assert sys.local_mapper.recent_points == []
    # track again: new landmarks must land in the NEW map
    for i in range(4):
        t, gray, depth = seq.frame(i)
        T = sys.track(gray, depth, t)
    assert T is not None
    assert sys.map.n_kf >= 1
    assert sys.map.mp_valid.sum() > 0


def test_reset_fast_tracker(small_cfg):
    """Reset with the fused tracker keeps the pipeline flag and re-inits."""
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera)
    sys = System(small_cfg, enable_surfels=False, fast=True, pipeline=True)
    for i in range(3):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.reset()
    assert sys.tracker.pipeline is True
    assert sys.map.n_kf == 0
    for i in range(4):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.shutdown()  # flush the pipelined in-flight frame
    assert sys.map.n_kf >= 1
