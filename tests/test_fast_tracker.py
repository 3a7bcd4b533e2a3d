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


def test_keyframe_gate_counts_free_slots(small_cfg):
    """A saturated keyframe high-water mark with retired (reusable) slots
    must NOT stop keyframing forever (the n_kf >= cap-1 gate bug): the
    capacity check counts free slots, not the high-water mark."""
    from manhattanslam_tpu.frontend.fast_tracking import FastTracker
    from manhattanslam_tpu.slam_map import SlamMap

    m = SlamMap(small_cfg)
    tr = FastTracker(small_cfg, m, enable_planes=False, enable_lines=False)
    # simulate a long-run state: high-water mark at capacity, some retired
    m.n_kf = small_cfg.caps.max_keyframes
    m.kf_free = [3, 7, 11]
    tr.frame_id = 1000
    tr.last_kf_frame_id = 0  # long since the last keyframe
    tr.n_inliers = 20
    s = {"tracked_close": 0, "nontracked_close": 100, "new_plane": False}
    # weak tracking + free slots available -> keyframe allowed
    assert tr._need_new_keyframe(s, frame_id=1000)
    # with NO free slots and the mark saturated -> blocked
    m.kf_free = []
    assert not tr._need_new_keyframe(s, frame_id=1000)


def test_keyframe_gate_reloc_recency(small_cfg):
    """No keyframe insertion within maxFrames of a relocalization on a
    mature map (Tracking.cc:1443-1444)."""
    from manhattanslam_tpu.frontend.fast_tracking import FastTracker
    from manhattanslam_tpu.slam_map import SlamMap

    m = SlamMap(small_cfg)
    tr = FastTracker(small_cfg, m, enable_planes=False, enable_lines=False)
    m.n_kf = tr.max_frames + 5  # mature map (> maxFrames live KFs)
    tr.n_inliers = 20
    tr.last_kf_frame_id = 0
    s = {"tracked_close": 0, "nontracked_close": 100, "new_plane": False}
    tr.last_reloc_frame_id = 995
    assert not tr._need_new_keyframe(s, frame_id=1000)  # 5 < maxFrames ago
    tr.last_reloc_frame_id = 1000 - tr.max_frames - 1
    assert tr._need_new_keyframe(s, frame_id=1000)


def test_step_reorthonormalizes_defective_carry(small_cfg):
    """Regression: a non-orthonormal defect in the carry's rotation block
    (f32 drift from the velocity @ T_last composition) must NOT survive a
    step — left uncorrected it compounds ~x2.4/frame into a screw-mode
    divergence that collapses tracking after ~40 frames even on a STATIC
    scene (reproduced at 640x480; fixed by a per-frame polar projection
    of the final pose's rotation block in the device step)."""
    import jax
    import jax.numpy as jnp

    from manhattanslam_tpu.frontend import device_tracker as dt

    seq = SyntheticSequence(n_frames=3, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False,
                 enable_planes=False, enable_lines=False)
    t, gray, depth = seq.frame(0)
    sys.track(gray, depth, t)   # init keyframe
    sys.track(gray, depth, t + 0.04)
    tr = sys.tracker
    T_true = np.asarray(sys.map.kf_pose[0])

    # inject a pure scale defect (R <- 1.001 R): NOT a rotation, so the
    # rigid retraction cannot remove it — only the polar projection can
    carry = dict(tr.carry)
    T_bad = jnp.asarray(T_true).at[:3, :3].multiply(1.001)
    carry["T_last"] = T_bad
    carry["velocity"] = jnp.eye(4, dtype=jnp.float32)
    carry["have_velocity"] = jnp.array(True)
    packed = jnp.asarray(dt.pack_frame(gray, depth))
    r, c2 = tr.step(packed, carry, tr.view)

    R = np.asarray(jax.device_get(r["T"]), np.float64)[:3, :3]
    defect = np.abs(R.T @ R - np.eye(3)).max()
    assert defect < 1e-5, f"rotation block left O(3) by {defect:.2e}"
    # and chaining two more steps must not grow the pose error
    r2, c3 = tr.step(packed, c2, tr.view)
    r3, _ = tr.step(packed, c3, tr.view)
    for rr in (r2, r3):
        d = np.asarray(jax.device_get(rr["T"]), np.float64) @ np.linalg.inv(
            T_true
        )
        assert np.linalg.norm(d[:3, 3]) < 5e-3
