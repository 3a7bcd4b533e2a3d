"""Packed frame upload + chunked-scan tracking mode."""

import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.frontend import device_tracker as dt
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.system import System


def test_pack_unpack_roundtrip():
    import jax

    rng = np.random.default_rng(3)
    H, W = 32, 48
    gray = rng.uniform(0, 255, (H, W)).astype(np.float32)
    depth = rng.uniform(0, 12.0, (H, W)).astype(np.float32)
    depth[rng.random((H, W)) < 0.2] = 0.0

    packed = dt.pack_frame(gray, depth)
    assert packed.dtype == np.uint8 and packed.shape == (H, 3 * W)
    g2, d2 = jax.jit(lambda p: dt.unpack_frame(p, W))(packed)
    assert np.array_equal(np.asarray(g2), np.round(gray))
    # depth quantization: 1/5000 m steps
    assert np.max(np.abs(np.asarray(d2) - depth)) <= 0.6 / dt.DEPTH_QUANT
    assert np.all(np.asarray(d2)[depth == 0] == 0)


@pytest.fixture(scope="module")
def chunked_run(small_cfg):
    seq = SyntheticSequence(n_frames=13, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False, chunk=4)
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.shutdown()
    return seq, sys


def test_chunked_all_frames_recorded(chunked_run):
    seq, sys = chunked_run
    recs = sys.tracker.records
    assert len(recs) == len(seq)
    assert sum(not r.lost for r in recs) == len(seq)


def test_chunked_ate(chunked_run, tmp_path):
    seq, sys = chunked_run
    est = tmp_path / "est.txt"
    sys.save_trajectory_tum(str(est))
    ts, pos, _ = traj_io.load_trajectory_tum(str(est))
    gt_rows = seq.gt_rows()
    ate = traj_io.ate_rmse(
        (ts, pos),
        (np.array([r[0] for r in gt_rows]), np.array([r[1] for r in gt_rows])),
    )
    assert ate < 0.05, f"chunked ATE {ate:.4f}"


def test_chunked_builds_map(chunked_run):
    seq, sys = chunked_run
    assert sys.map.n_kf >= 1
    assert sys.map.mp_valid.sum() > 50


def test_chunked_flush_partial(small_cfg):
    """A partial trailing chunk is flushed and recorded."""
    seq = SyntheticSequence(n_frames=6, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False, chunk=4)
    for i in range(6):  # 1 init + 4 chunk + 1 leftover
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    assert len(sys.tracker.records) == 5
    sys.shutdown()
    assert len(sys.tracker.records) == 6


def test_incremental_view_matches_full_rebuild(small_cfg):
    """After tracking with keyframe events, the incrementally-updated
    device view must equal a from-scratch upload of the same map."""
    import jax

    seq = SyntheticSequence(n_frames=8, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False)
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    tr = sys.tracker
    # force some more map mutations through the incremental path
    rng = np.random.default_rng(0)
    sys.map.add_points(
        rng.uniform(-2, 2, (17, 3)).astype(np.float32),
        rng.integers(0, 2**32, (17, 8), dtype=np.uint32).astype(np.uint32),
        np.tile(np.float32([0, 0, 1]), (17, 1)),
        np.zeros(17, np.float32), np.full(17, 9.0, np.float32),
        np.zeros(17, np.int32), 0,
    )
    tr.reg2[3, 4] = tr.reg2[4, 3] = 0
    tr.refresh_view()
    fresh = dt.build_host_view(
        small_cfg, sys.map, tr.reg2, tr.reg3, tr.ref_kf
    )
    live = jax.device_get(tr.view)
    for k in fresh:
        assert np.array_equal(np.asarray(live[k]), fresh[k]), k


def test_chunked_pipelined_bench_config(small_cfg):
    """The exact bench.py configuration (fast + pipeline + chunk) tracks a
    sequence end-to-end through flush()."""
    seq = SyntheticSequence(n_frames=13, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, pipeline=True, chunk=4,
                 enable_surfels=False)
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    sys.shutdown()
    recs = sys.tracker.records
    assert len(recs) == len(seq)
    assert sum(not r.lost for r in recs) >= len(seq) - 1
    assert sys.map.n_kf >= 1


def test_chunked_midchunk_loss_recovery(small_cfg):
    """A mid-chunk tracking loss followed by a successful relocalization
    must re-run the remaining frames of the chunk with the reset carry:
    recovery costs one frame (the lost one), and the frames after it are
    recorded from post-reloc tracking, not from the stale pre-reloc scan
    (the reference relocalizes per frame, Tracking.cc:410)."""
    import jax.numpy as jnp

    from manhattanslam_tpu.geometry import se3

    seq = SyntheticSequence(n_frames=13, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False,
                 enable_planes=False, enable_lines=False, chunk=4)
    for i in range(9):  # 1 init + 2 chunks
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    tr = sys.tracker
    m = sys.map
    assert tr.reloc_module is not None

    # avoid the <=5-keyframe auto reset (Tracking.cc:517-523)
    while m.n_kf <= 5:
        feats0 = {
            "xy_und": m.kf_xy[0], "u_right": m.kf_uright[0],
            "depth": m.kf_depth[0], "level": m.kf_level[0],
            "angle": m.kf_angle[0], "desc": m.kf_desc[0],
            "valid": m.kf_kp_valid[0],
        }
        kf = m.add_keyframe(m.kf_pose[0], 0.01 * m.n_kf, 0, feats0)
        m.set_kf_matches(kf, m.kf_mp_idx[0])
        tr.reloc_module.add_keyframe(kf)

    # "teleport": the reference keyframe the device fallback searches no
    # longer overlaps the view (zeroed ref banks), so on-device tracking
    # must fail and the reloc module (which searches ALL keyframes) must
    # recover the pose
    tr.view = dict(tr.view)
    tr.view["ref_mp"] = jnp.full_like(tr.view["ref_mp"], -1)
    if tr._shadow is not None:
        tr._shadow["ref_mp"] = np.full_like(tr._shadow["ref_mp"], -1)

    rng = np.random.default_rng(0)
    noise_g = rng.uniform(0, 255, seq.frame(0)[1].shape).astype(np.float32)
    noise_d = rng.uniform(0.5, 6.0, seq.frame(0)[2].shape).astype(np.float32)

    n_before = len(tr.records)
    # chunk = [noise (forced loss), then three mapped viewpoints]
    frames = [(100.0, noise_g, noise_d)]
    for i in (1, 2, 3):
        t, gray, depth = seq.frame(i)
        frames.append((100.0 + 0.1 * i, gray, depth))
    for t, gray, depth in frames:
        sys.track(gray, depth, t)
    sys.shutdown()

    recs = tr.records[n_before:]
    assert len(recs) == 4
    assert recs[0].lost  # the noise frame
    # every frame after the loss is recorded as tracked (replayed with the
    # post-reloc carry), i.e. recovery latency is exactly the lost frame
    assert all(not r.lost for r in recs[1:]), [r.lost for r in recs]
    # and the recovered poses are correct, not stale-garbage: compare the
    # recorded camera centers against ground truth (tracker world =
    # camera-0 frame; seq.poses are camera-to-world in room coords)
    rows = tr.trajectory_rows()
    # trajectory_rows skips lost records; the noise frame drops out, so
    # the last 3 rows are the recovered frames
    rows = rows[-3:]
    T0_inv = np.linalg.inv(seq.poses[0])
    for (ts, t_wc, q), i in zip(rows, (1, 2, 3)):
        c_gt = (T0_inv @ seq.poses[i])[:3, 3]
        assert np.linalg.norm(t_wc - c_gt) < 0.08, (i, t_wc, c_gt)
