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
