import numpy as np

from manhattanslam_tpu.io import trajectory as traj


def test_tum_format_precision(tmp_path):
    rows = [(1305031102.175304, np.array([0.1, -0.2, 0.3]), np.array([0.0, 0.0, 0.0, 1.0]))]
    p = tmp_path / "t.txt"
    traj.save_trajectory_tum(str(p), rows)
    line = p.read_text().strip()
    parts = line.split()
    assert parts[0] == "1305031102.175304"
    assert parts[1] == "0.100000000"  # 9 decimals (System.cc:234)
    assert len(parts) == 8
    traj.save_keyframe_trajectory_tum(str(p), rows)
    assert p.read_text().strip().split()[1] == "0.1000000"  # 7 decimals


def test_ate_rmse_identity():
    ts = np.arange(10, dtype=np.float64) * 0.1
    pos = np.cumsum(np.ones((10, 3)) * 0.01, axis=0)
    assert traj.ate_rmse((ts, pos), (ts, pos)) < 1e-9


def test_ate_rmse_alignment_invariance(rng):
    # ATE after Horn alignment is invariant to a rigid transform of the estimate
    ts = np.arange(50, dtype=np.float64) * 0.1
    pos = rng.normal(size=(50, 3))
    import jax.numpy as jnp
    from manhattanslam_tpu.geometry import se3

    R = np.asarray(se3.exp_so3(jnp.array([0.1, 0.4, -0.2])))
    moved = pos @ R.T + np.array([1.0, 2.0, 3.0])
    assert traj.ate_rmse((ts, moved), (ts, pos)) < 1e-6


def test_ate_rmse_detects_error(rng):
    ts = np.arange(50, dtype=np.float64) * 0.1
    pos = np.cumsum(rng.normal(size=(50, 3)) * 0.05, axis=0)
    noisy = pos + rng.normal(size=(50, 3)) * 0.1
    e = traj.ate_rmse((ts, noisy), (ts, pos))
    assert 0.01 < e < 0.5


def test_synthetic_sequence_renders(synthetic_seq):
    t, gray, depth = synthetic_seq.frame(0)
    assert gray.shape == (144, 192)
    assert depth.shape == (144, 192)
    assert (depth > 0).mean() > 0.95  # room fully encloses the camera
    assert gray.std() > 20  # textured
    # depth is consistent with room scale
    assert 0.1 < depth[depth > 0].min() < depth.max() < 12.0


def test_synthetic_gt_rows(synthetic_seq):
    rows = synthetic_seq.gt_rows()
    assert len(rows) == len(synthetic_seq)
    t, p, q = rows[0]
    assert abs(np.linalg.norm(q) - 1) < 1e-5
