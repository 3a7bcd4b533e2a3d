import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.mapping import triangulation as tri
from manhattanslam_tpu.system import System

K = jnp.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], jnp.float32)


def make_kp_view(xy, desc, level=None):
    n = xy.shape[0]
    return {
        "xy": jnp.asarray(xy),
        "desc": jnp.asarray(desc),
        "valid": jnp.ones(n, bool),
        "level": jnp.asarray(level if level is not None else np.zeros(n, np.int32)),
        "depth": jnp.zeros(n),
        "inv_sigma2": jnp.ones(n),
    }


def test_triangulation_recovers_points(rng):
    from manhattanslam_tpu.geometry import se3

    pts = rng.uniform([-2, -2, 3], [2, 2, 8], (64, 3)).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(
        se3.exp_se3(jnp.array([0.3, 0.0, 0.0, 0.0, 0.02, 0.0], jnp.float32))
    )

    def project(T, p):
        pc = p @ T[:3, :3].T + T[:3, 3]
        return np.stack(
            [pc[:, 0] / pc[:, 2] * 300 + 160, pc[:, 1] / pc[:, 2] * 300 + 120], -1
        )

    xy1 = project(T1, pts)
    xy2 = project(T2, pts)
    desc = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
    out = tri.triangulate_pair(
        make_kp_view(xy1, desc), make_kp_view(xy2, desc),
        jnp.asarray(T1), jnp.asarray(T2), K, jnp.float32(1.2),
    )
    ok = np.asarray(out["ok"])
    assert ok.mean() > 0.8
    rec = np.asarray(out["pos_w"])[ok]
    np.testing.assert_allclose(rec, pts[ok], atol=0.02)
    # identical descriptors -> idx2 == identity on ok entries
    np.testing.assert_array_equal(np.asarray(out["idx2"])[ok], np.nonzero(ok)[0])


def test_triangulation_rejects_zero_baseline(rng):
    pts = rng.uniform([-2, -2, 3], [2, 2, 8], (32, 3)).astype(np.float32)
    T1 = np.eye(4, dtype=np.float32)

    def project(T, p):
        pc = p @ T[:3, :3].T + T[:3, 3]
        return np.stack(
            [pc[:, 0] / pc[:, 2] * 300 + 160, pc[:, 1] / pc[:, 2] * 300 + 120], -1
        )

    xy = project(T1, pts)
    desc = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
    out = tri.triangulate_pair(
        make_kp_view(xy, desc), make_kp_view(xy, desc),
        jnp.asarray(T1), jnp.asarray(T1), K, jnp.float32(1.2),
    )
    # no parallax -> nothing accepted
    assert np.asarray(out["ok"]).sum() == 0


def test_fundamental_matrix_epipolar_constraint(rng):
    from manhattanslam_tpu.geometry import se3

    T1 = np.eye(4, dtype=np.float32)
    T2 = np.asarray(
        se3.exp_se3(jnp.array([0.2, -0.1, 0.05, 0.03, 0.01, -0.02], jnp.float32))
    )
    F = np.asarray(tri.fundamental_matrix(jnp.asarray(T1), jnp.asarray(T2), K))
    pts = rng.uniform([-1, -1, 3], [1, 1, 6], (20, 3)).astype(np.float32)

    def project_h(T, p):
        pc = p @ T[:3, :3].T + T[:3, 3]
        uv = np.stack(
            [pc[:, 0] / pc[:, 2] * 300 + 160, pc[:, 1] / pc[:, 2] * 300 + 120], -1
        )
        return np.concatenate([uv, np.ones((len(uv), 1))], -1)

    x1 = project_h(T1, pts)
    x2 = project_h(T2, pts)
    resid = np.abs(np.einsum("ni,ij,nj->n", x1, F, x2))
    # normalize by line magnitude for a pixel-scale residual
    l2 = x1 @ F
    resid = resid / np.linalg.norm(l2[:, :2], axis=1)
    assert resid.max() < 0.1


@pytest.fixture(scope="module")
def mapped(small_cfg):
    seq = SyntheticSequence(n_frames=14, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, enable_planes=True, enable_lines=False,
                 enable_surfels=False)
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    return seq, sys


def test_local_mapper_runs_and_map_consistent(mapped):
    seq, sys = mapped
    m = sys.map
    assert sys.local_mapper is not None
    # all KF->mp references point to valid points
    ids = m.kf_mp_idx[: m.n_kf]
    live = ids[ids >= 0]
    assert m.mp_valid[live].all()
    # covisibility symmetric
    np.testing.assert_array_equal(m.covis, m.covis.T)


def test_tracking_unaffected_by_mapper(mapped, tmp_path):
    from manhattanslam_tpu.io import trajectory as traj_io

    seq, sys = mapped
    est = tmp_path / "est.txt"
    sys.save_trajectory_tum(str(est))
    ts, pos, _ = traj_io.load_trajectory_tum(str(est))
    gt_rows = seq.gt_rows()
    ate = traj_io.ate_rmse(
        (ts, pos),
        (np.array([r[0] for r in gt_rows]), np.array([r[1] for r in gt_rows])),
    )
    assert ate < 0.05
