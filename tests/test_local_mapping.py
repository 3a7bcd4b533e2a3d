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


def test_two_hop_bidirectional_fusion(small_cfg, rng):
    """SearchInNeighbors parity (LocalMapping.cc:536-601): a duplicate
    landmark observed only by a SECOND-degree covisibility neighbor must
    still be merged when fusing the current keyframe."""
    from manhattanslam_tpu.mapping.local_mapping import LocalMapper
    from manhattanslam_tpu.slam_map import SlamMap

    cfg = small_cfg
    m = SlamMap(cfg)
    mapper = LocalMapper(cfg, m)
    cam = cfg.camera
    Kc = np.asarray(cfg.camera.K)
    NKP = cfg.caps.max_keypoints

    # 40 world points in view of three cameras on a tiny baseline
    pts = rng.uniform([-0.6, -0.4, 2.0], [0.6, 0.4, 3.0], (40, 3)).astype(
        np.float32
    )
    descs = rng.integers(0, 2**32, (40, 8), dtype=np.uint32)
    poses = []
    for dx in (0.0, 0.05, 0.10):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -dx
        poses.append(T)

    def feats_for(T):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        uv = np.zeros((NKP, 2), np.float32)
        uv[:40, 0] = pc[:, 0] / pc[:, 2] * Kc[0, 0] + Kc[0, 2]
        uv[:40, 1] = pc[:, 1] / pc[:, 2] * Kc[1, 1] + Kc[1, 2]
        d = np.zeros((NKP, 8), np.uint32)
        d[:40] = descs
        valid = np.zeros(NKP, bool)
        valid[:40] = True
        return {
            "xy_und": uv,
            "u_right": np.full(NKP, -1.0, np.float32),
            "depth": np.zeros(NKP, np.float32),
            "level": np.zeros(NKP, np.int32),
            "angle": np.zeros(NKP, np.float32),
            "desc": d,
            "valid": valid,
        }

    kfs = [m.add_keyframe(poses[i], float(i), i, feats_for(poses[i]))
           for i in range(3)]
    A, B, C = kfs

    ids_ab = m.add_points(
        pts[:20], descs[:20], np.zeros((20, 3), np.float32),
        np.full(20, 0.1, np.float32), np.full(20, 10.0, np.float32),
        np.zeros(20, np.int32), A,
    )
    ids_bc = m.add_points(
        pts[20:], descs[20:], np.zeros((20, 3), np.float32),
        np.full(20, 0.1, np.float32), np.full(20, 10.0, np.float32),
        np.zeros(20, np.int32), B,
    )
    # duplicates of the first 20 landmarks, observed ONLY by C
    dup = m.add_points(
        pts[:20], descs[:20], np.zeros((20, 3), np.float32),
        np.full(20, 0.1, np.float32), np.full(20, 10.0, np.float32),
        np.zeros(20, np.int32), C,
    )

    assoc = np.full((3, NKP), -1, np.int64)
    assoc[0, :20] = ids_ab                 # A: originals
    assoc[1, :20] = ids_ab                 # B: shares A's originals...
    assoc[1, 20:40] = ids_bc               # ...and the B-C set
    assoc[2, 20:40] = ids_bc               # C: shares with B
    assoc[2, :20] = dup                    # ...plus the duplicates
    for kf, a in zip(kfs, assoc):
        m.set_kf_matches(kf, a)

    # A and C share no landmarks: not first-order covisible
    assert C not in set(int(k) for k in m.covisible_kfs(A))
    assert B in set(int(k) for k in m.covisible_kfs(A))

    mapper.fuse_neighbors(A)

    # the duplicates (1 obs each) lost to the originals (2 obs each)
    assert not m.mp_valid[dup].any(), "two-hop duplicates not merged"
    # C now observes the original landmarks at those keypoints
    np.testing.assert_array_equal(m.kf_mp_idx[C, :20], ids_ab)
