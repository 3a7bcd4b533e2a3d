import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.ops import ransac_pose
from manhattanslam_tpu.system import System


def test_kabsch_exact(rng):
    from manhattanslam_tpu.geometry import se3

    A = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    T = se3.exp_se3(jnp.array([0.2, -0.4, 0.1, 0.3, -0.2, 0.5], jnp.float32))
    B = se3.transform_points(T, A)
    R, t = ransac_pose.kabsch(A, B)
    np.testing.assert_allclose(np.asarray(R), np.asarray(T[:3, :3]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(T[:3, 3]), atol=1e-5)


def test_pose_ransac_with_outliers(rng):
    from manhattanslam_tpu.geometry import se3

    K = jnp.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], jnp.float32)
    T = se3.exp_se3(jnp.array([0.3, 0.1, -0.2, 0.1, -0.05, 0.2], jnp.float32))
    n = 80
    pw = jnp.asarray(rng.uniform([-2, -2, 2], [2, 2, 6], (n, 3)).astype(np.float32))
    pc = se3.transform_points(T, pw)
    # 30% outliers in the camera-frame points
    n_out = 24
    pc = pc.at[:n_out].add(
        jnp.asarray(rng.uniform(0.5, 2.0, (n_out, 3)).astype(np.float32))
    )
    uv = np.asarray(pc)
    uv = np.stack(
        [uv[:, 0] / uv[:, 2] * 300 + 160, uv[:, 1] / uv[:, 2] * 300 + 120], -1
    )
    # observations come from the TRUE pose (so outlier rows are wrong)
    pct = np.asarray(se3.transform_points(T, pw))
    uv_true = np.stack(
        [pct[:, 0] / pct[:, 2] * 300 + 160, pct[:, 1] / pct[:, 2] * 300 + 120], -1
    )
    out = ransac_pose.pose_ransac_3d3d(
        pw, pc, jnp.asarray(uv_true.astype(np.float32)),
        jnp.ones(n, bool), K, jax.random.PRNGKey(0),
    )
    assert bool(out["ok"])
    assert int(out["n_inliers"]) >= n - n_out - 5
    np.testing.assert_allclose(np.asarray(out["R"]), np.asarray(T[:3, :3]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["t"]), np.asarray(T[:3, 3]), atol=2e-2)


def test_bow_similarity(small_cfg, rng):
    from manhattanslam_tpu.reloc.relocalizer import Relocalizer
    from manhattanslam_tpu.slam_map import SlamMap

    m = SlamMap(small_cfg)
    r = Relocalizer(small_cfg, m)
    d1 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    v = jnp.ones(256, bool)
    b1 = r.compute_bow(d1, v)
    b1b = r.compute_bow(d1, v)
    b2 = r.compute_bow(d2, v)
    np.testing.assert_array_equal(b1, b1b)
    # same descriptors -> max similarity; different -> lower
    assert b1 @ b1 > b1 @ b2


def test_relocalization_after_loss(small_cfg):
    """Track, cut to a far frame (forced loss), verify reloc recovers when
    revisiting a mapped view."""
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera)
    sys = System(small_cfg, enable_planes=False, enable_lines=False,
                 enable_surfels=False)
    for i in range(6):
        t, gray, depth = seq.frame(i)
        assert sys.track(gray, depth, t) is not None
    assert sys.tracker.reloc_module is not None

    # losing with <=5 keyframes triggers the reference's automatic reset
    # (Tracking.cc:517-523) instead of relocalization — pad the map with
    # clones of keyframe 0 so the reloc path is exercised
    m = sys.map
    while m.n_kf <= 5:
        feats0 = {
            "xy_und": m.kf_xy[0], "u_right": m.kf_uright[0],
            "depth": m.kf_depth[0], "level": m.kf_level[0],
            "angle": m.kf_angle[0], "desc": m.kf_desc[0],
            "valid": m.kf_kp_valid[0],
        }
        kf = m.add_keyframe(m.kf_pose[0], 0.01 * m.n_kf, 0, feats0)
        m.set_kf_matches(kf, m.kf_mp_idx[0])
        sys.tracker.reloc_module.add_keyframe(kf)

    # force loss: inject an unmatched frame (pure noise)
    rng = np.random.default_rng(0)
    noise = rng.uniform(0, 255, gray.shape).astype(np.float32)
    nd = rng.uniform(0.5, 6.0, depth.shape).astype(np.float32)
    sys.track(noise, nd, 0.55)
    assert sys.tracker.state == "LOST"

    # revisit a mapped viewpoint -> must relocalize within a few frames
    recovered = False
    for i in range(5, -1, -1):
        t, gray, depth = seq.frame(i)
        if sys.track(gray, depth, 0.6 + 0.03 * i) is not None:
            recovered = True
            break
    assert recovered, "relocalization failed"
    assert sys.tracker.state == "OK"


def test_auto_reset_on_early_loss(small_cfg):
    """Losing tracking with <=5 keyframes resets the whole system
    (Tracking.cc:517-523) and it re-initializes on the next good frame."""
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera)
    sys = System(small_cfg, enable_planes=False, enable_lines=False,
                 enable_surfels=False)
    for i in range(4):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    assert 1 <= sys.map.n_kf <= 5
    rng = np.random.default_rng(1)
    noise = rng.uniform(0, 255, gray.shape).astype(np.float32)
    nd = rng.uniform(0.5, 6.0, depth.shape).astype(np.float32)
    assert sys.track(noise, nd, 0.5) is None
    # reset happened: fresh map, tracker reinitializes on the next frame
    assert sys.map.n_kf == 0
    assert sys.tracker.state == "NOT_INITIALIZED"
    t, gray, depth = seq.frame(4)
    assert sys.track(gray, depth, 0.6) is not None
    assert sys.map.n_kf == 1


def test_epnp_exact(rng):
    from manhattanslam_tpu.geometry import se3

    K = jnp.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], jnp.float32)
    T = se3.exp_se3(jnp.array([0.3, 0.1, -0.2, 0.1, -0.05, 0.2], jnp.float32))
    pw = jnp.asarray(rng.uniform([-2, -2, 2], [2, 2, 6], (12, 3)).astype(np.float32))
    pc = np.asarray(se3.transform_points(T, pw))
    uv = np.stack(
        [pc[:, 0] / pc[:, 2] * 300 + 160, pc[:, 1] / pc[:, 2] * 300 + 120], -1
    ).astype(np.float32)
    R, t = ransac_pose.epnp(pw, jnp.asarray(uv), K)
    np.testing.assert_allclose(np.asarray(R), np.asarray(T[:3, :3]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), np.asarray(T[:3, 3]), atol=5e-2)


def test_pose_ransac_pnp_with_outliers(rng):
    from manhattanslam_tpu.geometry import se3

    K = jnp.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], jnp.float32)
    T = se3.exp_se3(jnp.array([-0.2, 0.15, 0.1, 0.2, 0.1, -0.3], jnp.float32))
    n = 80
    pw = jnp.asarray(rng.uniform([-2, -2, 2], [2, 2, 6], (n, 3)).astype(np.float32))
    pc = np.asarray(se3.transform_points(T, pw))
    uv = np.stack(
        [pc[:, 0] / pc[:, 2] * 300 + 160, pc[:, 1] / pc[:, 2] * 300 + 120], -1
    )
    # 30% outlier observations
    n_out = 24
    uv[:n_out] += rng.uniform(30, 120, (n_out, 2))
    out = ransac_pose.pose_ransac_pnp(
        pw, jnp.asarray(uv.astype(np.float32)), jnp.ones(n, bool), K,
        jax.random.PRNGKey(3),
    )
    assert bool(out["ok"])
    assert int(out["n_inliers"]) >= n - n_out - 5
    np.testing.assert_allclose(np.asarray(out["R"]), np.asarray(T[:3, :3]), atol=5e-3)
    np.testing.assert_allclose(np.asarray(out["t"]), np.asarray(T[:3, 3]), atol=5e-2)


def test_relocalization_with_depth_holes(small_cfg):
    """Reloc must succeed on a frame whose depth is holed out (no valid
    depth anywhere): the depthless EPnP path (PnPsolver.h:60-200 role)
    takes over from 3D-3D Kabsch."""
    seq = SyntheticSequence(n_frames=12, cam=small_cfg.camera)
    sys = System(small_cfg, enable_planes=False, enable_lines=False,
                 enable_surfels=False)
    for i in range(6):
        t, gray, depth = seq.frame(i)
        assert sys.track(gray, depth, t) is not None
    m = sys.map
    while m.n_kf <= 5:
        feats0 = {
            "xy_und": m.kf_xy[0], "u_right": m.kf_uright[0],
            "depth": m.kf_depth[0], "level": m.kf_level[0],
            "angle": m.kf_angle[0], "desc": m.kf_desc[0],
            "valid": m.kf_kp_valid[0],
        }
        kf = m.add_keyframe(m.kf_pose[0], 0.01 * m.n_kf, 0, feats0)
        m.set_kf_matches(kf, m.kf_mp_idx[0])
        sys.tracker.reloc_module.add_keyframe(kf)

    rng = np.random.default_rng(0)
    noise = rng.uniform(0, 255, gray.shape).astype(np.float32)
    nd = rng.uniform(0.5, 6.0, depth.shape).astype(np.float32)
    sys.track(noise, nd, 0.55)
    assert sys.tracker.state == "LOST"

    # revisit mapped viewpoints with the ENTIRE depth image holed out
    recovered = False
    for i in range(5, -1, -1):
        t, gray, depth = seq.frame(i)
        holed = np.zeros_like(depth)
        if sys.track(gray, holed, 0.6 + 0.03 * i) is not None:
            recovered = True
            break
    assert recovered, "depthless relocalization failed"
    assert sys.tracker.state == "OK"
