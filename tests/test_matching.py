import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.ops import matching, orb as orb_ops


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))


def test_hamming_matrix_equals_popcount(rng):
    a, b = rand_desc(rng, 17), rand_desc(rng, 23)
    mat = np.asarray(matching.hamming_matrix(a, b))
    ref = np.asarray(
        orb_ops.hamming_distance(jnp.asarray(a)[:, None, :], jnp.asarray(b)[None, :, :])
    )
    np.testing.assert_array_equal(mat.astype(int), ref)


def test_match_descriptors_identity(rng):
    d = rand_desc(rng, 30)
    valid = jnp.ones(30, bool)
    idx, dist, ok = matching.match_descriptors(d, d, valid, valid, max_dist=10)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(30))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(dist), 0)


def test_match_descriptors_respects_validity(rng):
    d = rand_desc(rng, 10)
    va = jnp.ones(10, bool).at[3].set(False)
    vb = jnp.ones(10, bool).at[7].set(False)
    idx, dist, ok = matching.match_descriptors(d, d, va, vb, max_dist=10)
    ok = np.asarray(ok)
    assert not ok[3]  # invalid query
    assert not ok[7]  # its only zero-distance target is invalid (random ~128 bits away)


def test_resolve_one_to_one():
    kp_idx = jnp.array([5, 5, 2, 5])
    dist = jnp.array([10.0, 4.0, 1.0, 30.0])
    valid = jnp.ones(4, bool)
    keep = np.asarray(matching.resolve_one_to_one(kp_idx, dist, valid, 8))
    np.testing.assert_array_equal(keep, [False, True, True, False])


def test_rotation_consistency(rng):
    n = 100
    # 90 matches consistent at +0.3 rad, 10 scattered
    a = jnp.asarray(rng.uniform(0, 2 * np.pi, n).astype(np.float32))
    b = a - 0.3
    b = b.at[:10].set(jnp.asarray(rng.uniform(0, 2 * np.pi, 10).astype(np.float32)))
    valid = jnp.ones(n, bool)
    keep = np.asarray(matching.rotation_consistency_mask(a, b, valid))
    assert keep[10:].mean() > 0.95  # consistent kept
    assert keep[:10].mean() < 0.5  # outliers mostly dropped


def test_search_by_projection_synthetic(rng):
    # build a fake frame whose keypoints are exact projections of world points
    n = 50
    pts_w = rng.uniform([-2, -2, 2], [2, 2, 6], (n, 3)).astype(np.float32)
    K = jnp.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], jnp.float32)
    T = jnp.eye(4)
    uv, z = matching.project_points(T, jnp.asarray(pts_w), K)
    descs = rand_desc(rng, n)
    feats = {
        "xy_und": uv,
        "desc": descs,
        "valid": jnp.ones(n, bool),
        "level": jnp.zeros(n, jnp.int32),
    }
    out = matching.search_by_projection(
        jnp.asarray(pts_w), descs, jnp.ones(n, bool), T, feats, K, (240, 320),
        radius=5.0,
    )
    v = np.asarray(out["valid"])
    in_img = np.asarray(
        (uv[:, 0] >= 0) & (uv[:, 0] < 320) & (uv[:, 1] >= 0) & (uv[:, 1] < 240)
    )
    assert (v == in_img).mean() > 0.95
    idx = np.asarray(out["kp_idx"])
    np.testing.assert_array_equal(idx[v], np.arange(n)[v])


def test_predict_scale_level():
    lvl = matching.predict_scale_level(
        jnp.array([1.0, 0.5, 0.25]), jnp.array([1.0, 1.0, 1.0]), 1.2, 8
    )
    out = np.asarray(lvl)
    assert out[0] == 0
    assert out[1] > out[0]
    assert out[2] > out[1]
