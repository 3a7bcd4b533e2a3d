import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.geometry import se3


def random_rotation(rng):
    w = rng.normal(size=3).astype(np.float32)
    return np.asarray(se3.exp_so3(jnp.asarray(w)))


def test_exp_log_so3_roundtrip(rng):
    for _ in range(10):
        w = rng.normal(size=3).astype(np.float32) * 0.8
        R = se3.exp_so3(jnp.asarray(w))
        w2 = se3.log_so3(R)
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-4)


def test_exp_so3_small_angle():
    w = jnp.array([1e-9, 0.0, 0.0])
    R = se3.exp_so3(w)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_exp_se3_inverse(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.5
    T = se3.exp_se3(jnp.asarray(xi))
    Ti = se3.inverse(T)
    np.testing.assert_allclose(np.asarray(T @ Ti), np.eye(4), atol=1e-5)


def test_quat_roundtrip(rng):
    for _ in range(20):
        R = random_rotation(rng)
        q = se3.rotmat_to_quat(jnp.asarray(R))
        R2 = se3.quat_to_rotmat(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_project_backproject(rng):
    K = jnp.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    pts = jnp.asarray(rng.uniform(0.5, 5.0, size=(50, 3)).astype(np.float32))
    uv = se3.project(K, pts)
    back = se3.backproject(K, uv, pts[:, 2])
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_transform_plane(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.3
    T = se3.exp_se3(jnp.asarray(xi))
    # plane through 3 points
    pts = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
    n = jnp.cross(pts[1] - pts[0], pts[2] - pts[0])
    n = n / jnp.linalg.norm(n)
    pi = jnp.concatenate([n, -jnp.dot(n, pts[0])[None]])
    pts_t = se3.transform_points(T, pts)
    pi_t = se3.transform_plane(T, pi)
    resid = pts_t @ pi_t[:3] + pi_t[3]
    np.testing.assert_allclose(np.asarray(resid), 0, atol=1e-4)


def test_orthonormalize(rng):
    R = random_rotation(rng)
    noisy = R + rng.normal(size=(3, 3)).astype(np.float32) * 0.01
    R2 = np.asarray(se3.orthonormalize(jnp.asarray(noisy)))
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R2) > 0.9


def test_devices_virtual_mesh():
    import jax

    assert len(jax.devices()) == 8
