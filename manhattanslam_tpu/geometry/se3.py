"""SE(3) / SO(3) operations in pure JAX.

Replaces the reference's scattered cv::Mat pose algebra and
g2o::SE3Quat (Converter.cc:26-113).  All functions are jit/vmap friendly,
operate on float32 arrays, and use the convention of the reference:
``Tcw`` maps world -> camera, stored as a 4x4 row-major matrix.

Quaternions are Hamilton, stored (qx, qy, qz, qw) to match the TUM
trajectory format (System.cc:234-235).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so(3) hat operator: (…,3) -> (…,3,3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], -1),
            jnp.stack([wz, z, -wx], -1),
            jnp.stack([-wy, wx, z], -1),
        ],
        -2,
    )


def exp_so3(w):
    """Rodrigues exponential: (…,3) -> (…,3,3)."""
    theta2 = jnp.sum(w * w, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(w)
    W2 = W @ W
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    # Taylor fallback near zero
    small = theta2[..., 0, 0][..., None, None] < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, a)
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def log_so3(R):
    """SO(3) log map: (…,3,3) -> (…,3)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    w_hat = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    scale = jnp.where(theta < 1e-6, 1.0 + theta**2 / 6.0, theta / jnp.sin(theta).clip(1e-12))
    return w_hat * scale[..., None]


def exp_se3(xi):
    """se(3) exponential.  xi = (…,6) as (rho, phi) = (trans, rot) -> (…,4,4).

    Uses the g2o ordering (translation first is *not* g2o; g2o SE3Quat::exp
    takes (omega, upsilon)).  We fix (upsilon=xi[:3], omega=xi[3:]) i.e.
    translation-first, and document it; only internal consistency matters.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    theta2 = jnp.sum(phi * phi, -1, keepdims=True)[..., None]
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = hat(phi)
    W2 = W @ W
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta).clip(_EPS * _EPS * _EPS)
    small = theta2[..., 0, 0][..., None, None] < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, b)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b * W + c * W2
    t = (V @ rho[..., None])[..., 0]
    return make_T(R, t)


def make_T(R, t):
    """Assemble (…,4,4) from (…,3,3) and (…,3).

    Built with concatenates — static .at[].set updates still lower to
    scatters on TPU, and this runs inside every LM tangent evaluation."""
    batch = R.shape[:-2]
    top = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot(T):
    return T[..., :3, :3]


def trans(T):
    return T[..., :3, 3]


def inverse(T):
    """Rigid-transform inverse: (…,4,4) -> (…,4,4)."""
    R = rot(T)
    t = trans(T)
    Rt = jnp.swapaxes(R, -1, -2)
    return make_T(Rt, -(Rt @ t[..., None])[..., 0])


def compose(A, B):
    return A @ B


def transform_points(T, pts):
    """Apply (4,4) transform to (…,3) points."""
    return pts @ rot(T).T + trans(T)


def transform_dirs(T, d):
    return d @ rot(T).T


def transform_plane(T, pi):
    """Transform Hesse plane coeffs (…,4) by point transform ``T``.

    If points map as x' = T x, planes map as pi' = T^{-T} pi.
    (Reference plane updates in Frame::ComputePlanes use Tcw^T * world.)
    """
    Tinv = inverse(T)
    return pi @ Tinv  # pi' = Tinv^T applied on the right: (pi^T Tinv)^T
    # note: pi @ Tinv == (Tinv^T @ pi^T)^T for the row-vector convention


def rotmat_to_quat(R):
    """Rotation matrix -> quaternion (qx,qy,qz,qw), Shepperd's method.

    Matches Eigen::Quaternion(R) up to sign; normalized, qw >= 0 is NOT
    enforced (TUM tooling is sign-agnostic).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case_w():
        s = jnp.sqrt(jnp.clip(tr + 1.0, _EPS)) * 2.0
        return jnp.stack([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s], -1)

    def case_x():
        s = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.stack([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s], -1)

    def case_y():
        s = jnp.sqrt(jnp.clip(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.stack([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s], -1)

    def case_z():
        s = jnp.sqrt(jnp.clip(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.stack([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s], -1)

    qw, qx, qy, qz = case_w(), case_x(), case_y(), case_z()
    use_w = tr > 0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = jnp.where(
        use_w[..., None],
        qw,
        jnp.where(use_x[..., None], qx, jnp.where(use_y[..., None], qy, qz)),
    )
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def rotmat_to_quat_np(R: "np.ndarray") -> "np.ndarray":
    """Numpy rotmat_to_quat (batched): export paths convert hundreds of
    poses per save; a per-pose device dispatch costs a tunnel roundtrip
    each on remote backends."""
    import numpy as np

    R = np.asarray(R, np.float64)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    eps = 1e-12

    sw = np.sqrt(np.clip(tr + 1.0, eps, None)) * 2.0
    qw = np.stack(
        [(m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw, 0.25 * sw], -1
    )
    sx = np.sqrt(np.clip(1.0 + m00 - m11 - m22, eps, None)) * 2.0
    qx = np.stack(
        [0.25 * sx, (m01 + m10) / sx, (m02 + m20) / sx, (m21 - m12) / sx], -1
    )
    sy = np.sqrt(np.clip(1.0 + m11 - m00 - m22, eps, None)) * 2.0
    qy = np.stack(
        [(m01 + m10) / sy, 0.25 * sy, (m12 + m21) / sy, (m02 - m20) / sy], -1
    )
    sz = np.sqrt(np.clip(1.0 + m22 - m00 - m11, eps, None)) * 2.0
    qz = np.stack(
        [(m02 + m20) / sz, (m12 + m21) / sz, 0.25 * sz, (m10 - m01) / sz], -1
    )
    use_w = tr > 0
    use_x = (~use_w) & (m00 >= m11) & (m00 >= m22)
    use_y = (~use_w) & (~use_x) & (m11 >= m22)
    q = np.where(
        use_w[..., None],
        qw,
        np.where(use_x[..., None], qx, np.where(use_y[..., None], qy, qz)),
    )
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_rotmat(q):
    """(qx,qy,qz,qw) -> rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = 2.0 / jnp.clip(n, _EPS)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        -2,
    )


def project(K, pts_cam):
    """Pinhole projection of camera-frame points (…,3) -> pixel (…,2)."""
    z = pts_cam[..., 2:3]
    uv = pts_cam[..., :2] / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([uv[..., 0] * fx + cx, uv[..., 1] * fy + cy], -1)


def backproject(K, uv, depth):
    """Pixel (…,2) + depth (…,) -> camera-frame points (…,3)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uv[..., 0] - cx) / fx * depth
    y = (uv[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], -1)


def orthonormalize(M):
    """Nearest rotation matrix by SVD (Manhattan-frame step, Tracking.cc:820-841)."""
    U, _, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    # fix improper rotation
    d = jnp.linalg.det(R)
    U = U.at[..., :, -1].multiply(jnp.where(d < 0, -1.0, 1.0)[..., None])
    return U @ Vt


def _inv33(A):
    """Closed-form 3x3 inverse via the adjugate (pure VPU arithmetic)."""
    c0 = jnp.cross(A[..., 1, :], A[..., 2, :])
    c1 = jnp.cross(A[..., 2, :], A[..., 0, :])
    c2 = jnp.cross(A[..., 0, :], A[..., 1, :])
    det = jnp.sum(A[..., 0, :] * c0, -1)
    adjT = jnp.stack([c0, c1, c2], axis=-1)  # columns = cofactor rows
    return adjT / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)[..., None, None]


def polar_rotation(M, iters: int = 4):
    """Polar factor of a 3x3 matrix (== U @ Vt of its SVD) by Newton
    iteration X <- (X + X^-T)/2 — quadratically convergent for the
    near-orthogonal inputs of the Manhattan-frame step, and pure
    closed-form arithmetic where jnp.linalg.svd lowers to an iterative
    custom call (~0.5 ms per 3x3 solve on TPU).  det(M) < 0 converges to
    the improper polar factor, exactly like U @ Vt."""
    X = M
    for _ in range(iters):
        X = 0.5 * (X + jnp.swapaxes(_inv33(X), -1, -2))
    return X
