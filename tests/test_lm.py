import jax
import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.geometry import se3
from manhattanslam_tpu.ops import lm

K = jnp.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], jnp.float32)
BF = 30.0


def make_problem(rng, n_mono=60, n_st=60, outlier_frac=0.0, T_gt=None, planes=0):
    """Mono rows occupy [0, n_mono); stereo rows [n_mono, n_mono + n_st)
    of the fused point family (pt_stereo flags the split)."""
    if T_gt is None:
        T_gt = np.eye(4, dtype=np.float32)
    prob = lm.empty_problem(npt=256, nl=16, np_=8, npar=8, nver=8)

    def project(pw):
        pc = pw @ np.asarray(T_gt)[:3, :3].T + np.asarray(T_gt)[:3, 3]
        u = pc[:, 0] / pc[:, 2] * 300.0 + 160.0
        v = pc[:, 1] / pc[:, 2] * 300.0 + 120.0
        return u, v, pc[:, 2]

    pts = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n_mono, 3)).astype(np.float32)
    u, v, z = project(pts)
    obs = np.stack([u, v, np.zeros_like(u)], -1)
    n_out = int(outlier_frac * n_mono)
    if n_out:
        obs[:n_out, :2] += rng.uniform(20, 80, (n_out, 2)) * rng.choice(
            [-1, 1], (n_out, 2)
        )
    prob = prob._replace(
        pt_xw=prob.pt_xw.at[:n_mono].set(pts),
        pt_obs=prob.pt_obs.at[:n_mono].set(obs),
        pt_info=prob.pt_info.at[:n_mono].set(1.0),
        pt_mask=prob.pt_mask.at[:n_mono].set(True),
    )
    pts2 = rng.uniform([-2, -1.5, 2.0], [2, 1.5, 6.0], (n_st, 3)).astype(np.float32)
    u2, v2, z2 = project(pts2)
    obs2 = np.stack([u2, v2, u2 - BF / z2], -1)
    sl = slice(n_mono, n_mono + n_st)
    prob = prob._replace(
        pt_xw=prob.pt_xw.at[sl].set(pts2),
        pt_obs=prob.pt_obs.at[sl].set(obs2),
        pt_info=prob.pt_info.at[sl].set(1.0),
        pt_stereo=prob.pt_stereo.at[sl].set(True),
        pt_mask=prob.pt_mask.at[sl].set(True),
    )
    if planes:
        # axis-aligned planes observed in the T_gt camera frame
        pw = np.array(
            [[1, 0, 0, -3.0], [0, 1, 0, -2.0], [0, 0, 1, -7.0]], np.float32
        )[:planes]
        pc = np.asarray(
            lm.transform_plane_g2o(jnp.asarray(T_gt), jnp.asarray(pw))
        )
        prob = prob._replace(
            pl_w=prob.pl_w.at[:planes].set(pw),
            pl_obs=prob.pl_obs.at[:planes].set(pc),
            pl_mask=prob.pl_mask.at[:planes].set(True),
        )
    return prob


def perturbed(T_gt, rng, rot=0.05, tr=0.1):
    xi = np.concatenate(
        [rng.normal(0, tr, 3), rng.normal(0, rot, 3)]
    ).astype(np.float32)
    return np.asarray(se3.exp_se3(jnp.asarray(xi)) @ jnp.asarray(T_gt))


def test_plane_ominus_zero_for_equal():
    pi = jnp.array([[0.6, 0.0, 0.8, 1.3]])
    r = np.asarray(lm.plane_ominus(pi, pi))
    np.testing.assert_allclose(r, 0, atol=1e-6)
    r2 = np.asarray(lm.plane_ominus_par(pi, pi))
    np.testing.assert_allclose(r2, 0, atol=1e-6)


def test_plane_ominus_distance_component():
    a = jnp.array([[1.0, 0, 0, 2.0]])
    b = jnp.array([[1.0, 0, 0, 2.5]])
    r = np.asarray(lm.plane_ominus(a, b))[0]
    # distance() = -coeffs(3): d_a - d_b = -2 - (-2.5) = 0.5
    np.testing.assert_allclose(r, [0, 0, 0.5], atol=1e-6)


def test_plane_ominus_ver_zero_for_perpendicular():
    a = jnp.array([[1.0, 0, 0, 1.0]])
    b = jnp.array([[0.0, 0, 1.0, 2.0]])
    r = np.asarray(lm.plane_ominus_ver(a, b))
    np.testing.assert_allclose(r, 0, atol=1e-5)


def test_transform_plane_g2o_points_stay_on_plane(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.4
    T = se3.exp_se3(jnp.asarray(xi))
    pi = jnp.array([0.36, 0.48, 0.8, -1.7])
    pts = []
    # sample points on the plane
    n = np.array([0.36, 0.48, 0.8]) / 1.0
    p0 = -(-1.7) * n  # n.x + d = 0 -> x = -d n
    for _ in range(5):
        v = rng.normal(size=3)
        v -= v.dot(n) * n
        pts.append(p0 + v)
    pts = jnp.asarray(np.array(pts, np.float32))
    pts_t = se3.transform_points(T, pts)
    pi_t = lm.transform_plane_g2o(T, pi[None])[0]
    resid = pts_t @ pi_t[:3] + pi_t[3]
    np.testing.assert_allclose(np.asarray(resid), 0, atol=1e-5)
    assert float(pi_t[3]) >= 0  # normalization convention


def test_solve_pose_recovers_gt(rng):
    T_gt = np.asarray(
        se3.exp_se3(jnp.array([0.3, -0.2, 0.1, 0.05, -0.03, 0.08], jnp.float32))
    )
    prob = make_problem(rng, T_gt=T_gt)
    T0 = perturbed(T_gt, rng)
    out = lm.solve_pose(prob, jnp.asarray(T0), K, BF, lm.default_params())
    err = np.abs(np.asarray(out["T"]) - T_gt).max()
    assert err < 1e-3, err
    assert int(out["n_inliers"]) >= 110


def test_solve_pose_with_outliers(rng):
    T_gt = np.eye(4, dtype=np.float32)
    prob = make_problem(rng, outlier_frac=0.3, T_gt=T_gt)
    T0 = perturbed(T_gt, rng, rot=0.03, tr=0.05)
    out = lm.solve_pose(prob, jnp.asarray(T0), K, BF, lm.default_params())
    err = np.abs(np.asarray(out["T"]) - T_gt).max()
    assert err < 5e-3, err
    # outlier mono edges must be gated out
    assert int(np.asarray(out["inlier_mono"]).sum()) <= 60 - 15


def test_solve_pose_translation_only(rng):
    T_gt = np.asarray(
        se3.exp_se3(jnp.array([0.2, 0.1, -0.15, 0.0, 0.0, 0.0], jnp.float32))
    )
    prob = make_problem(rng, T_gt=T_gt)
    # correct rotation, wrong translation (Manhattan decoupled solve)
    T0 = T_gt.copy()
    T0[:3, 3] += rng.normal(0, 0.2, 3).astype(np.float32)
    out = lm.solve_pose(
        prob, jnp.asarray(T0), K, BF, lm.default_params(), translation_only=True
    )
    Tr = np.asarray(out["T"])
    np.testing.assert_allclose(Tr[:3, :3], T_gt[:3, :3], atol=1e-7)  # frozen
    np.testing.assert_allclose(Tr[:3, 3], T_gt[:3, 3], atol=1e-3)


def test_solve_pose_with_planes(rng):
    T_gt = np.asarray(
        se3.exp_se3(jnp.array([0.1, -0.1, 0.2, 0.04, 0.02, -0.05], jnp.float32))
    )
    prob = make_problem(rng, n_mono=30, n_st=30, T_gt=T_gt, planes=3)
    T0 = perturbed(T_gt, rng)
    out = lm.solve_pose(prob, jnp.asarray(T0), K, BF, lm.default_params())
    assert np.abs(np.asarray(out["T"]) - T_gt).max() < 2e-3
    assert int(np.asarray(out["inlier_pl"]).sum()) == 3


def test_solve_pose_empty_problem_is_stable():
    prob = lm.empty_problem()
    T0 = jnp.eye(4)
    out = lm.solve_pose(prob, T0, K, BF, lm.default_params())
    assert np.all(np.isfinite(np.asarray(out["T"])))
    np.testing.assert_allclose(np.asarray(out["T"]), np.eye(4), atol=1e-5)


def test_analytic_matches_ad_jacobians(rng):
    """The closed-form point/stereo/line Jacobians must match jax.linearize
    of the weighted flat residual (both full 6-dof and translation-only)."""
    T_gt = np.asarray(
        se3.exp_se3(jnp.array([0.1, -0.2, 0.3, 0.05, -0.03, 0.08], jnp.float32))
    )
    prob = make_problem(rng, n_mono=20, n_st=20, T_gt=T_gt, planes=2)
    T = jnp.asarray(perturbed(T_gt, rng))
    for translation_only in (False, True):
        dof = 3 if translation_only else 6

        def retract(Tm, xi):
            if translation_only:
                return Tm.at[:3, 3].add(xi)
            return se3.exp_se3(xi) @ Tm

        Jp, Jl = lm._point_jacobians(
            T, prob, K, jnp.float32(BF), translation_only
        )

        def flat_pts(xi):
            rs = lm._residuals(retract(T, xi), prob, K, jnp.float32(BF))
            return jnp.concatenate([rs[0].ravel(), rs[1].ravel()])

        J_ad = jax.jacfwd(flat_pts)(jnp.zeros((dof,), jnp.float32))
        J_an = jnp.concatenate(
            [Jp.reshape(-1, dof), Jl.reshape(-1, dof)]
        )
        np.testing.assert_allclose(
            np.asarray(J_an), np.asarray(J_ad), atol=2e-4, rtol=1e-4
        )


def test_analytic_solve_matches_ad_solve(rng):
    """solve_pose(analytic=True) and (analytic=False) converge to the same
    pose on a well-conditioned problem."""
    T_gt = np.asarray(
        se3.exp_se3(jnp.array([0.1, -0.1, 0.2, 0.04, 0.02, -0.05], jnp.float32))
    )
    prob = make_problem(rng, n_mono=40, n_st=40, T_gt=T_gt, planes=2)
    T0 = jnp.asarray(perturbed(T_gt, rng))
    p = lm.default_params()
    out_an = lm.solve_pose(prob, T0, K, BF, p, analytic=True)
    out_ad = lm.solve_pose(prob, T0, K, BF, p, analytic=False)
    np.testing.assert_allclose(
        np.asarray(out_an["T"]), np.asarray(out_ad["T"]), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(out_an["T"]), T_gt, atol=2e-3)
