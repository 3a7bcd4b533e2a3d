"""Levenberg-Marquardt pose solver over point/line/plane residuals.

Replaces the reference's g2o pose-only optimization (Optimizer.cc:53-590
PoseOptimization; :592-1010 TranslationOptimization) and the vendored
g2o library itself: the reference only ever solves a single 6-dof SE3
vertex with unary edges, so the whole sparse machinery reduces to
accumulating a 6x6 (or 3x3) normal system over vectorized residuals.

Residual families (all semantics mirrored from
Thirdparty/g2o/g2o/types/types_six_dof_expmap.h and plane_3d.h):

- point        (3):  obs_uvr - (project(.), u - bf/z); the third (virtual
                     right-image) component is weighted out for rows
                     without depth — this single family fuses the
                     reference's mono (h:87-91) and stereo (h:136-141)
                     edge types, halving projection+Jacobian work in the
                     hot per-iteration loop
- line endpoint(1):  l . (u, v, 1) for each of the two endpoints    [h:180-189]
- plane        (3):  (Tcw * pi_w).ominus(pi_obs)                    [h:362-368]
- parallel pl. (2):  ominus_par (azimuth/elevation only)            [h:465-471]
- vertical pl. (2):  ominus_ver                                     [plane_3d.h:95-104]

Optimization schedule mirrors Optimizer.cc:401-582: 4 rounds x 10 LM
iterations; between rounds, per-edge chi2 gating (5.991 mono / 7.815
stereo / 2x5.991 line / Plane.Chi / Plane.VPChi) re-activates or deactivates
edges; the Huber kernel is dropped from round 3 on (it==2 in the
reference).  ``translation_only=True`` freezes the rotation — the
Manhattan decoupled solve (OnlyTranslation edge variants, rotation rows of
the Jacobian zeroed, h:440-454).

Point/line Jacobians are closed-form; the tiny plane families go through
ONE jax.linearize of the raw (unweighted) rows per iteration, with the
IRLS weights applied as row scales afterwards — the ominus transcendental
chain is evaluated once per iteration, not once for the weights and again
for the linearization.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from manhattanslam_tpu.geometry import se3

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class PoseProblem(NamedTuple):
    """Fixed-capacity residual sets. Masks select real entries."""

    # points: one fused family; obs = (u, v, uR).  Rows without depth
    # (mono) carry pt_stereo=False and the third component is weighted out
    pt_xw: jnp.ndarray  # (N, 3)
    pt_obs: jnp.ndarray  # (N, 3)
    pt_info: jnp.ndarray  # (N,) invSigma2
    pt_stereo: jnp.ndarray  # (N,) bool
    pt_mask: jnp.ndarray  # (N,) bool
    # line endpoints: one row per endpoint (2 per line)
    ln_xw: jnp.ndarray  # (Nl, 3) endpoint world position
    ln_eq: jnp.ndarray  # (Nl, 3) normalized image-line equation
    ln_info: jnp.ndarray
    ln_mask: jnp.ndarray
    # planes (world coeffs vs observed camera-frame coeffs)
    pl_w: jnp.ndarray  # (Np, 4)
    pl_obs: jnp.ndarray  # (Np, 4)
    pl_mask: jnp.ndarray
    # parallel / vertical structural planes
    par_w: jnp.ndarray
    par_obs: jnp.ndarray
    par_mask: jnp.ndarray
    ver_w: jnp.ndarray
    ver_obs: jnp.ndarray
    ver_mask: jnp.ndarray


def empty_problem(npt=512, nl=128, np_=8, npar=8, nver=8) -> PoseProblem:
    z = jnp.zeros
    return PoseProblem(
        pt_xw=z((npt, 3)), pt_obs=z((npt, 3)), pt_info=z((npt,)),
        pt_stereo=z((npt,), bool), pt_mask=z((npt,), bool),
        ln_xw=z((nl, 3)), ln_eq=z((nl, 3)), ln_info=z((nl,)),
        ln_mask=z((nl,), bool),
        pl_w=z((np_, 4)), pl_obs=z((np_, 4)), pl_mask=z((np_,), bool),
        par_w=z((npar, 4)), par_obs=z((npar, 4)), par_mask=z((npar,), bool),
        ver_w=z((nver, 4)), ver_obs=z((nver, 4)), ver_mask=z((nver,), bool),
    )


# ---------------------------------------------------------------- plane math
def normalize_plane(pi):
    """Plane3D::normalize — unit normal, w-coefficient >= 0."""
    n = jnp.linalg.norm(pi[..., :3], axis=-1, keepdims=True).clip(1e-12)
    pi = pi / n
    flip = pi[..., 3:4] < 0
    return jnp.where(flip, -pi, pi)


def plane_azimuth(v):
    return jnp.arctan2(v[..., 1], v[..., 0])


def plane_elevation(v):
    return jnp.arctan2(v[..., 2], jnp.linalg.norm(v[..., :2], axis=-1).clip(1e-12))


def _rotation_from_normal(n):
    """Plane3D::rotation — Rz(azimuth) @ Ry(-elevation); maps (1,0,0) -> n."""
    az = plane_azimuth(n)
    el = plane_elevation(n)
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se_ = jnp.cos(el), jnp.sin(el)
    # Rz(az) @ Ry(-el)
    return jnp.stack(
        [
            jnp.stack([ca * ce, -sa, -ca * se_], -1),
            jnp.stack([sa * ce, ca, -sa * se_], -1),
            jnp.stack([se_, jnp.zeros_like(az), ce], -1),
        ],
        -2,
    )


def transform_plane_g2o(T, pi):
    """Plane3D operator* — transform plane coeffs by point-transform T."""
    n2 = pi[..., :3] @ T[:3, :3].T
    d2 = pi[..., 3] - jnp.sum(T[:3, 3] * n2, -1)
    out = jnp.concatenate([n2, d2[..., None]], -1)
    flip = out[..., 3:4] < 0
    return jnp.where(flip, -out, out)


def plane_ominus(pi_self, pi_other):
    """Plane3D::ominus: 3-vector (azimuth, elevation, d_self - d_other).

    distance() = -coeffs(3) after normalization.
    """
    pi_self = normalize_plane(pi_self)
    pi_other = normalize_plane(pi_other)
    R = _rotation_from_normal(pi_self[..., :3])
    n = (jnp.swapaxes(R, -1, -2) @ pi_other[..., :3, None])[..., 0]
    d = (-pi_self[..., 3]) - (-pi_other[..., 3])
    return jnp.stack([plane_azimuth(n), plane_elevation(n), d], -1)


def plane_ominus_par(pi_self, pi_other):
    """Plane3D::ominus_par — sign-invariant azimuth/elevation residual."""
    pi_self = normalize_plane(pi_self)
    pi_other = normalize_plane(pi_other)
    nor = pi_self[..., :3]
    dot = jnp.sum(pi_other[..., :3] * nor, -1, keepdims=True)
    nor = jnp.where(dot < 0, -nor, nor)
    R = _rotation_from_normal(nor)
    n = (jnp.swapaxes(R, -1, -2) @ pi_other[..., :3, None])[..., 0]
    return jnp.stack([plane_azimuth(n), plane_elevation(n)], -1)


def _rodrigues(axis, angle):
    """Axis-angle rotation matrix, axis (…,3) unit, angle scalar."""
    W = se3.hat(axis)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis.dtype), W.shape)
    return eye + jnp.sin(angle) * W + (1 - jnp.cos(angle)) * (W @ W)


def plane_ominus_ver(pi_self, pi_other):
    """Plane3D::ominus_ver — residual after rotating self 90 deg toward other."""
    pi_self = normalize_plane(pi_self)
    pi_other = normalize_plane(pi_other)
    ns, no = pi_self[..., :3], pi_other[..., :3]
    v = jnp.cross(ns, no)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(1e-12)
    b = (_rodrigues(v, jnp.pi / 2) @ ns[..., None])[..., 0]
    R = _rotation_from_normal(b)
    n = (jnp.swapaxes(R, -1, -2) @ no[..., None])[..., 0]
    return jnp.stack([plane_azimuth(n), plane_elevation(n)], -1)


# ------------------------------------------------------------- residual stack
def _point_comp_mask(prob: PoseProblem):
    """(N, 3) per-component multiplier: 3rd (uR) component only for stereo."""
    one = jnp.ones_like(prob.pt_info)
    return jnp.stack([one, one, prob.pt_stereo.astype(one.dtype)], -1)


def _residuals(T_cw, prob: PoseProblem, K, bf, use_planes=True, use_lines=True):
    """Per-family raw residuals at pose T_cw (no weighting).

    use_planes/use_lines=False compile those families out (the candidate
    solves run on statically-empty plane/line observations — the ominus
    transcendentals would otherwise be evaluated on zeros every LM
    iteration).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def proj(pw):
        pc = pw @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = pc[:, 2]
        zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        return pc[:, 0] / zi * fx + cx, pc[:, 1] / zi * fy + cy, z

    # points (fused mono+stereo)
    pu, pv, pz = proj(prob.pt_xw)
    p_ur = pu - bf / jnp.where(jnp.abs(pz) < 1e-9, 1e-9, pz)
    r_pt = (prob.pt_obs - jnp.stack([pu, pv, p_ur], -1)) * _point_comp_mask(prob)
    # line endpoints: l . (u,v,1)
    if use_lines:
        lu, lv, _ = proj(prob.ln_xw)
        r_ln = (
            prob.ln_eq[:, 0] * lu + prob.ln_eq[:, 1] * lv + prob.ln_eq[:, 2]
        )[:, None]  # (Nl,1)
    else:
        r_ln = jnp.zeros((prob.ln_xw.shape[0], 1), r_pt.dtype)
    # planes
    if use_planes:
        pl_c = transform_plane_g2o(T_cw, prob.pl_w)
        r_pl = plane_ominus(pl_c, prob.pl_obs)  # (Np,3)
        par_c = transform_plane_g2o(T_cw, prob.par_w)
        r_par = plane_ominus_par(par_c, prob.par_obs)  # (Npar,2)
        ver_c = transform_plane_g2o(T_cw, prob.ver_w)
        r_ver = plane_ominus_ver(ver_c, prob.ver_obs)  # (Nver,2)
    else:
        r_pl = jnp.zeros((prob.pl_w.shape[0], 3), r_pt.dtype)
        r_par = jnp.zeros((prob.par_w.shape[0], 2), r_pt.dtype)
        r_ver = jnp.zeros((prob.ver_w.shape[0], 2), r_pt.dtype)
    return r_pt, r_ln, r_pl, r_par, r_ver


class SolveParams(NamedTuple):
    angle_info: jnp.ndarray  # 3282.8 / AngleInfo^2
    dis_info: jnp.ndarray  # DistanceInfo^2
    par_info: jnp.ndarray
    ver_info: jnp.ndarray
    plane_chi: jnp.ndarray
    vp_chi: jnp.ndarray


def default_params(cfg=None) -> SolveParams:
    if cfg is None:
        a, d, p, v, c, vc = 0.5, 50.0, 0.5, 0.5, 100.0, 50.0
    else:
        pc = cfg.plane
        a, d, p, v, c, vc = (
            pc.angle_info, pc.distance_info, pc.parallel_info,
            pc.vertical_info, pc.chi, pc.vp_chi,
        )
    return SolveParams(
        angle_info=jnp.float32(3282.8 / (a * a)),
        dis_info=jnp.float32(d * d),
        par_info=jnp.float32(3282.8 / (p * p)),
        ver_info=jnp.float32(3282.8 / (v * v)),
        plane_chi=jnp.float32(c),
        vp_chi=jnp.float32(vc),
    )


def _family_chi2(r_pt, r_ln, r_pl, r_par, r_ver, prob, params):
    """Per-edge chi2 (information-weighted squared residuals).

    The fused point rows already have the uR component zeroed for mono, so
    summing 3 components reproduces the mono (2-comp) / stereo (3-comp)
    chi2 split of Optimizer.cc:108-151.
    """
    chi_pt = jnp.sum(r_pt**2, -1) * prob.pt_info
    chi_ln = (r_ln[:, 0] ** 2) * prob.ln_info
    w_pl = jnp.stack([params.angle_info, params.angle_info, params.dis_info])
    chi_pl = jnp.sum(r_pl**2 * w_pl[None], -1)
    chi_par = jnp.sum(r_par**2, -1) * params.par_info
    chi_ver = jnp.sum(r_ver**2, -1) * params.ver_info
    return chi_pt, chi_ln, chi_pl, chi_par, chi_ver


def _pt_chi_th(prob):
    """Per-row chi2 threshold: 5.991 mono / 7.815 stereo."""
    return jnp.where(prob.pt_stereo, CHI2_STEREO, CHI2_MONO)


def _huber_w(chi2, delta2, mask, huber_on):
    """Per-edge Huber sqrt-weight at chi2, with delta^2 threshold."""
    if not huber_on:
        w = jnp.ones_like(chi2)
    else:
        e = jnp.sqrt(jnp.clip(chi2, 1e-12))
        delta = jnp.sqrt(delta2)
        w = jnp.where(e <= delta, 1.0, jnp.sqrt(delta / e))
    return jnp.where(mask, w, 0.0)


def _robust_weights(prob, params, masks, huber_on, T_cw, K, bf, rs=None,
                    use_planes=True, use_lines=True):
    """Per-edge sqrt-weights (info x Huber x mask), computed at T_cw.

    The weights are FROZEN for the linearization step (IRLS): g2o's robust
    kernel rescales the quadratic model around the current estimate; the
    weight is not differentiated through.
    """
    m_pt, m_ln, m_pl, m_par, m_ver = masks
    if rs is None:
        rs = _residuals(T_cw, prob, K, bf, use_planes, use_lines)
    chi = _family_chi2(*rs, prob, params)
    return (
        _huber_w(chi[0], _pt_chi_th(prob), m_pt, huber_on)
        * jnp.sqrt(prob.pt_info),
        _huber_w(chi[1], CHI2_STEREO, m_ln, huber_on) * jnp.sqrt(prob.ln_info),
        _huber_w(chi[2], params.plane_chi, m_pl, huber_on),
        _huber_w(chi[3], params.vp_chi, m_par, huber_on),
        _huber_w(chi[4], params.vp_chi, m_ver, huber_on),
    )


def _weighted_flat(prob, params, masks, weights, T_cw, K, bf, rs=None,
                   use_planes=True, use_lines=True):
    """Flat weighted residual vector with given (frozen) per-edge weights."""
    m_pt, m_ln, m_pl, m_par, m_ver = masks
    w_pt, w_ln, w_pl, w_par, w_ver = weights
    if rs is None:
        rs = _residuals(T_cw, prob, K, bf, use_planes, use_lines)
    r_pt, r_ln, r_pl, r_par, r_ver = rs

    sqrt_pl = jnp.sqrt(
        jnp.stack([params.angle_info, params.angle_info, params.dis_info])
    )
    sqrt_par = jnp.sqrt(params.par_info)
    sqrt_ver = jnp.sqrt(params.ver_info)

    # jnp.where guards NaNs from padded rows out of the jacfwd tangents
    # (forward-mode tangents of where() select the taken branch only)
    def guard(mask, wr):
        return jnp.where(mask[:, None], wr, 0.0).ravel()

    return jnp.concatenate(
        [
            guard(m_pt, r_pt * w_pt[:, None]),
            guard(m_ln, r_ln * w_ln[:, None]),
            guard(m_pl, r_pl * sqrt_pl[None] * w_pl[:, None]),
            guard(m_par, r_par * sqrt_par * w_par[:, None]),
            guard(m_ver, r_ver * sqrt_ver * w_ver[:, None]),
        ]
    )


def _point_jacobians(T_cw, prob: PoseProblem, K, bf, translation_only,
                     use_lines=True):
    """Closed-form Jacobians of the point/line residual rows wrt the pose
    increment xi (translation-first, left-multiplied retraction
    T' = exp(xi) @ T, matching se3.exp_se3).

    d pc/d xi at xi=0 is [I | -hat(pc)]; residuals are obs - pred for
    points (negative projection Jacobian) and l . (u, v, 1) for lines
    (positive).  Returns (Jp (N,3,dof), Jl (Nl,1,dof)); the mono rows'
    third (uR) Jacobian row is zeroed via the component mask.
    The tiny plane families stay on jax.linearize.
    """
    fx, fy = K[0, 0], K[1, 1]

    def cam(pw):
        return pw @ T_cw[:3, :3].T + T_cw[:3, 3]

    def dpc_dxi(pc):
        n = pc.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), (n, 3, 3))
        if translation_only:
            return eye
        return jnp.concatenate([eye, -se3.hat(pc)], axis=-1)  # (N,3,6)

    def duv_dpc(pc):
        """(N,2,3) Jacobian of the projected (u, v) wrt camera point."""
        z = pc[:, 2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        zero = jnp.zeros_like(z)
        row_u = jnp.stack([fx * zi, zero, -fx * pc[:, 0] * zi * zi], -1)
        row_v = jnp.stack([zero, fy * zi, -fy * pc[:, 1] * zi * zi], -1)
        return jnp.stack([row_u, row_v], -2)

    # points: r = obs - (u, v, u - bf/z); mono rows masked on the 3rd comp
    pc_p = cam(prob.pt_xw)
    A_uv = duv_dpc(pc_p)
    z = pc_p[:, 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    zero = jnp.zeros_like(z)
    row_ur = A_uv[:, 0] + jnp.stack([zero, zero, bf * zi * zi], -1)
    A_pt = jnp.concatenate([A_uv, row_ur[:, None, :]], axis=-2)  # (N,3,3)
    Jp = -(A_pt @ dpc_dxi(pc_p)) * _point_comp_mask(prob)[:, :, None]

    # line endpoint: r = l0*u + l1*v + l2 (positive sign)
    if use_lines:
        pc_l = cam(prob.ln_xw)
        A_uv_l = duv_dpc(pc_l)  # (Nl,2,3)
        lrow = (
            prob.ln_eq[:, 0:1, None] * A_uv_l[:, 0:1, :]
            + prob.ln_eq[:, 1:2, None] * A_uv_l[:, 1:2, :]
        )  # (Nl,1,3)
        Jl = lrow @ dpc_dxi(pc_l)
    else:
        dof_ = 3 if translation_only else 6
        Jl = jnp.zeros((prob.ln_xw.shape[0], 1, dof_), Jp.dtype)

    return Jp, Jl


def _solve_spd(A, b):
    """Unrolled Cholesky solve for the tiny static-dim SPD normal
    equations (6x6 / 3x3, batched leading dims).  jnp.linalg.solve lowers
    to an LU custom call that cannot fuse with the surrounding LM
    iteration; this closed-form scalar arithmetic does."""
    d = A.shape[-1]
    L = [[None] * d for _ in range(d)]
    for i in range(d):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * d
    for i in range(d):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * d
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, -1)


def _plane_rows_raw(T_cw, prob: PoseProblem, masks):
    """UNWEIGHTED masked plane-family residual rows, one flat vector.

    Returns the concatenation [pl (Np*3), par (Npar*2), ver (Nver*2)];
    the IRLS weights and sqrt-information are applied OUTSIDE as row
    scales (residual rows scale linearly, so the linearization of the raw
    rows is reused for both the weight computation and the normal system
    — the ominus transcendentals run once per iteration, not twice).
    """
    m_pl, m_par, m_ver = masks
    pl_c = transform_plane_g2o(T_cw, prob.pl_w)
    r_pl = plane_ominus(pl_c, prob.pl_obs)
    par_c = transform_plane_g2o(T_cw, prob.par_w)
    r_par = plane_ominus_par(par_c, prob.par_obs)
    ver_c = transform_plane_g2o(T_cw, prob.ver_w)
    r_ver = plane_ominus_ver(ver_c, prob.ver_obs)

    def guard(mask, r):
        return jnp.where(mask[:, None], r, 0.0).ravel()

    return jnp.concatenate(
        [guard(m_pl, r_pl), guard(m_par, r_par), guard(m_ver, r_ver)]
    )


def _plane_row_scales(rp_raw, prob, params, masks, huber_on):
    """Per-flat-row scale (sqrt-info x Huber x mask) for the raw plane rows
    + the families' chi2 (computed from the same primal residuals)."""
    np_, npar, nver = (
        prob.pl_mask.shape[0], prob.par_mask.shape[0], prob.ver_mask.shape[0]
    )
    m_pl, m_par, m_ver = masks
    r_pl = rp_raw[: np_ * 3].reshape(np_, 3)
    r_par = rp_raw[np_ * 3 : np_ * 3 + npar * 2].reshape(npar, 2)
    r_ver = rp_raw[np_ * 3 + npar * 2 :].reshape(nver, 2)
    w_pl_c = jnp.stack([params.angle_info, params.angle_info, params.dis_info])
    chi_pl = jnp.sum(r_pl**2 * w_pl_c[None], -1)
    chi_par = jnp.sum(r_par**2, -1) * params.par_info
    chi_ver = jnp.sum(r_ver**2, -1) * params.ver_info
    w_pl = _huber_w(chi_pl, params.plane_chi, m_pl, huber_on)
    w_par = _huber_w(chi_par, params.vp_chi, m_par, huber_on)
    w_ver = _huber_w(chi_ver, params.vp_chi, m_ver, huber_on)
    scales = jnp.concatenate(
        [
            (w_pl[:, None] * jnp.sqrt(w_pl_c)[None]).ravel(),
            (w_par * jnp.sqrt(params.par_info)).repeat(2),
            (w_ver * jnp.sqrt(params.ver_info)).repeat(2),
        ]
    )
    return scales


@partial(
    jax.jit,
    static_argnames=(
        "translation_only", "n_rounds", "n_iters", "analytic", "gauss_newton",
        "use_planes", "use_lines",
    ),
)
def solve_pose(
    prob: PoseProblem,
    T0: jnp.ndarray,
    K: jnp.ndarray,
    bf: float,
    params: SolveParams,
    translation_only: bool = False,
    n_rounds: int = 4,
    n_iters: int = 10,
    analytic: bool = True,
    gauss_newton: bool = False,
    use_planes: bool = True,
    use_lines: bool = True,
) -> dict:
    """Run the 4x10 LM schedule.  Returns dict with T, inlier masks, chi2.

    analytic=True (default) uses closed-form Jacobians for the point/line
    rows (one primal pass + algebra instead of 6 JVP tangent passes); the
    tiny plane families always go through jax.linearize.  analytic=False
    keeps the all-AD path for parity testing.  gauss_newton=True (requires
    analytic) drops the LM accept/reject pass — use for short candidate
    schedules only.
    """
    if gauss_newton and not analytic:
        raise ValueError("gauss_newton requires the analytic path")
    dof = 3 if translation_only else 6

    def retract(T, xi):
        if translation_only:
            return T.at[:3, 3].add(xi)
        return se3.exp_se3(xi) @ T

    zmask = jnp.zeros
    masks0 = (
        prob.pt_mask,
        prob.ln_mask if use_lines else zmask(prob.ln_mask.shape, bool),
        prob.pl_mask if use_planes else zmask(prob.pl_mask.shape, bool),
        prob.par_mask if use_planes else zmask(prob.par_mask.shape, bool),
        prob.ver_mask if use_planes else zmask(prob.ver_mask.shape, bool),
    )

    def run_round(T, masks, huber_on):
        m_pt, m_ln, m_pl, m_par, m_ver = masks
        pmasks = (m_pl, m_par, m_ver)

        def lm_iter_ad(carry, _):
            T, lam = carry
            # ONE primal residual evaluation shared by the IRLS weights and
            # the weighted residual vector
            rs = _residuals(T, prob, K, bf, use_planes, use_lines)
            w = _robust_weights(prob, params, masks, huber_on, T, K, bf, rs=rs)

            def flat_at(T_):
                return _weighted_flat(
                    prob, params, masks, w, T_, K, bf,
                    use_planes=use_planes, use_lines=use_lines,
                )

            r0 = _weighted_flat(prob, params, masks, w, T, K, bf, rs=rs)
            _, jvp_fn = jax.linearize(
                lambda xi: flat_at(retract(T, xi)), jnp.zeros((dof,), T.dtype)
            )
            J = jax.vmap(jvp_fn)(jnp.eye(dof, dtype=T.dtype)).T  # (R, dof)
            H = J.T @ J
            g = J.T @ r0
            step = -_solve_spd(H + lam * jnp.eye(dof, dtype=T.dtype), g)
            T_new = retract(T, step)
            prev_cost = 0.5 * jnp.sum(r0 * r0)
            new_cost = 0.5 * jnp.sum(flat_at(T_new) ** 2)
            accept = (new_cost < prev_cost) & jnp.all(jnp.isfinite(step))
            T = jnp.where(accept, T_new, T)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            return (T, jnp.clip(lam, 1e-8, 1e6)), None

        def full_system(T):
            """H, g, cost at T from ONE concatenated weighted row block.

            Per-family einsums left ~9-12 small reduce fusions per LM
            iteration on the device profile (the micro-op tail IS the
            device time at these sizes); stacking every weighted row into
            a single (R, dof) matrix folds them into one JtJ matmul + one
            Jtr matvec + one dot."""
            rs = _residuals(T, prob, K, bf, use_planes=False,
                            use_lines=use_lines)
            r_pt, r_ln = rs[0], rs[1]
            chi_pt = jnp.sum(r_pt**2, -1) * prob.pt_info
            w_pt = _huber_w(chi_pt, _pt_chi_th(prob), m_pt, huber_on) * jnp.sqrt(
                prob.pt_info
            )
            Jp, Jl = _point_jacobians(
                T, prob, K, bf, translation_only, use_lines=use_lines
            )
            rows_J = [(Jp * w_pt[:, None, None]).reshape(-1, dof)]
            rows_r = [(r_pt * w_pt[:, None]).ravel()]
            if use_lines:
                chi_ln = (r_ln[:, 0] ** 2) * prob.ln_info
                w_ln = _huber_w(chi_ln, CHI2_STEREO, m_ln, huber_on) * jnp.sqrt(
                    prob.ln_info
                )
                rows_J.append((Jl * w_ln[:, None, None]).reshape(-1, dof))
                rows_r.append((r_ln * w_ln[:, None]).ravel())
            if use_planes:
                rp_raw, jvp_p = jax.linearize(
                    lambda xi: _plane_rows_raw(retract(T, xi), prob, pmasks),
                    jnp.zeros((dof,), T.dtype),
                )
                Jq = jax.vmap(jvp_p)(jnp.eye(dof, dtype=T.dtype)).T  # (R, dof)
                s = _plane_row_scales(rp_raw, prob, params, pmasks, huber_on)
                rows_J.append(Jq * s[:, None])
                rows_r.append(rp_raw * s)
            J = jnp.concatenate(rows_J)
            r = jnp.concatenate(rows_r)
            return J.T @ J, J.T @ r, 0.5 * jnp.sum(r * r)

        def cost_only(T):
            """IRLS cost at T without the Jacobian work (used once per
            round to adjudicate the last unevaluated proposal)."""
            rs = _residuals(T, prob, K, bf, use_planes=False,
                            use_lines=use_lines)
            r_pt, r_ln = rs[0], rs[1]
            chi_pt = jnp.sum(r_pt**2, -1) * prob.pt_info
            w_pt = _huber_w(chi_pt, _pt_chi_th(prob), m_pt, huber_on) * jnp.sqrt(
                prob.pt_info
            )
            c = jnp.sum((r_pt * w_pt[:, None]) ** 2)
            if use_lines:
                chi_ln = (r_ln[:, 0] ** 2) * prob.ln_info
                w_ln = _huber_w(chi_ln, CHI2_STEREO, m_ln, huber_on) * jnp.sqrt(
                    prob.ln_info
                )
                c = c + jnp.sum((r_ln * w_ln[:, None]) ** 2)
            c = 0.5 * c
            if use_planes:
                rp_raw = _plane_rows_raw(T, prob, pmasks)
                s = _plane_row_scales(rp_raw, prob, params, pmasks, huber_on)
                c = c + 0.5 * jnp.sum((rp_raw * s) ** 2)
            return c

        def lm_iter_gn(carry, _):
            # damped GN: no accept/reject cost evaluation (one residual
            # pass per iteration).  Fine for the candidate solves whose
            # job is a rough init + inlier count; the final polish
            # keeps full LM.
            T, lam = carry
            H, g, _ = full_system(T)
            step = -_solve_spd(H + lam * jnp.eye(dof, dtype=T.dtype), g)
            ok = jnp.all(jnp.isfinite(step)) & (jnp.linalg.norm(step) < 1.0)
            T = jnp.where(ok, retract(T, step), T)
            return (T, lam), None

        def lm_iter_def(carry, _):
            """Deferred-accept LM: each iteration's ONE system evaluation
            both adjudicates the previous proposal (cost vs the stored
            accepted cost) and provides the next linearization.  On
            rejection the step re-solves from the STORED accepted system
            with the raised lambda — classic LM retry semantics at half
            the residual/Jacobian passes of eval-then-reeval."""
            T, lam, T_acc, H_acc, g_acc, c_acc = carry
            H, g, c = full_system(T)
            ok = jnp.isfinite(c) & (c < c_acc)
            T_w = jnp.where(ok, T, T_acc)
            H_w = jnp.where(ok, H, H_acc)
            g_w = jnp.where(ok, g, g_acc)
            c_w = jnp.where(ok, c, c_acc)
            lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 4.0), 1e-8, 1e6)
            step = -_solve_spd(
                H_w + lam * jnp.eye(dof, dtype=T.dtype), g_w
            )
            step = jnp.where(
                jnp.all(jnp.isfinite(step)), step, jnp.zeros_like(step)
            )
            T_new = retract(T_w, step)
            return (T_new, lam, T_w, H_w, g_w, c_w), None

        # fully unrolled: n_iters is 4-5 and each iteration is op-count-
        # bound (tiny 6x6 algebra), so while-loop trip overhead was a
        # measurable share of the solve; unrolling also lets XLA fuse
        # across iterations
        if analytic and gauss_newton:
            (T, _), _ = jax.lax.scan(
                lm_iter_gn, (T, jnp.float32(1e-3)), None,
                length=n_iters, unroll=True,
            )
        elif analytic:
            zH = jnp.zeros((dof, dof), T.dtype)
            zg = jnp.zeros((dof,), T.dtype)
            (T_last, _, T_acc, _, _, c_acc), _ = jax.lax.scan(
                lm_iter_def,
                (T, jnp.float32(1e-3), T, zH, zg, jnp.float32(jnp.inf)),
                None, length=n_iters, unroll=True,
            )
            # the last proposal left the loop unevaluated: one cost-only
            # pass decides between it and the best accepted iterate
            T = jnp.where(cost_only(T_last) < c_acc, T_last, T_acc)
        else:
            (T, _), _ = jax.lax.scan(
                lm_iter_ad, (T, jnp.float32(1e-3)), None,
                length=n_iters, unroll=True,
            )
        return T

    T = T0
    masks = masks0
    for rnd in range(n_rounds):
        T = run_round(T, masks, huber_on=(rnd < 2))
        # re-gate against the ORIGINAL masks (edges can be re-activated,
        # Optimizer.cc:428-436 level-0/1 flipping)
        rs = _residuals(T, prob, K, bf, use_planes, use_lines)
        chi = _family_chi2(*rs, prob, params)
        masks = (
            masks0[0] & (chi[0] <= _pt_chi_th(prob)),
            masks0[1] & (chi[1] <= 2.0 * CHI2_MONO),
            masks0[2] & (chi[2] <= params.plane_chi),
            masks0[3] & (chi[3] <= params.vp_chi),
            masks0[4] & (chi[4] <= params.vp_chi),
        )

    rs = _residuals(T, prob, K, bf, use_planes, use_lines)
    chi = _family_chi2(*rs, prob, params)
    n_inlier = sum(jnp.sum(m) for m in masks)
    total_chi = sum(jnp.sum(jnp.where(m, c, 0.0)) for m, c in zip(masks, chi))
    inlier_pt = masks[0]
    return {
        "T": T,
        "inlier_pt": inlier_pt,
        "inlier_mono": inlier_pt & ~prob.pt_stereo,
        "inlier_st": inlier_pt & prob.pt_stereo,
        "inlier_ln": masks[1],
        "inlier_pl": masks[2],
        "inlier_par": masks[3],
        "inlier_ver": masks[4],
        "n_inliers": n_inlier,
        "chi2": total_chi,
    }
