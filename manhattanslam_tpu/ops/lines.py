"""Line features: detection, description, and 3D lifting — TPU-native.

Replaces the reference's OpenCV LSD + LBD stack (LSDextractor.cpp:17-45)
and the 3D line lifter (3DLineExtractor.cpp):

- detection: the LSD region-grower is inherently sequential, so we use a
  dense **Hough transform** instead — votes are a scatter-add over
  (angle, rho) bins, peak extraction is top-K, and segment extents come
  from masked projections of supporting edge pixels.  Functionally
  equivalent "top-40 straight segments by support" (the reference keeps
  the top 40 by response, LSDextractor.cpp:23-31).
- description: an LBD-like band descriptor built from gradient statistics
  in bands parallel to the segment — float-valued, matched by dot product
  on the MXU (the reference's binary LBD + Hamming BFMatcher,
  LSDmatcher.cpp:201-234, is replaced by cosine distance with the same
  NN-ratio gating).
- 3D lifting: sample up to S points along the segment, per-point depth
  noise sigma(z) = c*z^2 (3DLineExtractor.cpp:62-73), 2-point RANSAC under
  sigma-normalized point-line distance (:118-206, threshold 1.5, 10
  hypotheses), least-squares refit, endpoint recovery by projection.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.ops import eig33
from manhattanslam_tpu.ops.image import sobel

N_ANGLES = 120
RHO_BIN = 2.0  # pixels per rho bin
MIN_SEG_LEN = 20.0  # pixels
DESC_BANDS = 7
DESC_DIM = 4 * DESC_BANDS


@partial(jax.jit, static_argnames=("n_lines",))
def detect_lines(
    gray: jnp.ndarray,
    n_lines: int = 64,
    mag_th: float = 40.0,
    min_support: float = 15.0,
    min_density: float = 0.2,
    min_length: float = MIN_SEG_LEN,
) -> dict:
    """Hough-based segment detector (computed at half resolution: the vote
    scatter is the dominant cost and line localization recovers via the
    least-squares refit; outputs are in full-resolution pixels).

    The gates come from config (Line.* block; the reference hard-codes its
    analogs inside LSD).  Returns dict: sp (L,2), ep (L,2) endpoints (x,y),
    response (L,), valid (L,), eq (L,3) normalized homogeneous line
    equation (sp x ep / |.|, LSDextractor.cpp:35-44 convention).
    """
    H0, W0 = gray.shape
    gates = (mag_th, min_support, min_density, min_length)
    if min(H0, W0) >= 200:
        # 2x2 box downsample as two constant banded matmuls: strided slicing
        # lowers to slow scalar gathers on TPU, matmuls ride the MXU
        from manhattanslam_tpu.ops.image import avgpool2_matrix_np

        ay = jnp.asarray(avgpool2_matrix_np(H0))
        ax = jnp.asarray(avgpool2_matrix_np(W0))
        small = ay @ gray @ ax.T
        out = _detect_lines_impl(small, n_lines, *gates)
        return {
            "sp": out["sp"] * 2.0,
            "ep": out["ep"] * 2.0,
            "eq": _renormalize_eq(out["sp"] * 2.0, out["ep"] * 2.0),
            "response": out["response"],
            "valid": out["valid"],
            "angle": out["angle"],
        }
    return _detect_lines_impl(gray, n_lines, *gates)


def _renormalize_eq(sp, ep):
    sph = jnp.concatenate([sp, jnp.ones((sp.shape[0], 1))], -1)
    eph = jnp.concatenate([ep, jnp.ones((ep.shape[0], 1))], -1)
    eq = jnp.cross(sph, eph)
    return eq / jnp.linalg.norm(eq, axis=-1, keepdims=True).clip(1e-9)


def _detect_lines_impl(
    gray: jnp.ndarray,
    n_lines: int,
    mag_th: float = 40.0,
    min_support: float = 15.0,
    min_density: float = 0.2,
    min_length: float = MIN_SEG_LEN,
) -> dict:
    h, w = gray.shape
    gx, gy = sobel(gray)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # adaptive threshold (mean + 1.5 std tracks the ~90th percentile
    # without the full sort a quantile would cost)
    th = jnp.maximum(jnp.mean(mag) + 1.5 * jnp.std(mag), mag_th)
    edge = mag > th

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)

    # edge-pixel gradient orientation (normal of a potential line)
    gangle = jnp.arctan2(gy, gx)  # [-pi, pi], line normal direction

    angles = jnp.linspace(0.0, jnp.pi, N_ANGLES, endpoint=False)
    diag = float(np.hypot(h, w))
    n_rho = int(2 * diag / RHO_BIN) + 2

    # vote only into the angle bin matching the pixel's gradient direction
    # (classic gradient-guided Hough: 1 vote per edge pixel, not N_ANGLES)
    ga = jnp.mod(gangle, jnp.pi)
    abin = jnp.clip((ga / jnp.pi * N_ANGLES).astype(jnp.int32), 0, N_ANGLES - 1)
    # per-pixel cos/sin of the quantized angle computed directly (a table
    # gather per pixel costs ~0.6 ms; two transcendentals cost ~10 us)
    abin_ang = abin.astype(jnp.float32) * (jnp.pi / N_ANGLES)
    ca = jnp.cos(abin_ang)
    sa = jnp.sin(abin_ang)
    rho = xs * ca + ys * sa
    rbin = jnp.clip(((rho + diag) / RHO_BIN).astype(jnp.int32), 0, n_rho - 1)
    flat_bin = abin * n_rho + rbin
    # vote accumulation as a one-hot MXU contraction instead of a
    # scatter-add: votes[a, r] = sum_p edge_p [abin_p==a][rbin_p==r].
    # The scatter lowers to a serialized per-update loop on TPU (~0.5 ms);
    # the (A, HW) x (HW, R) bf16 matmul with fused one-hot operands rides
    # the MXU (exact: products are 0/1, accumulation in f32).
    a_flat = abin.ravel()
    r_flat = rbin.ravel()
    oh_a = (
        a_flat[:, None] == jnp.arange(N_ANGLES, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16)
    oh_r = (
        r_flat[:, None] == jnp.arange(n_rho, dtype=jnp.int32)[None, :]
    ).astype(jnp.bfloat16) * edge.ravel().astype(jnp.bfloat16)[:, None]
    votes = jax.lax.dot_general(
        oh_a, oh_r, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (N_ANGLES, n_rho)

    # accumulate split votes from gradient noise (3x3 box sum), then NMS
    vpad = jnp.pad(votes, 1)
    neigh = jnp.stack(
        [vpad[i : i + N_ANGLES, j : j + n_rho] for i in range(3) for j in range(3)]
    )
    v = jnp.sum(neigh, axis=0)
    vpad2 = jnp.pad(v, 2)
    neigh2 = jnp.stack(
        [vpad2[i : i + N_ANGLES, j : j + n_rho] for i in range(5) for j in range(5)]
    )
    is_max = v >= jnp.max(neigh2, axis=0)
    v_nms = jnp.where(is_max, v, 0.0)

    top_v, top_i = jax.lax.top_k(v_nms.ravel(), n_lines)
    top_a = top_i // n_rho
    top_r = top_i % n_rho

    # ---- pixel -> line assignment via a bin-ownership grid: O(H*W + L)
    # instead of the L x H x W dense support tensors.  Each selected line
    # claims its (angle, rho) bin plus a +-ANG_W x +-RHO_W neighborhood in
    # the vote grid; an edge pixel supports the line that owns the pixel's
    # own vote bin.  Stronger lines overwrite weaker ones (scatter order).
    ANG_W, RHO_W = 4, 2
    # one scatter-max instead of 45 serialized scatters: encode strength
    # priority (strongest line = largest value), scatter all (line,
    # neighborhood-offset) claims at once, decode back to line index
    line_idx = jnp.arange(n_lines, dtype=jnp.int32)
    das = jnp.arange(-ANG_W, ANG_W + 1, dtype=jnp.int32)
    drs = jnp.arange(-RHO_W, RHO_W + 1, dtype=jnp.int32)
    a_i = (top_a[:, None, None] + das[None, :, None]) % N_ANGLES
    r_i = jnp.clip(top_r[:, None, None] + drs[None, None, :], 0, n_rho - 1)
    bins3 = a_i * n_rho + r_i  # (L, 2*ANG_W+1, 2*RHO_W+1)
    bins = bins3.ravel()
    prio = jnp.broadcast_to(
        (n_lines - line_idx)[:, None, None], bins3.shape
    ).ravel()
    prio_grid = jnp.zeros((N_ANGLES * n_rho,), jnp.int32).at[bins].max(prio)
    owner = jnp.where(prio_grid > 0, n_lines - prio_grid, -1)
    pix_line = jnp.where(edge, owner[flat_bin], -1)  # (h, w)

    # per-line moments as ONE one-hot matmul on the MXU: 6 segment
    # scatter-adds over H*W pixels cost ~4 ms as scatters; as a
    # (L, HW) @ (HW, 6) product they cost microseconds.  The one-hot
    # membership matrix is reused for the extent min/max below.
    L = n_lines
    wpix = jnp.where(pix_line >= 0, mag, 0.0).ravel()
    xf, yf = xs.ravel(), ys.ravel()

    member = pix_line.ravel()[:, None] == jnp.arange(L, dtype=jnp.int32)[None, :]
    cols = jnp.stack(
        [wpix, wpix * xf, wpix * yf, wpix * xf * xf, wpix * xf * yf, wpix * yf * yf],
        -1,
    )  # (HW, 6)
    sums = jax.lax.dot_general(
        member.astype(jnp.float32), cols,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (L, 6)
    wsum = sums[:, 0].clip(1e-6)
    mx = sums[:, 1] / wsum
    my = sums[:, 2] / wsum
    cxx = sums[:, 3] / wsum - mx * mx
    cxy = sums[:, 4] / wsum - mx * my
    cyy = sums[:, 5] / wsum - my * my
    # principal eigenvector of [[cxx,cxy],[cxy,cyy]] (largest eigenvalue)
    tr = cxx + cyy
    det = cxx * cyy - cxy * cxy
    lam = 0.5 * tr + jnp.sqrt(jnp.clip(0.25 * tr * tr - det, 0.0))
    ex = jnp.where(jnp.abs(cxy) > 1e-9, lam - cyy, 1.0)
    ey = jnp.where(jnp.abs(cxy) > 1e-9, cxy, 0.0)
    # degenerate fallback: axis-aligned
    ex = jnp.where((jnp.abs(cxy) <= 1e-9) & (cyy > cxx), 0.0, ex)
    ey = jnp.where((jnp.abs(cxy) <= 1e-9) & (cyy > cxx), 1.0, ey)
    en = jnp.sqrt(ex * ex + ey * ey).clip(1e-9)
    dirx, diry = ex / en, ey / en  # refit line direction
    # refit normal/rho replace the quantized Hough parameters
    line_ca = -diry
    line_sa = dirx
    line_rho = mx * line_ca + my * line_sa

    # extent: segment min/max of the projection parameter along the refit
    # direction, gated by distance to the refit line.  Per-pixel line
    # parameters come from a small (HW, L) @ (L, 5) matmul instead of
    # table gathers; min/max reduce over the masked membership matrix.
    big = 1e9
    line_params = jnp.stack([line_ca, line_sa, line_rho, dirx, diry], -1)
    pp = jax.lax.dot_general(
        member.astype(jnp.float32), line_params,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (HW, 5): per-pixel params of its owning line (0 when unassigned)
    dist_pix = jnp.abs(xf * pp[:, 0] + yf * pp[:, 1] - pp[:, 2])
    assigned = (pix_line.ravel() >= 0) & (dist_pix < 2.5)
    t_pix = xf * pp[:, 3] + yf * pp[:, 4]
    mship = member & assigned[:, None]  # (HW, L)
    tmin = jnp.min(jnp.where(mship, t_pix[:, None], big), axis=0)
    tmax = jnp.max(jnp.where(mship, t_pix[:, None], -big), axis=0)
    n_support = jnp.sum(mship.astype(jnp.float32), axis=0)

    length = tmax - tmin
    density = n_support / jnp.maximum(length, 1.0)
    # one-pixel-one-line assignment undercounts support vs the dense
    # method, so the support/density gates are correspondingly lower
    valid = (
        (top_v > 0)
        & (n_support >= min_support)
        & (length >= min_length)
        & (length < diag)
        & (density > min_density)
    )

    # endpoints: foot of the line at tmin / tmax along the refit direction
    px = line_ca * line_rho
    py = line_sa * line_rho
    sp = jnp.stack([px + tmin * dirx, py + tmin * diry], -1)
    ep = jnp.stack([px + tmax * dirx, py + tmax * diry], -1)

    sph = jnp.concatenate([sp, jnp.ones((n_lines, 1))], -1)
    eph = jnp.concatenate([ep, jnp.ones((n_lines, 1))], -1)
    eq = jnp.cross(sph, eph)
    eq = eq / jnp.linalg.norm(eq, axis=-1, keepdims=True).clip(1e-9)

    return {
        "sp": sp, "ep": ep, "eq": eq,
        "response": n_support.astype(jnp.float32),
        "valid": valid,
        "angle": jnp.arctan2(ep[:, 1] - sp[:, 1], ep[:, 0] - sp[:, 0]),
    }


@jax.jit
def line_descriptors(gray: jnp.ndarray, sp: jnp.ndarray, ep: jnp.ndarray):
    """LBD-like band descriptor: gradient stats in 7 bands parallel to the
    segment, sampled at 24 points along it.  (L, 28) float32, L2-normalized.
    """
    S = 24
    gx, gy = sobel(gray)
    h, w = gray.shape
    d = ep - sp
    length = jnp.linalg.norm(d, axis=-1, keepdims=True).clip(1e-6)
    u = d / length  # along
    n = jnp.stack([-u[:, 1], u[:, 0]], -1)  # normal
    ts = jnp.linspace(0.05, 0.95, S)
    bands = jnp.arange(DESC_BANDS, dtype=jnp.float32) - (DESC_BANDS - 1) / 2

    # sample positions: (L, S, B, 2)
    base = sp[:, None, :] + ts[None, :, None] * d[:, None, :]
    pos = base[:, :, None, :] + bands[None, None, :, None] * 2.0 * n[:, None, None, :]
    xi = jnp.clip(jnp.round(pos[..., 0]), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(pos[..., 1]), 0, h - 1).astype(jnp.int32)
    sgx = gx[yi, xi]
    sgy = gy[yi, xi]
    # gradient components along/perpendicular to the line
    g_par = sgx * u[:, None, None, 0] + sgy * u[:, None, None, 1]
    g_per = sgx * n[:, None, None, 0] + sgy * n[:, None, None, 1]
    feats = jnp.concatenate(
        [
            jnp.mean(g_par, axis=1), jnp.std(g_par, axis=1),
            jnp.mean(g_per, axis=1), jnp.std(g_per, axis=1),
        ],
        -1,
    )  # (L, 4*B)
    return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True).clip(1e-6)


def _whiten_factors(pts: jnp.ndarray, f: jnp.ndarray):
    """Closed-form whitening factor L with L^T L = Sigma^{-1} for the
    anisotropic backprojection covariance Sigma = J diag(1,1,sigma_d^2) J^T,
    J = [[z/f,0,x/z],[0,z/f,y/z],[0,0,1]] (3DLineExtractor.cpp:74-90).

    The reference decomposes Sigma by SVD per point; any L with
    L^T L = Sigma^{-1} gives the identical Mahalanobis point-line distance
    (whitening is unique up to rotation, and both |u x v| and |u - v| are
    rotation-invariant), so we use the triangular factor
    L = diag(1,1,sigma_d)^{-1} J^{-1} — closed form, no decomposition:
    rows (f/z, 0, -x f/z^2), (0, f/z, -y f/z^2), (0, 0, 1/sigma_d).
    Returns (f_z, cx_z, cy_z, inv_sig), each (..., ) like pts[..., 0].
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    zc = z.clip(1e-6)
    # depthStdDev (3DLineExtractor.cpp:60-72): c1 d^2 + c2 d + c3
    sig = (0.00273 * z * z + 0.00074 * z - 0.00058).clip(1e-4)
    f_z = f / zc
    return f_z, x * f_z / zc, y * f_z / zc, 1.0 / sig


def _mah_dist_sq(pts, fw, q1, q2):
    """Squared Mahalanobis distance of each point to the 3D line (q1,q2)
    under its own covariance (mah_dist3d_pt_line, 3DLineExtractor.cpp:
    264-296): whiten both endpoint offsets by the point's L, then the
    point-line distance in whitened space = |u x v| / |u - v|.

    pts (..., 3) broadcast against q1/q2 (..., 3); fw = whitening factors
    of pts (each broadcastable to pts[..., 0]).
    """
    f_z, cx, cy, inv_sig = fw

    def whiten(d):
        return jnp.stack(
            [
                f_z * d[..., 0] - cx * d[..., 2],
                f_z * d[..., 1] - cy * d[..., 2],
                inv_sig * d[..., 2],
            ],
            -1,
        )

    u = whiten(pts - q1)
    v = whiten(pts - q2)
    num = jnp.sum(jnp.cross(u, v) ** 2, -1)
    den = jnp.sum((u - v) ** 2, -1).clip(1e-12)
    return num / den


@partial(jax.jit, static_argnames=("n_samples", "n_hyp"))
def lift_lines_3d(
    depth: jnp.ndarray,
    K: jnp.ndarray,
    sp: jnp.ndarray,
    ep: jnp.ndarray,
    valid: jnp.ndarray,
    n_samples: int = 64,
    n_hyp: int = 10,
) -> dict:
    """Lift 2D segments to 3D camera-frame segments from depth samples.

    RANSAC over 2-point hypotheses under the anisotropic per-point
    Mahalanobis point-line distance (3DLineExtractor.cpp:118-206:
    threshold 1.5, <=10 hypotheses, backprojection-Jacobian covariance),
    then a fixed-round analog of the reference's refit/re-select loop
    (:169-186), endpoints from inlier projections onto the fitted line.
    Returns sp3 (L,3), ep3 (L,3), ok (L,).
    """
    h, w = depth.shape
    L = sp.shape[0]
    ts = jnp.linspace(0.0, 1.0, n_samples)
    pos = sp[:, None, :] + ts[None, :, None] * (ep - sp)[:, None, :]  # (L,S,2)
    xi = jnp.clip(jnp.round(pos[..., 0]), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(pos[..., 1]), 0, h - 1).astype(jnp.int32)
    z = depth[yi, xi]  # (L, S)
    good = z > 0
    # back-project the ROUNDED pixel (the one whose depth was read), not
    # the fractional sample position: mixing a fractional ray with the
    # nearest pixel's depth puts samples off the true 3D line by up to
    # half a pixel TIMES the per-column depth jump — meters of cross-track
    # scatter on grazing-angle lines (the reference samples integer pixels
    # along the segment, 3DLineExtractor.cpp:118-150)
    x3 = (xi.astype(z.dtype) - K[0, 2]) / K[0, 0] * z
    y3 = (yi.astype(z.dtype) - K[1, 2]) / K[1, 1] * z
    pts = jnp.stack([x3, y3, z], -1)  # (L, S, 3)
    fw = _whiten_factors(pts, K[0, 0])  # each (L, S)

    # hypotheses: pairs spread along the segment
    i0 = jnp.linspace(0, n_samples // 2 - 1, n_hyp).astype(jnp.int32)
    i1 = jnp.linspace(n_samples // 2, n_samples - 1, n_hyp).astype(jnp.int32)
    a = pts[:, i0, :]  # (L, H, 3)
    b = pts[:, i1, :]
    hyp_ok = good[:, i0] & good[:, i1] & (
        jnp.sum((b - a) ** 2, -1) > 1e-12
    )

    # Mahalanobis point-line distances: (L, H, S)
    fw_h = tuple(t[:, None, :] for t in fw)
    d2 = _mah_dist_sq(
        pts[:, None, :, :], fw_h, a[:, :, None, :], b[:, :, None, :]
    )
    inl = (d2 < 1.5**2) & good[:, None, :] & hyp_ok[:, :, None]
    n_inl = jnp.sum(inl, -1)  # (L, H)
    best = jnp.argmax(n_inl, -1)  # (L,)
    bi = jnp.arange(L)
    best_inl = inl[bi, best]  # (L, S)

    # refit/re-select (fixed 2 rounds — the compile-friendly analog of the
    # reference's while-improving loop): principal direction of inliers,
    # then re-gate every sample by Mahalanobis distance to the fitted line
    def refit(inliers):
        wgt = inliers.astype(jnp.float32)
        nw = jnp.sum(wgt, -1, keepdims=True).clip(1.0)
        mean = jnp.sum(pts * wgt[..., None], 1) / nw
        cen = (pts - mean[:, None, :]) * wgt[..., None]
        cov = jnp.einsum("lsi,lsj->lij", cen, cen) / nw[..., None]
        _, direction = eig33.eig33_largest(cov)
        return mean, direction

    for _ in range(2):
        mean, direction = refit(best_inl)
        d2_fit = _mah_dist_sq(
            pts, fw, mean[:, None, :], (mean + direction)[:, None, :]
        )
        re_inl = (d2_fit < 1.5**2) & good
        # only adopt the reselection where it does not shrink the set
        # (the reference keeps the larger inlier set, :180-185)
        take = jnp.sum(re_inl, -1) >= jnp.sum(best_inl, -1)
        best_inl = jnp.where(take[:, None], re_inl, best_inl)

    best_n = jnp.sum(best_inl, -1)
    mean, direction = refit(best_inl)

    t_proj = jnp.sum((pts - mean[:, None, :]) * direction[:, None, :], -1)
    t_proj = jnp.where(best_inl, t_proj, 0.0)
    t0 = jnp.min(jnp.where(best_inl, t_proj, 1e9), -1)
    t1 = jnp.max(jnp.where(best_inl, t_proj, -1e9), -1)
    sp3 = mean + t0[:, None] * direction
    ep3 = mean + t1[:, None] * direction

    # sub-segment occupancy verification (3DLineExtractor.cpp:208-261):
    # split the fitted extent into 10 cells; inliers must occupy >= 70% of
    # them, rejecting "lines" whose support clusters at the ends (e.g. two
    # co-linear patches across a depth discontinuity)
    n_cells = 10
    span = (t1 - t0).clip(1e-6)
    cell = jnp.clip(
        (t_proj - t0[:, None]) / span[:, None] * n_cells, 0.0, n_cells - 1e-3
    ).astype(jnp.int32)
    occupied = jnp.any(
        (cell[:, :, None] == jnp.arange(n_cells)[None, None, :])
        & best_inl[:, :, None],
        axis=1,
    )  # (L, n_cells)
    occ_ratio = jnp.mean(occupied.astype(jnp.float32), axis=-1)

    ok = (
        valid
        & (best_n >= n_samples // 3)
        & ((t1 - t0) > 0.05)
        & (occ_ratio >= 0.7)
    )
    return {
        "sp3": sp3, "ep3": ep3, "ok": ok, "n_inliers": best_n,
        "occ_ratio": occ_ratio,
    }
