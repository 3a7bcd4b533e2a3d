import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.ops import lines as line_ops


def draw_segment(img, x0, y0, x1, y1, val=250.0, thickness=2):
    n = int(max(abs(x1 - x0), abs(y1 - y0)) * 2 + 1)
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    for dx in range(-thickness, thickness + 1):
        for dy in range(-thickness, thickness + 1):
            xi = np.clip(np.round(xs + dx), 0, img.shape[1] - 1).astype(int)
            yi = np.clip(np.round(ys + dy), 0, img.shape[0] - 1).astype(int)
            img[yi, xi] = val
    return img


def seg_distance(sp, ep, gt_sp, gt_ep):
    """Max endpoint distance to the ground-truth segment (order-invariant)."""
    d1 = max(np.linalg.norm(sp - gt_sp), np.linalg.norm(ep - gt_ep))
    d2 = max(np.linalg.norm(sp - gt_ep), np.linalg.norm(ep - gt_sp))
    return min(d1, d2)


def test_detect_single_horizontal_line():
    img = np.full((120, 160), 30.0, np.float32)
    draw_segment(img, 20, 60, 140, 60)
    out = line_ops.detect_lines(jnp.asarray(img), 16)
    v = np.asarray(out["valid"])
    assert v.sum() >= 1
    sp = np.asarray(out["sp"])[v]
    ep = np.asarray(out["ep"])[v]
    best = np.argmin(
        [seg_distance(s, e, np.array([20, 60]), np.array([140, 60])) for s, e in zip(sp, ep)]
    )
    assert seg_distance(sp[best], ep[best], np.array([20, 60]), np.array([140, 60])) < 8


def point_line_dist(p, a, b):
    d = b - a
    n = np.array([-d[1], d[0]]) / np.linalg.norm(d)
    return abs((p - a) @ n)


def test_detect_diagonal_and_vertical():
    # thickness=1: a thick stroke has two border edges +-2.5 px off the
    # centerline and the detector (correctly, like LSD) locks onto them
    img = np.full((120, 160), 30.0, np.float32)
    draw_segment(img, 80, 10, 80, 110, thickness=1)  # vertical
    draw_segment(img, 10, 10, 120, 100, thickness=1)  # diagonal
    out = line_ops.detect_lines(jnp.asarray(img), 16)
    v = np.asarray(out["valid"])
    assert v.sum() >= 2
    sp, ep = np.asarray(out["sp"])[v], np.asarray(out["ep"])[v]
    d_vert = min(
        seg_distance(s, e, np.array([80, 10]), np.array([80, 110])) for s, e in zip(sp, ep)
    )
    assert d_vert < 10
    # diagonal may fragment under Hough quantization; the pose residual uses
    # the infinite-line equation, so check fragment-on-line + coverage
    ga, gb = np.array([10.0, 10.0]), np.array([120.0, 100.0])
    on_line = [
        (s, e)
        for s, e in zip(sp, ep)
        if point_line_dist(s, ga, gb) < 4 and point_line_dist(e, ga, gb) < 4
    ]
    assert on_line, "no fragment lies on the diagonal"
    covered = sum(np.linalg.norm(e - s) for s, e in on_line)
    assert covered > 0.5 * np.linalg.norm(gb - ga)


def test_line_equation_contains_endpoints():
    img = np.full((120, 160), 30.0, np.float32)
    draw_segment(img, 20, 20, 140, 90)
    out = line_ops.detect_lines(jnp.asarray(img), 8)
    v = np.asarray(out["valid"])
    eq = np.asarray(out["eq"])[v]
    sp = np.asarray(out["sp"])[v]
    ep = np.asarray(out["ep"])[v]
    for i in range(len(eq)):
        r1 = abs(eq[i] @ np.array([sp[i, 0], sp[i, 1], 1.0]))
        r2 = abs(eq[i] @ np.array([ep[i, 0], ep[i, 1], 1.0]))
        assert r1 < 1e-3 and r2 < 1e-3


def test_flat_image_no_lines():
    img = np.full((120, 160), 100.0, np.float32)
    out = line_ops.detect_lines(jnp.asarray(img), 8)
    assert np.asarray(out["valid"]).sum() == 0


def test_descriptors_match_same_line(rng):
    img = rng.uniform(20, 60, (120, 160)).astype(np.float32)
    draw_segment(img, 20, 40, 140, 45)
    draw_segment(img, 30, 90, 130, 100, val=200.0)
    sp = jnp.array([[20.0, 40], [30, 90]])
    ep = jnp.array([[140.0, 45], [130, 100]])
    d1 = np.asarray(line_ops.line_descriptors(jnp.asarray(img), sp, ep))
    # shifted image: same lines 2 px right
    img2 = np.roll(img, 2, axis=1)
    d2 = np.asarray(
        line_ops.line_descriptors(jnp.asarray(img2), sp + jnp.array([2.0, 0]), ep + jnp.array([2.0, 0]))
    )
    sim = d1 @ d2.T
    assert sim[0, 0] > sim[0, 1] and sim[1, 1] > sim[1, 0]
    assert sim[0, 0] > 0.9


def test_lift_lines_3d_planar_segment():
    # depth of a frontal plane at z=2: the segment lifts to a 3D segment on it
    depth = np.full((120, 160), 2.0, np.float32)
    K = jnp.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    sp = jnp.array([[20.0, 60.0]])
    ep = jnp.array([[140.0, 60.0]])
    out = line_ops.lift_lines_3d(jnp.asarray(depth), K, sp, ep, jnp.array([True]))
    assert bool(out["ok"][0])
    sp3, ep3 = np.asarray(out["sp3"])[0], np.asarray(out["ep3"])[0]
    np.testing.assert_allclose([sp3[2], ep3[2]], 2.0, atol=0.01)
    # x extent: (20-80)/100*2 = -1.2 ... (140-80)/100*2 = 1.2
    assert abs(abs(ep3[0] - sp3[0]) - 2.4) < 0.05


def test_lift_lines_3d_rejects_depth_jump(rng):
    # segment crossing a depth discontinuity: half at 1 m, half at 4 m
    depth = np.full((120, 160), 1.0, np.float32)
    depth[:, 80:] = 4.0
    K = jnp.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    sp = jnp.array([[20.0, 60.0]])
    ep = jnp.array([[140.0, 60.0]])
    out = line_ops.lift_lines_3d(jnp.asarray(depth), K, sp, ep, jnp.array([True]))
    # RANSAC picks one side; endpoints must lie on a consistent depth
    sp3, ep3 = np.asarray(out["sp3"])[0], np.asarray(out["ep3"])[0]
    if bool(out["ok"][0]):
        assert abs(sp3[2] - ep3[2]) < 0.2


def _mah_dist_ref(pt, f, cu, cv, q1, q2):
    """Direct NumPy port of the reference's SVD path: compPt3dCov
    (3DLineExtractor.cpp:74-116) + mah_dist3d_pt_line (:264-296)."""
    x, y, z = pt
    J = np.array([[z / f, 0, x / z], [0, z / f, y / z], [0, 0, 1.0]])
    sig = max(0.00273 * z * z + 0.00074 * z - 0.00058, 1e-4)
    cov = J @ np.diag([1.0, 1.0, sig * sig]) @ J.T
    U, W, _ = np.linalg.svd(cov)
    DU = np.diag(1.0 / np.sqrt(W)) @ U.T  # = Sigma^{-1/2}
    u = DU @ (pt - q1)
    v = DU @ (pt - q2)
    return np.linalg.norm(np.cross(u, v)) / np.linalg.norm(u - v)


def test_mahalanobis_matches_reference_svd_path(rng):
    """The closed-form triangular whitening (no SVD) must reproduce the
    reference's SVD-decomposed Mahalanobis point-line distance, including
    on grazing-angle lines where the covariance anisotropy dominates."""
    f, cu, cv = 525.0, 319.5, 239.5
    # grazing-angle 3D line: nearly along the viewing ray (depth varies
    # 10x along it) plus random points around it
    q1 = np.array([0.2, 0.1, 0.5])
    q2 = np.array([0.6, 0.3, 5.0])
    pts = np.stack(
        [
            q1 + t * (q2 - q1) + rng.normal(scale=0.05, size=3)
            for t in np.linspace(0.0, 1.0, 16)
        ]
    ).astype(np.float64)
    pts[:, 2] = np.clip(pts[:, 2], 0.3, None)
    want = np.array([_mah_dist_ref(p, f, cu, cv, q1, q2) for p in pts])
    fw = line_ops._whiten_factors(jnp.asarray(pts), jnp.float32(f))
    got = np.sqrt(
        np.asarray(
            line_ops._mah_dist_sq(
                jnp.asarray(pts), fw, jnp.asarray(q1), jnp.asarray(q2)
            )
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_lift_lines_3d_grazing_angle():
    # a wall plane x = 0.3 viewed nearly edge-on: depth along the
    # horizontal scanline varies strongly; the anisotropic metric must
    # still accept the (perfectly straight) lifted line
    H, W = 120, 160
    K = jnp.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    us = np.arange(81, 160, dtype=np.float64)
    depth = np.zeros((H, W), np.float32)
    # z from x=0.3 plane: x3 = (u-cu)/f * z = 0.3 -> z = 0.3*f/(u-cu)
    for u in us.astype(int):
        depth[:, u] = 0.3 * 100.0 / (u - 80.0 + 0.5)
    sp = jnp.array([[82.0, 60.0]])
    ep = jnp.array([[158.0, 60.0]])
    out = line_ops.lift_lines_3d(jnp.asarray(depth), K, sp, ep, jnp.array([True]))
    assert bool(out["ok"][0])
    sp3, ep3 = np.asarray(out["sp3"])[0], np.asarray(out["ep3"])[0]
    # the samples lie exactly on the 3D line x = 0.3 - 0.005 z, y = 0
    # (the half-pixel offset makes x linear in z, not constant)
    np.testing.assert_allclose(sp3[0], 0.3 - 0.005 * sp3[2], atol=0.01)
    np.testing.assert_allclose(ep3[0], 0.3 - 0.005 * ep3[2], atol=0.01)
    # strong depth variation along the line actually exercised
    assert abs(sp3[2] - ep3[2]) > 5.0
