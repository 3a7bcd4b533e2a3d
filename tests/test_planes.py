import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.ops import planes as plane_ops


def make_depth_plane(h=240, w=320, f=160.0, normal=(0, 0, 1.0), d=-3.0):
    """Depth image of an infinite plane n.x + d = 0 seen by a pinhole cam."""
    cx, cy = w / 2 - 0.5, h / 2 - 0.5
    xs = (np.arange(w) - cx) / f
    ys = (np.arange(h) - cy) / f
    n = np.asarray(normal, np.float64)
    # ray r = (x, y, 1) * z; n . r z + d = 0 -> z = -d / (n . r)
    denom = n[0] * xs[None, :] + n[1] * ys[:, None] + n[2]
    z = -d / denom
    z[denom <= 1e-6] = 0
    return z.astype(np.float32), (f, cx, cy)


def K_of(f, cx, cy):
    return np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)


def test_depth_to_points_backprojection():
    depth, (f, cx, cy) = make_depth_plane()
    pts = np.asarray(
        plane_ops.depth_to_points(jnp.asarray(depth), jnp.asarray(K_of(f, cx, cy)))
    )
    assert pts.shape == (120, 160, 3)
    # every valid point lies on the z=3 plane
    np.testing.assert_allclose(pts[60, 80, 2], 3.0, atol=0.01)
    valid = np.isfinite(pts[..., 2])
    np.testing.assert_allclose(pts[valid][:, 2], 3.0, atol=0.01)


def test_block_stats_single_plane():
    depth, (f, cx, cy) = make_depth_plane(normal=(0.0, 0.6, 0.8), d=-2.0)
    pts = plane_ops.depth_to_points(jnp.asarray(depth), jnp.asarray(K_of(f, cx, cy)))
    st = plane_ops.block_stats(pts)
    v = np.asarray(st["valid"])
    assert v.mean() > 0.8
    nrm = np.asarray(st["normal"])[v]
    # all block normals agree with the gt plane normal (up to sign handled
    # by camera-facing orientation: gt normal (0,.6,.8) faces away)
    dots = np.abs(nrm @ np.array([0.0, 0.6, 0.8]))
    assert (dots > 0.999).mean() > 0.95
    assert np.asarray(st["mse"])[v].max() < 1e-4


def test_extract_planes_box_scene(synthetic_seq):
    t, gray, depth = synthetic_seq.frame(0)
    cam = synthetic_seq.cam
    out = plane_ops.extract_planes(
        depth, K_of(cam.fx, cam.cx, cam.cy), max_planes=8, max_points=256,
    )
    n_planes = out["valid"].sum()
    assert n_planes >= 2  # floor/wall(s) visible in the box room
    # every plane's cloud satisfies its own equation
    for i in range(8):
        if not out["valid"][i]:
            continue
        c = out["coeffs"][i]
        cl = out["cloud"][i, : out["n_pts"][i]]
        assert np.abs(cl @ c[:3] + c[3]).max() < 0.08
        assert abs(np.linalg.norm(c[:3]) - 1) < 1e-4
        assert c[3] >= 0  # Plane3D convention
    # membership image marks plane pixels
    assert (out["membership"] >= 0).mean() > 0.3


def test_extract_planes_perpendicular_geometry(synthetic_seq):
    """Walls of the box room must be mutually perpendicular in camera frame."""
    t, gray, depth = synthetic_seq.frame(0)
    cam = synthetic_seq.cam
    out = plane_ops.extract_planes(
        depth, K_of(cam.fx, cam.cx, cam.cy), max_planes=8, max_points=256,
    )
    normals = out["coeffs"][out["valid"]][:, :3]
    if len(normals) >= 2:
        # each pair: either near-parallel or near-perpendicular (box geometry)
        for i in range(len(normals)):
            for j in range(i + 1, len(normals)):
                c = abs(float(normals[i] @ normals[j]))
                assert c > 0.95 or c < 0.1, f"pair ({i},{j}) cos={c:.3f}"


def test_no_planes_in_noise(rng):
    depth = rng.uniform(0.5, 6.0, (240, 320)).astype(np.float32)
    out = plane_ops.extract_planes(
        depth, K_of(160.0, 159.5, 119.5), max_planes=8, max_points=128,
    )
    assert out["valid"].sum() == 0


def _block_stats_np(depth, K):
    pts = plane_ops.depth_to_points(jnp.asarray(depth), jnp.asarray(K))
    st = plane_ops.block_stats(pts)
    return {k: np.asarray(v) for k, v in st.items()}, pts


def _partition_equal(la, lb):
    """Two labelings describe the same partition (up to renaming)?"""
    assert la.shape == lb.shape
    if (la < 0).sum() != (lb < 0).sum() or ((la < 0) != (lb < 0)).any():
        return False
    fwd, bwd = {}, {}
    for a, b in zip(la[la >= 0], lb[lb >= 0]):
        if fwd.setdefault(a, b) != b or bwd.setdefault(b, a) != a:
            return False
    return True


def test_native_ahc_matches_python(synthetic_seq):
    """The C++ AHC merge (native/ahc_merge.cpp) produces the same
    partition as the pure-Python exact merge."""
    from manhattanslam_tpu.ops import native

    if not native.have_native():
        pytest.skip("native library unavailable")
    t, gray, depth = synthetic_seq.frame(0)
    cam = synthetic_seq.cam
    st, _ = _block_stats_np(depth, K_of(cam.fx, cam.cx, cam.cy))
    h, w = depth.shape[0] // 2, depth.shape[1] // 2
    grid = (h // plane_ops.BLOCK, w // plane_ops.BLOCK)
    min_support = int(0.04 * h * w)
    lab_py = plane_ops.merge_blocks_py(st, grid, min_support)
    lab_cc = plane_ops.merge_blocks(st, grid, min_support, use_native=True)
    assert _partition_equal(lab_py, lab_cc), "native/python AHC diverge"


def test_device_merge_matches_exact_ahc(synthetic_seq):
    """Quantified divergence of the device label-propagation merge vs the
    exact AHC merge (SURVEY.md section 7 hard-part 2): on box-room depth,
    every major AHC plane must have a device counterpart within 3 deg /
    3 cm, and the plane COUNTS must agree."""
    t, gray, depth = synthetic_seq.frame(0)
    cam = synthetic_seq.cam
    K = K_of(cam.fx, cam.cx, cam.cy)
    dev = plane_ops.extract_planes(depth, K, 8, 256, method="device")
    ahc = plane_ops.extract_planes(depth, K, 8, 256, method="ahc")
    na = int(ahc["valid"].sum())
    nd = int(dev["valid"].sum())
    assert na >= 2
    assert nd == na, f"device {nd} planes vs exact AHC {na}"
    ca = ahc["coeffs"][ahc["valid"]]
    cd = dev["coeffs"][dev["valid"]]
    for c in ca:
        cos = np.abs(cd[:, :3] @ c[:3])
        d_diff = np.abs(cd[:, 3] - c[3])
        cand = (cos > np.cos(np.radians(3.0))) & (d_diff < 0.03)
        assert cand.any(), f"no device match for {c} (cos={cos}, dd={d_diff})"


def test_device_membership_iou_vs_ahc_phototex():
    """PEAC refinement parity: on the photo-textured scene with quadratic
    Kinect-like depth noise, the all-device pipeline's pixel membership
    (erosion + flood-fill refinement, dynamic T_ang/T_mse/T_dz) must
    agree with the exact-AHC path at IoU >= 0.9 per matched plane
    (VERDICT round-2 item 4; AHCPlaneFitter.hpp:294-520 +
    AHCParamSet.hpp:86-146)."""
    from manhattanslam_tpu.config import CameraConfig
    from manhattanslam_tpu.datasets.phototex import PhotoSequence

    cam = CameraConfig(
        fx=160.0, fy=160.0, cx=95.5, cy=71.5, k1=0, k2=0, p1=0, p2=0, k3=0,
        width=192, height=144,
    )
    seq = PhotoSequence(n_frames=2, cam=cam, view="corner")
    t, gray, depth = seq.frame(0)
    K = K_of(cam.fx, cam.cx, cam.cy)
    dev = plane_ops.extract_planes(depth, K, 8, 256, method="device")
    ahc = plane_ops.extract_planes(depth, K, 8, 256, method="ahc")
    na = int(ahc["valid"].sum())
    assert na >= 2  # floor + wall(s) under noise
    ma = np.asarray(ahc["membership"])
    md = np.asarray(dev["membership"])
    matched = 0
    for i in np.nonzero(ahc["valid"])[0]:
        a = ma == i
        # device plane with the same geometry (normal/offset)
        c = ahc["coeffs"][i]
        cos = np.abs(dev["coeffs"][:, :3] @ c[:3])
        dd = np.abs(dev["coeffs"][:, 3] - c[3])
        cand = np.nonzero(dev["valid"] & (cos > np.cos(np.radians(5.0))) & (dd < 0.05))[0]
        assert len(cand), f"no device plane matches AHC plane {i}"
        best_iou = 0.0
        for j in cand:
            b = md == j
            inter = (a & b).sum()
            union = (a | b).sum()
            best_iou = max(best_iou, inter / max(union, 1))
        assert best_iou >= 0.9, f"plane {i}: IoU {best_iou:.3f}"
        matched += 1
    assert matched == na
