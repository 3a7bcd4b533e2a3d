import jax.numpy as jnp
import numpy as np
import pytest

from manhattanslam_tpu.config import CameraConfig, SlamConfig, replace
from manhattanslam_tpu.frontend.frame import build_extractor, backproject_keypoints
from manhattanslam_tpu.ops import fast as fast_ops
from manhattanslam_tpu.ops import orb as orb_ops


def checkerboard(h, w, sq=16):
    """Grid of isolated bright squares (L-junction corners; FAST-9 does not
    fire on ideal checkerboard X-corners where the arc is exactly 8)."""
    ys, xs = np.mgrid[0:h, 0:w]
    inside = ((ys % (2 * sq)) < sq) & ((xs % (2 * sq)) < sq)
    return (inside * 200.0 + 20.0).astype(np.float32)


def small_cfg(h=144, w=192):
    cam = CameraConfig(fx=160, fy=160, cx=w / 2 - 0.5, cy=h / 2 - 0.5,
                       k1=0, k2=0, p1=0, p2=0, k3=0, width=w, height=h)
    cfg = SlamConfig(camera=cam)
    from manhattanslam_tpu.config import CapacityConfig
    return replace(cfg, caps=CapacityConfig(max_keypoints=256))


def test_fast_detects_checker_corners():
    img = jnp.asarray(checkerboard(96, 128))
    score = np.asarray(fast_ops.fast_corners(img))
    ys, xs = np.nonzero(score)
    assert len(ys) > 10
    # square corners live on the 16-px lattice; all detections within 3 px
    assert np.all(np.minimum(ys % 16, 16 - ys % 16) <= 3)
    assert np.all(np.minimum(xs % 16, 16 - xs % 16) <= 3)


def test_fast_flat_image_no_corners():
    img = jnp.full((64, 64), 100.0)
    assert np.asarray(fast_ops.fast_corners(img)).max() == 0


def test_fast_single_bright_dot():
    img = np.full((64, 64), 50.0, np.float32)
    img[32, 32] = 250.0
    score = np.asarray(fast_ops.fast_corners(jnp.asarray(img)))
    ys, xs = np.nonzero(score)
    assert (32, 32) in set(zip(ys, xs))


def test_grid_topk_shapes_and_validity():
    img = jnp.asarray(checkerboard(96, 128))
    score = fast_ops.fast_corners(img)
    xy, resp, valid = orb_ops.select_grid_topk(score, 64)
    assert xy.shape == (64, 2) and valid.shape == (64,)
    v = np.asarray(valid)
    r = np.asarray(resp)
    assert v.sum() > 10
    assert (r[v] > 0).all()
    # responses sorted descending
    assert (np.diff(r) <= 1e-6).all()


def test_ic_angle_gradient_direction():
    # intensity ramp along +x -> centroid to the right -> angle ~ 0
    img = jnp.asarray(np.tile(np.arange(64, dtype=np.float32), (64, 1)))
    xy = jnp.array([[32.0, 32.0]])
    a = float(orb_ops.ic_angle(img, xy)[0])
    assert abs(a) < 0.1
    # ramp along +y -> angle ~ pi/2
    a2 = float(orb_ops.ic_angle(img.T, xy)[0])
    assert abs(a2 - np.pi / 2) < 0.1


def test_descriptor_rotation_steering(rng):
    # a descriptor should be (mostly) stable under in-plane rotation of the
    # patch because the pattern is steered by IC-angle
    from scipy.ndimage import rotate as ndrotate

    img = rng.uniform(0, 255, (96, 96)).astype(np.float32)
    from manhattanslam_tpu.ops.image import gaussian_blur

    sm = np.asarray(gaussian_blur(jnp.asarray(img), 7, 3.0))  # smooth texture
    xy = jnp.array([[48.0, 48.0]])
    a1 = orb_ops.ic_angle(jnp.asarray(sm), xy)
    d1 = orb_ops.brief_descriptors(jnp.asarray(sm), xy, a1)

    rot = ndrotate(sm, 30.0, reshape=False, order=1, mode="nearest")
    a2 = orb_ops.ic_angle(jnp.asarray(rot), xy)
    d2 = orb_ops.brief_descriptors(jnp.asarray(rot), xy, a2)

    dist = int(orb_ops.hamming_distance(d1, d2)[0])
    # random descriptors differ by ~128 bits; steered ones far less
    assert dist < 80


def test_hamming_distance_basic():
    a = jnp.array([[0, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
    b = jnp.array([[0xFFFFFFFF] * 8], jnp.uint32)
    assert int(orb_ops.hamming_distance(a, b)[0]) == 256
    assert int(orb_ops.hamming_distance(a, a)[0]) == 0


def test_unpack_descriptor_bits_roundtrip(rng):
    d = jnp.asarray(rng.integers(0, 2**32, (5, 8), dtype=np.uint32))
    bits = orb_ops.unpack_descriptor_bits(d)
    assert bits.shape == (5, 256)
    # hamming via bits must equal popcount hamming
    d2 = jnp.asarray(rng.integers(0, 2**32, (5, 8), dtype=np.uint32))
    b2 = orb_ops.unpack_descriptor_bits(d2)
    ref = np.asarray(orb_ops.hamming_distance(d, d2))
    via_bits = np.asarray(jnp.sum(jnp.abs(bits - b2), -1)).astype(int)
    np.testing.assert_array_equal(ref, via_bits)


def test_extractor_end_to_end(synthetic_seq):
    cfg = small_cfg()
    extract = build_extractor(cfg)
    t, gray, depth = synthetic_seq.frame(0)
    feats = extract(jnp.asarray(gray), jnp.asarray(depth))
    v = np.asarray(feats["valid"])
    assert v.sum() > 50  # textured room yields plenty of corners
    assert feats["desc"].shape == (256, 8)
    # all valid keypoints inside the image
    xy = np.asarray(feats["xy"])[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < cfg.camera.width).all()
    # depth at keypoints is positive for most (room is closed)
    assert (np.asarray(feats["depth"])[v] > 0).mean() > 0.9
    # u_right = u - bf/d where depth valid
    d = np.asarray(feats["depth"])[v]
    ur = np.asarray(feats["u_right"])[v]
    und = np.asarray(feats["xy_und"])[v]
    ok = d > 0
    np.testing.assert_allclose(ur[ok], und[ok, 0] - cfg.camera.bf / d[ok], rtol=1e-5)


def test_extractor_repeatability(synthetic_seq):
    cfg = small_cfg()
    extract = build_extractor(cfg)
    t, gray, depth = synthetic_seq.frame(0)
    f1 = extract(jnp.asarray(gray), jnp.asarray(depth))
    f2 = extract(jnp.asarray(gray), jnp.asarray(depth))
    np.testing.assert_array_equal(np.asarray(f1["xy"]), np.asarray(f2["xy"]))
    np.testing.assert_array_equal(np.asarray(f1["desc"]), np.asarray(f2["desc"]))


def test_backproject_keypoints(synthetic_seq):
    cfg = small_cfg()
    extract = build_extractor(cfg)
    t, gray, depth = synthetic_seq.frame(0)
    feats = extract(jnp.asarray(gray), jnp.asarray(depth))
    pts = np.asarray(backproject_keypoints(feats, cfg))
    v = np.asarray(feats["valid"]) & (np.asarray(feats["depth"]) > 0)
    assert (pts[v][:, 2] > 0).all()
    # z equals the depth channel
    np.testing.assert_allclose(pts[v][:, 2], np.asarray(feats["depth"])[v], rtol=1e-6)


def test_undistort_points_roundtrip():
    from manhattanslam_tpu.frontend.frame import undistort_points

    cam = CameraConfig()  # TUM1 intrinsics with distortion
    cfg = SlamConfig(camera=cam)
    rng = np.random.default_rng(0)
    und_gt = rng.uniform([100, 100], [540, 380], (50, 2)).astype(np.float32)
    # distort forward
    x = (und_gt[:, 0] - cam.cx) / cam.fx
    y = (und_gt[:, 1] - cam.cy) / cam.fy
    r2 = x * x + y * y
    k = 1 + cam.k1 * r2 + cam.k2 * r2**2 + cam.k3 * r2**3
    xd = x * k + 2 * cam.p1 * x * y + cam.p2 * (r2 + 2 * x * x)
    yd = y * k + cam.p1 * (r2 + 2 * y * y) + 2 * cam.p2 * x * y
    dist = np.stack([xd * cam.fx + cam.cx, yd * cam.fy + cam.cy], -1)
    rec = np.asarray(undistort_points(jnp.asarray(dist.astype(np.float32)), cfg))
    np.testing.assert_allclose(rec, und_gt, atol=0.1)
