"""Validation on real-photograph textures + Kinect-like depth noise.

The redesigned components the round-1 review flagged as unprovable on
hash-noise textures — Hough line gates, grid top-K ORB spread, Gaussian
BRIEF discrimination, LSH reloc scoring — are exercised here on frames
with natural image statistics (crops of a real photo; see
datasets/phototex.py for why no TUM data exists in this environment).
"""

import numpy as np
import pytest

from manhattanslam_tpu.datasets.phototex import PhotoSequence, load_photo
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.system import System


def test_photo_is_a_real_image():
    img = load_photo()
    assert img.shape[0] > 400 and img.shape[1] > 400
    # natural-image sanity: broad intensity histogram, non-trivial gradients
    assert img.std() > 30
    gx = np.abs(np.diff(img, axis=1))
    assert 1.0 < gx.mean() < 40.0


@pytest.fixture(scope="module")
def photo_run(small_cfg):
    seq = PhotoSequence(n_frames=14, cam=small_cfg.camera, seed=1)
    sys = System(small_cfg, fast=True, enable_surfels=False)
    n_ok = 0
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        n_ok += sys.track(gray, depth, t) is not None
    return seq, sys, n_ok


def test_photo_sequence_tracks(photo_run):
    seq, sys, n_ok = photo_run
    assert n_ok == len(seq), f"only {n_ok}/{len(seq)} frames tracked"


def test_photo_sequence_ate(photo_run, tmp_path):
    """ATE regression pin on photo textures + quadratic depth noise."""
    seq, sys, _ = photo_run
    est = tmp_path / "est.txt"
    sys.save_trajectory_tum(str(est))
    ts, pos, _ = traj_io.load_trajectory_tum(str(est))
    gt_rows = seq.gt_rows()
    ate = traj_io.ate_rmse(
        (ts, pos),
        (np.array([r[0] for r in gt_rows]), np.array([r[1] for r in gt_rows])),
    )
    assert ate < 0.06, f"photo-texture ATE {ate:.4f} m"


def test_photo_features_and_lines(photo_run):
    """Front-end gates hold up on natural textures: enough keypoints with
    spread, and the Hough detector finds segments without flooding."""
    import jax

    seq, sys, _ = photo_run
    r = sys.tracker.last_result
    feats = jax.device_get(r["feats"])
    n_kp = int(feats["valid"].sum())
    assert n_kp > 120, f"only {n_kp} keypoints on photo texture"
    xy = feats["xy_und"][feats["valid"]]
    # spatial spread: keypoints cover at least half the image span
    w, h = sys.cfg.camera.width, sys.cfg.camera.height
    assert np.ptp(xy[:, 0]) > 0.5 * w and np.ptp(xy[:, 1]) > 0.5 * h
    n_lines = int(np.asarray(r["line_valid"]).sum())
    assert 1 <= n_lines <= sys.cfg.caps.max_lines


def test_photo_reloc_discrimination(small_cfg):
    """LSH word histograms separate same-view from different-view frames
    on real-photo textures (KeyFrameDatabase scoring capability)."""
    import jax.numpy as jnp

    from manhattanslam_tpu.frontend.frame import build_extractor
    from manhattanslam_tpu.reloc.relocalizer import Relocalizer
    from manhattanslam_tpu.slam_map import SlamMap

    seq = PhotoSequence(n_frames=16, cam=small_cfg.camera, seed=2)
    seq_other = PhotoSequence(n_frames=16, cam=small_cfg.camera, seed=9)
    extract = build_extractor(small_cfg)
    m = SlamMap(small_cfg)
    r = Relocalizer(small_cfg, m)

    def bow(s, i):
        t, gray, depth = s.frame(i)
        f = extract(jnp.asarray(gray), jnp.asarray(depth))
        b = np.asarray(r.compute_bow(f["desc"], f["valid"]), dtype=np.float64)
        return b / np.linalg.norm(b).clip(1e-9)

    b0 = bow(seq, 0)
    b_near = bow(seq, 1)  # small camera motion, same place
    b_other = bow(seq_other, 0)  # different room textures entirely
    assert float(b0 @ b_near) > float(b0 @ b_other)
