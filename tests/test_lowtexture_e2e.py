"""Low-texture corridor proof — the system's reason to exist.

The paper's claim (and BASELINE config 4 / TAMU corridor analog) is
robust tracking where ORB points starve and the plane + Manhattan path
carries the pose via decoupled rotation and translation-only
optimization (Tracking.cc:846-944 TranslationEstimation).  The corridor
scene (datasets/synthetic.py corridor_room/corridor_poses) has blank
side walls (texture amplitude below the FAST fallback threshold), so:

- point-only tracking must lose or drift >=10x worse, and
- the full system (planes + Manhattan) must track with ATE < a few cm,
  with the Manhattan translation-only branch demonstrably load-bearing.
"""

import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.system import System

N_FRAMES = 30


def _run(small_cfg, seq, **system_kwargs):
    sys_ = System(small_cfg, enable_surfels=False, fast=True, **system_kwargs)
    n_lost = n_resets = 0
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        tr = sys_.tracker
        if sys_.track(gray, depth, t) is None:
            n_lost += 1
        if sys_.tracker is not tr:
            # automatic full reset (lost with <=5 KFs, Tracking.cc:517-523)
            # — wipes map AND trajectory: the catastrophic failure mode
            n_resets += 1
    est = sys_.tracker.trajectory_rows()
    ts = np.array([r[0] for r in est])
    pos = np.stack([r[1] for r in est]) if est else np.zeros((0, 3))
    gt = seq.gt_rows()
    gt_ts = np.array([r[0] for r in gt])
    gt_pos = np.stack([r[1] for r in gt])
    ate = (
        float(traj_io.ate_rmse((ts, pos), (gt_ts, gt_pos)))
        if len(est) >= 2
        else float("inf")
    )
    coverage = len(est) / len(seq)
    return sys_, n_lost, ate, n_resets, coverage


@pytest.fixture(scope="module")
def corridor(small_cfg):
    return SyntheticSequence(
        n_frames=N_FRAMES, cam=small_cfg.camera, view="corridor"
    )


@pytest.fixture(scope="module")
def full_run(small_cfg, corridor):
    return _run(small_cfg, corridor)


@pytest.fixture(scope="module")
def point_only_run(small_cfg, corridor):
    return _run(
        small_cfg, corridor, enable_planes=False, enable_lines=False
    )


def test_points_starve(small_cfg, corridor):
    """The scene construction itself: close points are (near) absent and
    the few far corners sit on the end wall."""
    import jax
    import jax.numpy as jnp

    from manhattanslam_tpu.frontend.frame import build_extractor

    ex = jax.jit(build_extractor(small_cfg))
    _, gray, depth = corridor.frame(0)
    feats = ex(jnp.asarray(gray), jnp.asarray(depth))
    valid = np.asarray(feats["valid"])
    d = np.asarray(feats["depth"])
    n_close = int((valid & (d > 0) & (d < small_cfg.th_depth_m)).sum())
    assert n_close < 20, f"{n_close} close keypoints — scene not starved"


def test_full_system_tracks(full_run):
    sys_, n_lost, ate, n_resets, coverage = full_run
    assert n_lost == 0, f"full system lost {n_lost}/{N_FRAMES} frames"
    assert n_resets == 0, f"full system reset {n_resets}x on the corridor"
    assert coverage > 0.9, f"trajectory covers only {coverage:.0%}"
    assert ate < 0.05, f"full-system ATE {ate:.3f} m on the corridor"


def test_manhattan_is_load_bearing(full_run):
    """The decoupled rotation + translation-only path must carry most
    frames — otherwise this scene isn't testing the paper's claim."""
    sys_, _, _, _, _ = full_run
    tr = sys_.tracker
    frac = tr.n_manhattan_frames / max(tr.n_ok_frames, 1)
    assert frac >= 0.5, (
        f"Manhattan translation path used on only {frac:.0%} of frames"
    )


def test_point_only_fails_or_drifts(full_run, point_only_run):
    _, _, ate_full, _, _ = full_run
    _, n_lost, ate_po, n_resets, coverage = point_only_run
    degraded = (
        n_lost >= N_FRAMES // 4
        or n_resets >= 1  # auto-reset == lost the map entirely
        or coverage < 0.8
        or not np.isfinite(ate_po)
        or ate_po > 10.0 * max(ate_full, 1e-4)
    )
    assert degraded, (
        f"point-only unexpectedly fine: lost={n_lost}, resets={n_resets}, "
        f"coverage={coverage:.0%}, ATE {ate_po:.3f} m vs full "
        f"{ate_full:.3f} m"
    )
