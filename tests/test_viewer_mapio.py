import numpy as np
import pytest

from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.system import System


@pytest.fixture(scope="module")
def run_sys(small_cfg):
    seq = SyntheticSequence(n_frames=8, cam=small_cfg.camera, view="corner")
    sys = System(small_cfg, fast=True, enable_surfels=False, use_viewer=True)
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        sys.track(gray, depth, t)
    return seq, sys


def test_viewer_snapshots(run_sys, tmp_path):
    seq, sys = run_sys
    assert sys.viewer is not None
    mp = tmp_path / "map.png"
    fp = tmp_path / "frame.png"
    sys.viewer.save_map_png(str(mp))
    t, gray, depth = seq.frame(0)
    sys.viewer.save_frame_png(str(fp), gray)
    assert mp.stat().st_size > 10000
    assert fp.stat().st_size > 10000


def test_map_save_load_roundtrip(run_sys, tmp_path, small_cfg):
    seq, sys = run_sys
    p = tmp_path / "map.npz"
    sys.save_map(str(p))

    sys2 = System(small_cfg, fast=True, enable_surfels=False)
    sys2.load_map(str(p))
    m1, m2 = sys.map, sys2.map
    assert m2.n_kf == m1.n_kf
    np.testing.assert_array_equal(m2.mp_valid, m1.mp_valid)
    np.testing.assert_array_equal(m2.mp_pos, m1.mp_pos)
    np.testing.assert_array_equal(m2.kf_pose, m1.kf_pose)
    assert m2.manhattan_pairs == m1.manhattan_pairs


def test_localize_against_loaded_map(run_sys, tmp_path, small_cfg):
    """Relocalize-only against a restored checkpoint (kidnapped robot)."""
    seq, sys = run_sys
    p = tmp_path / "map.npz"
    sys.save_map(str(p))

    sys2 = System(small_cfg, fast=True, enable_surfels=False)
    sys2.load_map(str(p))
    sys2.activate_localization_mode()
    # force LOST state so track() goes through relocalization
    sys2.tracker.state = "LOST"
    sys2.tracker.frame_id = 100
    recovered = False
    for i in range(3):
        t, gray, depth = seq.frame(i)
        T = sys2.track(gray, depth, 100.0 + i)
        if T is not None:
            recovered = True
            break
    assert recovered
