import numpy as np

from manhattanslam_tpu.config import (
    SlamConfig,
    _parse_opencv_yaml,
    config_from_dict,
    load_config,
)

SAMPLE = """%YAML:1.0
# comment
Camera.fx: 517.306408
Camera.fy: 516.469215
Camera.cx: 318.643040
Camera.cy: 255.313989
Camera.k1: 0.262383
Camera.width: 640
Camera.height: 480
Camera.fps: 30.0
Camera.bf: 40.0
Camera.RGB: 1
ThDepth: 40.0
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
Plane.AssociationDisRef: 0.05
Plane.Chi: 100
SavePath.Frame: "CameraTrajectory.txt"
"""


def test_parse_opencv_yaml(tmp_path):
    kv = _parse_opencv_yaml(SAMPLE)
    assert kv["Camera.fx"] == 517.306408
    assert kv["Camera.RGB"] == 1
    assert kv["SavePath.Frame"] == "CameraTrajectory.txt"
    p = tmp_path / "cfg.yaml"
    p.write_text(SAMPLE)
    cfg = load_config(str(p))
    assert cfg.camera.width == 640
    assert cfg.orb.n_features == 1000
    assert cfg.plane.chi == 100.0
    assert abs(cfg.th_depth_m - 40.0 / 517.306408 * 40.0) < 1e-6


def test_features_per_level_sums():
    cfg = SlamConfig()
    per = cfg.orb.features_per_level()
    assert len(per) == 8
    assert sum(per) == cfg.orb.n_features
    assert per[0] > per[-2]  # geometric decay (last level takes the remainder)


def test_config_defaults_match_reference():
    cfg = config_from_dict({})
    assert cfg.plane.association_ang_ref == 0.985
    assert cfg.plane.mf_vertical_threshold == 0.01
    assert cfg.surfel.distance_far == 30.0
    np.testing.assert_allclose(cfg.camera.K[0, 0], cfg.camera.fx)


def test_shipped_configs_load():
    import os

    from manhattanslam_tpu.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    for name in ("TUM1", "TUM2", "TUM3", "ICL", "TAMU"):
        cfg = load_config(os.path.join(root, name + ".yaml"))
        assert cfg.camera.width == 640 and cfg.camera.height == 480
        assert cfg.orb.n_features == 1000
        assert cfg.plane.mf_vertical_threshold == 0.01


def test_track_rejects_shape_mismatch(small_cfg):
    import numpy as np
    import pytest as _pytest

    from manhattanslam_tpu.system import System

    sys_ = System(small_cfg, enable_planes=False, enable_lines=False,
                  enable_surfels=False)
    with _pytest.raises(ValueError, match="shape mismatch"):
        sys_.track(
            np.zeros((10, 10), np.float32), np.ones((20, 20), np.float32), 0.0
        )
