"""Static-scene divergence probe: track pose error AND rotation
orthonormality error of every carry matrix per frame.

Hypothesis: f32 rotation blocks drift from O(3) through the
velocity @ T_last feedback (never re-orthonormalized), and the solve
amplifies the non-orthonormal component -> exponential screw divergence.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MSLAM_JAX_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"))
import jax

if os.environ.get("MSLAM_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from manhattanslam_tpu.config import CameraConfig, SlamConfig
from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.system import System

W, H = 640, 480
cfg = SlamConfig(camera=CameraConfig(
    fx=525.0, fy=525.0, cx=319.5, cy=239.5,
    k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0))
n = 50
seq = SyntheticSequence(n_frames=n, cam=cfg.camera, view="corner")
slam = System(cfg, fast=True, pipeline=False, chunk=1, enable_surfels=False,
              enable_planes=False, enable_lines=False)
tr = slam.tracker
t0, gray, depth = seq.frame(0)
g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)


def ortho_err(M):
    R = np.asarray(M, np.float64)[:3, :3]
    return float(np.abs(R.T @ R - np.eye(3)).max())


T_true = None
for i in range(n):
    slam.track(g8, d16, float(i) / seq.fps)
    if T_true is None:
        T_true = slam.map.kf_pose[0].copy()
    c = jax.device_get(tr.carry)
    d = np.asarray(c["T_last"], np.float64) @ np.linalg.inv(T_true)
    ang = np.arccos(np.clip((np.trace(d[:3, :3]) - 1) / 2, -1, 1))
    print(
        f"{i:3d} |dt|={np.linalg.norm(d[:3,3]):.3e} |dR|={ang:.3e} "
        f"orthoT={ortho_err(c['T_last']):.3e} "
        f"orthoV={ortho_err(c['velocity']):.3e} "
        f"inl={tr.n_inliers}", flush=True,
    )
