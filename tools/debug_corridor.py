"""Diagnose the low-texture corridor run: per-frame pose error vs GT,
Manhattan usage, plane registration, keyframe cadence."""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "MSLAM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"),
)
# the axon site hook can override JAX_PLATFORMS after us; pin via config
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from manhattanslam_tpu.config import (
    CameraConfig, CapacityConfig, OrbConfig, SlamConfig,
)
from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.system import System

cfg = SlamConfig(
    camera=CameraConfig(
        fx=160.0, fy=160.0, cx=95.5, cy=71.5,
        k1=0, k2=0, p1=0, p2=0, k3=0,
        width=192, height=144, bf=12.0,
    ),
    orb=OrbConfig(n_features=250),
    caps=CapacityConfig(
        max_keypoints=256, max_lines=32, max_map_points=8192,
        max_map_lines=512, max_keyframes=64, max_local_keyframes=16,
        max_local_points=2048, max_local_lines=128,
    ),
)

N = 30
seq = SyntheticSequence(n_frames=N, cam=cfg.camera, view="corridor")

point_only = "--point-only" in sys.argv
kw = dict(enable_planes=False, enable_lines=False) if point_only else {}
sys_ = System(cfg, enable_surfels=False, fast=True, **kw)

n_lost = 0
for i in range(N):
    t, gray, depth = seq.frame(i)
    if sys_.track(gray, depth, t) is None:
        n_lost += 1

tr = sys_.tracker
rows = tr.trajectory_rows()
gt = {float(seq.frame_ts(i)) if hasattr(seq, "frame_ts") else None: None
      for i in range(0)}
# align by timestamp: trajectory_rows -> (ts, pos, quat?) — inspect shape
print("row example:", rows[0] if rows else None)
gt_rows = seq.gt_rows()
gt_map = {round(float(r[0]), 6): np.asarray(r[1]) for r in gt_rows}
errs = []
for r in rows:
    ts = round(float(r[0]), 6)
    if ts not in gt_map:
        continue
    e = np.asarray(r[1]) - gt_map[ts]
    errs.append((ts, e))
for ts, e in errs:
    print(f"t={ts:7.3f} err=({e[0]:+.4f},{e[1]:+.4f},{e[2]:+.4f}) |e|={np.linalg.norm(e):.4f}")
E = np.stack([e for _, e in errs])
print("RMSE per-axis:", np.sqrt((E**2).mean(0)), "total:", np.sqrt((E**2).sum(1).mean()))
print("lost:", n_lost, "n_ok:", tr.n_ok_frames, "n_manhattan:", tr.n_manhattan_frames)
print("frame_log (fid, n_inl, ok, refm, reft):", tr.frame_log)
m = tr.map
print("keyframes:", int(m.n_kf), "map planes:", int(m.pl_valid.sum()))
print("reg2 entries:", int((tr.reg2 >= 0).sum()), "reg3:", int((tr.reg3 >= 0).sum()))
