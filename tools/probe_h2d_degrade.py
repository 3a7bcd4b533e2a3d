"""Bisect the H2D-upload slowdown triggered by running device programs.

Prior finding: fresh-process uploads run ~1.3 GB/s; after ONE execution of
extract_planes_device or detect_lines, uploads drop to ~50 MB/s and stay
there.  This probe measures upload speed after progressively enabling
suspects, isolating allocation size vs program execution vs output count.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import CameraConfig, SlamConfig

W, H = 640, 480
cfg = SlamConfig(
    camera=CameraConfig(
        fx=525.0, fy=525.0, cx=319.5, cy=239.5,
        k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
    )
)
rng = np.random.default_rng(0)
buf = rng.integers(0, 255, 15_000_000, dtype=np.uint8)


def up(tag, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(buf))
        ts.append(time.perf_counter() - t0)
    mb = buf.nbytes / 1e6
    print(f"{tag:36s} {min(ts)*1e3:7.1f} ms best ({mb/min(ts):6.0f} MB/s)"
          f"  worst {max(ts)*1e3:7.1f}", flush=True)


up("baseline (fresh)")

# suspect 0: plain big allocation (no program)
big = jax.device_put(jnp.zeros((256, 1024, 1024), jnp.float32))  # 1 GB
jax.block_until_ready(big)
up("after 1GB device_put")
del big
up("after freeing the 1GB")

# suspect 1: a big compiled program with many outputs
@jax.jit
def manyout(x):
    return [x * i for i in range(1, 33)]

outs = manyout(jnp.ones((512, 512)))
jax.block_until_ready(outs)
up("after 32-output program")
del outs
up("after freeing outputs")

# suspect 2: plane extraction
from manhattanslam_tpu.ops import planes as plane_ops

depth = jnp.asarray(
    2.0 + 0.1 * rng.standard_normal((H, W)).astype(np.float32)
)
K = jnp.asarray(cfg.camera.K)
r = plane_ops.extract_planes_device(
    depth, K, cfg.caps.max_planes_frame, cfg.caps.max_plane_points,
    (24, 32), jnp.float32(300.0), jnp.float32(0.04),
)
jax.block_until_ready(r["coeffs"])
up("after extract_planes_device")
del r
up("after freeing plane result")

# suspect 3: line detection
from manhattanslam_tpu.ops import lines as line_ops

gray = jnp.asarray(rng.integers(0, 255, (H, W)).astype(np.float32))
det = line_ops.detect_lines(gray, cfg.caps.max_lines, 12.0, 20.0, 0.5, 20.0)
jax.block_until_ready(det["sp"])
up("after detect_lines")
del det, gray, depth
up("after freeing line result")
