"""Does the axon tunnel overlap H2D uploads with device compute, or
serialize them on one stream?  And emulate the exact bench loop with
is_ready() checks to see what the pull actually waits on."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import CameraConfig, SlamConfig
from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
from manhattanslam_tpu.system import System

W, H = 640, 480
cfg = SlamConfig(camera=CameraConfig(
    fx=525.0, fy=525.0, cx=319.5, cy=239.5,
    k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0))
chunk = 16
n_frames = 1 + 12 * chunk
seq = SyntheticSequence(n_frames=n_frames, cam=cfg.camera, view="corner")
frames = []
for i in range(n_frames):
    t, gray, depth = seq.frame(i)
    g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
    d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
    frames.append((t, g8, d16))

slam = System(cfg, fast=True, pipeline=False, chunk=chunk, enable_surfels=False)
for t, g, d in frames[: 1 + 2 * chunk]:
    slam.track(g, d, t)
slam.tracker.flush()
tr = slam.tracker
g8s_np = np.stack([f[1] for f in frames[1 : 1 + chunk]])
d16s_np = np.stack([f[2] for f in frames[1 : 1 + chunk]])
g8s = jnp.asarray(g8s_np)
d16s = jnp.asarray(d16s_np)
jax.block_until_ready((g8s, d16s))

# 1. upload while device is computing
r, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)  # ~150 ms compute starts
t0 = time.perf_counter()
a = jnp.asarray(g8s_np)
b = jnp.asarray(d16s_np)
jax.block_until_ready((a, b))
up_busy = (time.perf_counter() - t0) * 1e3
jax.block_until_ready(r["chunk_flat"])
t0 = time.perf_counter()
a = jnp.asarray(g8s_np)
b = jnp.asarray(d16s_np)
jax.block_until_ready((a, b))
up_idle = (time.perf_counter() - t0) * 1e3
print(f"upload 14.7 MB: idle {up_idle:.1f} ms, during compute {up_busy:.1f} ms",
      flush=True)

# 2. exact loop emulation with readiness probes
pend = []
times = []
for k in range(10):
    lo = 1 + k * chunk
    gs = np.stack([f[1] for f in frames[lo : lo + chunk]])
    ds = np.stack([f[2] for f in frames[lo : lo + chunk]])
    t0 = time.perf_counter()
    a = jnp.asarray(gs)
    b = jnp.asarray(ds)
    r, c2 = tr.chunk_step(a, b, tr.carry, tr.view)
    tr.carry = c2
    r["chunk_flat"].copy_to_host_async()
    t_disp = time.perf_counter()
    pend.append(r)
    ready = pull_ms = -1.0
    if len(pend) >= 3:
        rr = pend.pop(0)
        try:
            ready = float(rr["chunk_flat"].is_ready())
        except Exception:
            ready = -2.0
        t1 = time.perf_counter()
        np.asarray(jax.device_get(rr["chunk_flat"]))
        pull_ms = (time.perf_counter() - t1) * 1e3
    times.append((k, (t_disp - t0) * 1e3, ready, pull_ms))
for k, disp, ready, pull in times:
    print(f"chunk {k}: dispatch {disp:.1f} ms, k-2 ready={ready}, "
          f"pull {pull:.1f} ms", flush=True)
for rr in pend:
    jax.block_until_ready(rr["chunk_flat"])
