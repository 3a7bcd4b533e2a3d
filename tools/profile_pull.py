"""Why does the pipelined chunk pull cost ~300 ms when the buffer is
71 KB and download latency is ~8 ms?  Tests whether copy_to_host_async
works on this backend, and what device_get waits on with chunks in
flight."""
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
seq = SyntheticSequence(n_frames=1 + 2 * chunk, cam=cfg.camera, view="corner")
frames = []
for i in range(len(seq)):
    t, gray, depth = seq.frame(i)
    g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
    d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
    frames.append((t, g8, d16))

slam = System(cfg, fast=True, pipeline=False, chunk=chunk, enable_surfels=False)
for t, g, d in frames:
    slam.track(g, d, t)
slam.tracker.flush()
tr = slam.tracker
g8s_np = np.stack([f[1] for f in frames[1 : 1 + chunk]])
d16s_np = np.stack([f[2] for f in frames[1 : 1 + chunk]])
g8s = jnp.asarray(g8s_np)
d16s = jnp.asarray(d16s_np)

has_async = hasattr(jnp.zeros(4), "copy_to_host_async")
print("copy_to_host_async exists:", has_async, flush=True)

# settle
r, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
jax.block_until_ready(r["chunk_flat"])

def t_pull(r):
    t0 = time.perf_counter()
    np.asarray(jax.device_get(r["chunk_flat"]))
    return (time.perf_counter() - t0) * 1e3

# A: dispatch 1 chunk, immediately pull (waits on compute ~150ms)
r, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
print(f"A pull right after dispatch: {t_pull(r):.1f} ms", flush=True)

# B: dispatch, async copy, sleep past compute, pull
r, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
try:
    r["chunk_flat"].copy_to_host_async()
except Exception as e:
    print("copy_to_host_async raised:", e, flush=True)
time.sleep(0.5)
print(f"B pull after async+sleep(0.5): {t_pull(r):.1f} ms", flush=True)

# C: dispatch k, async copy, dispatch k+1 and k+2, pull k
r1, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
r1["chunk_flat"].copy_to_host_async()
r2, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
r2["chunk_flat"].copy_to_host_async()
r3, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
r3["chunk_flat"].copy_to_host_async()
print(f"C pull k with k+1,k+2 in flight: {t_pull(r1):.1f} ms", flush=True)
print(f"C pull k+1 (k+2 in flight):      {t_pull(r2):.1f} ms", flush=True)
print(f"C pull k+2 (nothing in flight):  {t_pull(r3):.1f} ms", flush=True)

# D: same as C but no async copies at all
jax.block_until_ready(r3["chunk_flat"])
r1, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
r2, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
r3, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
print(f"D pull k, no async copies, 2 in flight: {t_pull(r1):.1f} ms",
      flush=True)
print(f"D pull k+1: {t_pull(r2):.1f} ms", flush=True)
print(f"D pull k+2: {t_pull(r3):.1f} ms", flush=True)

# E: the upload share: dispatch includes jnp.asarray of 15 MB
t0 = time.perf_counter()
a = jnp.asarray(g8s_np); b = jnp.asarray(d16s_np)
r, _ = tr.chunk_step(a, b, tr.carry, tr.view)
disp_ms = (time.perf_counter() - t0) * 1e3
print(f"E upload+dispatch (no block): {disp_ms:.1f} ms", flush=True)
jax.block_until_ready(r["chunk_flat"])
