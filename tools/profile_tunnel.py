"""Decompose the steady-state chunk loop cost on the real TPU tunnel:
upload bandwidth, dispatch latency, device compute, download latency —
the four terms the bench's host_ms conflates.
"""
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
seq = SyntheticSequence(n_frames=1 + 3 * chunk, cam=cfg.camera, view="corner")
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

# 1. upload bandwidth
for _ in range(2):
    a = jnp.asarray(g8s_np); b = jnp.asarray(d16s_np)
    jax.block_until_ready((a, b))
t0 = time.perf_counter()
n = 5
for _ in range(n):
    a = jnp.asarray(g8s_np); b = jnp.asarray(d16s_np)
    jax.block_until_ready((a, b))
up_s = (time.perf_counter() - t0) / n
mb = (g8s_np.nbytes + d16s_np.nbytes) / 1e6
print(f"upload: {up_s*1e3:.1f} ms/chunk ({mb:.1f} MB -> {mb/up_s:.0f} MB/s)")

# 2. device compute (inputs staged)
g8s = jnp.asarray(g8s_np); d16s = jnp.asarray(d16s_np)
r, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
jax.block_until_ready(r["chunk_flat"])
t0 = time.perf_counter()
for _ in range(n):
    r, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
    jax.block_until_ready(r["chunk_flat"])
dev_s = (time.perf_counter() - t0) / n
print(f"device: {dev_s*1e3:.1f} ms/chunk ({dev_s/chunk*1e3:.2f} ms/frame)")

# 3. download latency of the chunk summary (after compute settles)
jax.block_until_ready(r["chunk_flat"])
t0 = time.perf_counter()
for _ in range(n):
    flat = np.asarray(jax.device_get(r["chunk_flat"]))
down_s = (time.perf_counter() - t0) / n
print(f"pull chunk_flat: {down_s*1e3:.1f} ms ({r['chunk_flat'].nbytes/1e3:.0f} KB)")

# 4. full loop emulation: upload+dispatch+async-copy+pull, no pipeline
t0 = time.perf_counter()
for _ in range(n):
    a = jnp.asarray(g8s_np); b = jnp.asarray(d16s_np)
    r, _ = tr.chunk_step(a, b, tr.carry, tr.view)
    r["chunk_flat"].copy_to_host_async()
    flat = np.asarray(jax.device_get(r["chunk_flat"]))
loop_s = (time.perf_counter() - t0) / n
print(f"sync loop: {loop_s*1e3:.1f} ms/chunk -> {chunk/loop_s:.1f} fps")

# 5. pipelined loop (depth 2), like the bench
pend = []
t0 = time.perf_counter()
n2 = 10
for i in range(n2):
    a = jnp.asarray(g8s_np); b = jnp.asarray(d16s_np)
    r, _ = tr.chunk_step(a, b, tr.carry, tr.view)
    r["chunk_flat"].copy_to_host_async()
    pend.append(r)
    if len(pend) >= 3:
        rr = pend.pop(0)
        flat = np.asarray(jax.device_get(rr["chunk_flat"]))
for rr in pend:
    flat = np.asarray(jax.device_get(rr["chunk_flat"]))
pipe_s = (time.perf_counter() - t0) / n2
print(f"pipelined loop: {pipe_s*1e3:.1f} ms/chunk -> {chunk/pipe_s:.1f} fps")
