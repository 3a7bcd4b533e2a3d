"""Chunk-input staging strategies on the tunnel:

A. host-stack at chunk end, ONE 15 MB upload per chunk (current)
B. per-frame uploads as frames arrive (16 x 0.9 MB), device-side stack
   at dispatch — transfers overlap the previous chunk's compute and the
   hashing spreads over the window instead of spiking at chunk end.
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
n_chunks = 12
n_frames = 1 + (2 + n_chunks) * chunk
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

stack16 = jax.jit(lambda xs: jnp.stack(xs))


def run(mode):
    pend = []
    t0 = time.perf_counter()
    for k in range(n_chunks):
        lo = 1 + (2 + k) * chunk
        fs = frames[lo - chunk * 2 : lo - chunk]  # reuse mid-range frames
        if mode == "A":
            a = jnp.asarray(np.stack([f[1] for f in fs]))
            b = jnp.asarray(np.stack([f[2] for f in fs]))
        else:
            gs = [jnp.asarray(f[1]) for f in fs]
            ds = [jnp.asarray(f[2]) for f in fs]
            a = stack16(gs)
            b = stack16(ds)
        r, c2 = tr.chunk_step(a, b, tr.carry, tr.view)
        tr.carry = c2
        r["chunk_flat"].copy_to_host_async()
        pend.append(r)
        if len(pend) >= 3:
            rr = pend.pop(0)
            np.asarray(jax.device_get(rr["chunk_flat"]))
    for rr in pend:
        np.asarray(jax.device_get(rr["chunk_flat"]))
    dt = time.perf_counter() - t0
    return n_chunks * chunk / dt


# warm both paths (compile the device stack program)
run("B")
run("A")
for mode in ("A", "B", "A", "B"):
    fps = run(mode)
    print(f"mode {mode}: {fps:.1f} fps", flush=True)
