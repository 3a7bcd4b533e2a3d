"""Isolate upload-speed dependence on CONTENT (tunnel compression?) and
buffer IDENTITY (caching?).  Fresh process, idle device."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import CameraConfig
from manhattanslam_tpu.datasets.synthetic import SyntheticSequence

rng = np.random.default_rng(0)
MB = 14.7
C, H, W = 16, 480, 640
cam = CameraConfig(fx=525.0, fy=525.0, cx=319.5, cy=239.5,
                   k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0)
seq = SyntheticSequence(n_frames=C, cam=cam, view="corner")
g8 = np.stack([
    np.clip(np.round(seq.frame(i)[1]), 0, 255).astype(np.uint8)
    for i in range(C)
])
d16 = np.stack([
    np.clip(np.round(seq.frame(i)[2] * 5000.0), 0, 65535).astype(np.uint16)
    for i in range(C)
])
synth = np.concatenate(
    [g8.reshape(C, -1), d16.view(np.uint8).reshape(C, -1)], axis=1
)
n_bytes = synth.nbytes


def t_upload(make, n=4, warm=1):
    for _ in range(warm):
        jax.block_until_ready(jnp.asarray(make()))
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jnp.asarray(make()))
    return (time.perf_counter() - t0) / n


z = np.zeros(n_bytes, np.uint8)
r1 = rng.integers(0, 255, n_bytes, dtype=np.uint8)

print(f"buffer {n_bytes/1e6:.1f} MB", flush=True)
dt = t_upload(lambda: z)
print(f"zeros, same buffer:      {dt*1e3:7.1f} ms ({n_bytes/1e6/dt:5.0f} MB/s)", flush=True)
dt = t_upload(lambda: np.zeros(n_bytes, np.uint8))
print(f"zeros, fresh buffer:     {dt*1e3:7.1f} ms ({n_bytes/1e6/dt:5.0f} MB/s)", flush=True)
dt = t_upload(lambda: r1)
print(f"random, same buffer:     {dt*1e3:7.1f} ms ({n_bytes/1e6/dt:5.0f} MB/s)", flush=True)
dt = t_upload(lambda: rng.integers(0, 255, n_bytes, dtype=np.uint8), warm=0)
print(f"random, fresh buffer:    {dt*1e3:7.1f} ms ({n_bytes/1e6/dt:5.0f} MB/s)", flush=True)
dt = t_upload(lambda: synth)
print(f"synthetic, same buffer:  {dt*1e3:7.1f} ms ({n_bytes/1e6/dt:5.0f} MB/s)", flush=True)
dt = t_upload(lambda: synth.copy(), warm=0)
print(f"synthetic, fresh buffer: {dt*1e3:7.1f} ms ({n_bytes/1e6/dt:5.0f} MB/s)", flush=True)
# content-modified synthetic (breaks any content-hash cache)
def fresh_mod():
    s = synth.copy()
    s[:, ::4096] ^= rng.integers(1, 255, dtype=np.uint8)
    return s
dt = t_upload(fresh_mod, warm=0)
print(f"synthetic, perturbed:    {dt*1e3:7.1f} ms ({n_bytes/1e6/dt:5.0f} MB/s)", flush=True)
