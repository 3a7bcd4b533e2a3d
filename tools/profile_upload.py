"""Upload-path microbenchmarks on the axon tunnel: is 25 MB/s a hard
bandwidth, or per-call overhead we can amortize/restructure away?"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)


def bench(name, arrs, n=4):
    for _ in range(2):
        out = [jnp.asarray(a) for a in arrs]
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = [jnp.asarray(a) for a in arrs]
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    mb = sum(a.nbytes for a in arrs) / 1e6
    print(f"{name}: {dt*1e3:.1f} ms for {mb:.1f} MB -> {mb/dt:.0f} MB/s",
          flush=True)


C, H, W = 16, 480, 640
g8 = rng.integers(0, 255, (C, H, W), dtype=np.uint8)
d16 = rng.integers(0, 60000, (C, H, W), dtype=np.uint16)

bench("chunk pair (u8 + u16)", [g8, d16])
bench("u8 only (4.9 MB)", [g8])
bench("u16 only (9.8 MB)", [d16])
bench("u16 as u8 view (9.8 MB)", [d16.view(np.uint8)])
big = np.concatenate([g8.reshape(C, H * W), d16.view(np.uint8).reshape(C, 2 * H * W)], axis=1)
bench("one fused u8 buffer (14.7 MB)", [big])
bench("2 chunks fused (29.4 MB)", [np.concatenate([big, big])])
half = big[: C // 2]
bench("half chunk (7.4 MB)", [half])
bench("1 MB", [big.ravel()[: 1 << 20]])
bench("64 KB", [big.ravel()[: 1 << 16]])

# device_put with explicit device
dev = jax.devices()[0]
for _ in range(2):
    jax.block_until_ready(jax.device_put(big, dev))
t0 = time.perf_counter()
for _ in range(4):
    jax.block_until_ready(jax.device_put(big, dev))
dt = (time.perf_counter() - t0) / 4
print(f"device_put fused: {dt*1e3:.1f} ms -> {big.nbytes/1e6/dt:.0f} MB/s",
      flush=True)

# async overlap: enqueue 4 uploads, block once
t0 = time.perf_counter()
for _ in range(4):
    outs = [jnp.asarray(big) for _ in range(4)]
    jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 4
print(f"4 concurrent fused uploads: {dt*1e3:.1f} ms -> "
      f"{4*big.nbytes/1e6/dt:.0f} MB/s", flush=True)
