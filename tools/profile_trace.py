#!/usr/bin/env python3
"""Device-time breakdown of the chunked step via the JAX profiler trace.

Runs a few chunk dispatches under jax.profiler.start_trace, then parses
the trace proto (*.trace.json.gz) and aggregates per-op device time.
Per the tunnel notes: per-dispatch RPC swamps small-op micro-benchmarks,
so this is the only honest per-op attribution on this link.

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_trace.py [chunk] [top_n]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend import device_tracker as dt
    from manhattanslam_tpu.system import System

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    n_frames = 1 + 3 * chunk
    seq = SyntheticSequence(n_frames=n_frames, cam=cfg.camera, view="corner")
    frames = []
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
        frames.append((t, g8, d16))

    slam = System(cfg, fast=True, pipeline=False, chunk=chunk,
                  enable_surfels=False)
    i = 0
    # warm: init frame + one chunk (compiles)
    for _ in range(1 + chunk):
        t, g, d = frames[i]
        slam.track(g, d, t)
        i += 1

    tdir = "/tmp/mslam_trace"
    jax.profiler.start_trace(tdir)
    for _ in range(2 * chunk):
        t, g, d = frames[i]
        slam.track(g, d, t)
        i += 1
    slam.tracker.flush()
    jax.profiler.stop_trace()

    files = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace file found under", tdir)
        return 1
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # identify TPU device pids (process_name metadata)
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, n in pid_name.items()
        if "TPU" in n or "tpu" in n or "device" in n.lower()
    }
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        cnt[name] += 1
        total += dur
    n_traced = 2 * chunk
    print(f"traced {n_traced} frames; total device-track time "
          f"{total:.1f} ms ({total / n_traced:.2f} ms/frame)")
    print(f"{'ms/frame':>9}  {'count':>6}  op")
    for name, ms in agg.most_common(top_n):
        print(f"{ms / n_traced:9.3f}  {cnt[name]:6d}  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
