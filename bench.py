#!/usr/bin/env python3
"""Benchmark: tracked frames/sec on one chip (north star: 200 fps at 640x480).

Runs the FULL SLAM system (fused device step: ORB + planes + Manhattan +
lines + LM solves, plus keyframing/mapping) over a synthetic 640x480 RGB-D
sequence in pipelined chunk mode (C frames per upload/dispatch/pull).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = measured fps / 200 (the driver-set target in BASELINE.json;
the reference C++ system claims ~30 fps real-time on a desktop i7).

`python bench.py --throughput B` instead measures BASELINE config 5
(B-sequence batched replay of the fused step against a shared map view —
localization/replay mode) in aggregate frames/sec.
"""

from __future__ import annotations

import json
import logging
import sys
import time

import numpy as np


def bench_throughput(batch: int) -> int:
    import jax
    import jax.numpy as jnp

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend import device_tracker as dt
    from manhattanslam_tpu.frontend.frame import backproject_keypoints
    from manhattanslam_tpu.parallel import mesh as pmesh
    from manhattanslam_tpu.slam_map import SlamMap

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    n_frames = 12
    seq = SyntheticSequence(n_frames=n_frames, cam=cfg.camera, view="corner")
    frames = [seq.frame(i) for i in range(n_frames)]

    # shared map view from frame 0 (replay/localization mode)
    m = SlamMap(cfg)
    body = dt.build_frame_body(cfg, use_pallas=False)
    view0 = dt.build_map_view(cfg, m)
    view0 = dt.set_ref_kf(view0, m, 0)
    g0, d0 = frames[0][1:]
    r0, _ = jax.jit(body)(
        jnp.asarray(g0), jnp.asarray(d0), dt.init_carry(cfg), view0
    )
    feats_np = jax.device_get(r0["feats"])
    kf = m.add_keyframe(np.eye(4, dtype=np.float32), 0.0, 0, feats_np)
    pts_c = np.asarray(backproject_keypoints(r0["feats"], cfg))
    sel = np.nonzero(feats_np["valid"] & (feats_np["depth"] > 0))[0][:1000]
    m.add_points(
        pts_c[sel], feats_np["desc"][sel],
        np.tile(np.float32([0, 0, 1]), (len(sel), 1)),
        np.zeros(len(sel), np.float32), np.full(len(sel), 30.0, np.float32),
        feats_np["level"][sel], kf,
    )
    view = dt.build_map_view(cfg, m)
    view = dt.set_ref_kf(view, m, kf)

    step = pmesh.build_throughput_step(cfg, batch)
    carry = pmesh.init_batched_carry(cfg, batch)
    # each stream replays the same sequence with a different frame offset
    stacks = [
        jnp.asarray(
            np.stack(
                [
                    dt.pack_frame(*frames[(i + s) % n_frames][1:])
                    for s in range(batch)
                ]
            )
        )
        for i in range(n_frames)
    ]
    out, carry = step(stacks[0], carry, view)  # compile
    jax.block_until_ready(out["T"])

    n_timed = 8
    t0 = time.perf_counter()
    for i in range(1, 1 + n_timed):
        out, carry = step(stacks[i % n_frames], carry, view)
    jax.block_until_ready(out["T"])
    dt_s = time.perf_counter() - t0
    fps = n_timed * batch / dt_s
    print(
        json.dumps(
            {
                "metric": f"slam_batched_replay_{batch}seq_frames_per_sec_640x480",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 4),
            }
        )
    )
    return 0


class _CompileCounter(logging.Handler):
    """Counts XLA compiles (jax_log_compiles messages) while attached —
    the timed region must report ZERO: on this remote-compile backend one
    mid-loop retrace costs tens of seconds and wrecks the measurement."""

    def __init__(self):
        super().__init__()
        self.count = 0
        self.names: list[str] = []

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("Compiling "):
            self.count += 1
            self.names.append(msg[:160])


def main() -> int:
    if len(sys.argv) >= 3 and sys.argv[1] == "--throughput":
        return bench_throughput(int(sys.argv[2]))
    import jax

    import manhattanslam_tpu  # noqa: F401  (matmul precision + XLA cache)
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.io import trajectory as traj_io
    from manhattanslam_tpu.system import System

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    chunk = 16
    # warmup: init frame + two chunks with a FORCED keyframe event, then
    # System.warmup() compiles the remaining event programs (keyframe
    # pulls, view update, mapping backend, relocalization pipeline)
    n_warm = 1 + 2 * chunk
    n_timed = 8 * chunk
    # median-of-5 timed windows: the dev host<->TPU tunnel is
    # contention-noisy (27-51 fps day-range on identical code), so the
    # MEDIAN is the headline and the min/max spread rides along — a
    # best-of-N on a contended link is a ceiling, not a number
    reps = 5
    seq = SyntheticSequence(n_frames=n_warm + reps * n_timed,
                            cam=cfg.camera, view="corner")
    # sensor-native dtypes, as the TUM loader hands out (uint8 gray PNGs,
    # uint16 depth at DepthMapFactor=5000): pack_frame is then a byte
    # concat instead of ~4 ms/frame of float conversion
    frames = []
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
        frames.append((t, g8, d16))

    slam = System(cfg, fast=True, pipeline=True, chunk=chunk,
                  enable_surfels=False)
    for i in range(n_warm):  # compiles (persistent cache in .jax_cache)
        t, gray, depth = frames[i]
        if i == 1 + chunk:
            # force one real keyframe event through the whole machinery
            slam.tracker.force_keyframe = True
        slam.track(gray, depth, t)
    slam.tracker.flush()
    slam.warmup()  # compile keyframe-event + reloc programs
    n0 = sum(not r.lost for r in slam.tracker.records)
    kf0 = slam.map.n_kf - len(slam.map.kf_free)

    # count XLA compiles inside the timed windows (must be zero)
    counter = _CompileCounter()
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter)

    slam.tracker.perf.clear()
    slam.tracker.perf_n.clear()
    if slam.local_mapper is not None:
        slam.local_mapper.perf.clear()
    # ONE continuous timed region with rep boundary marks: a flush per
    # rep would drain the 2-chunk pipeline and pay full device latency
    # inside every window (that artifact alone halved the measured fps);
    # the single final flush's drain lands in the last window only.
    marks = [time.perf_counter()]
    for rep in range(reps):
        lo = n_warm + rep * n_timed
        for i in range(lo, lo + n_timed):
            t, gray, depth = frames[i]
            slam.track(gray, depth, t)
        marks.append(time.perf_counter())
    slam.tracker.flush()
    marks[-1] = time.perf_counter()
    fps_reps = [n_timed / (b - a) for a, b in zip(marks, marks[1:])]
    t_all = marks[-1] - marks[0]
    print("WINDOW FPS:", [round(f, 2) for f in fps_reps], file=sys.stderr)

    jax.config.update("jax_log_compiles", False)
    logging.getLogger("jax._src.interpreters.pxla").removeHandler(counter)

    n_ok = sum(not r.lost for r in slam.tracker.records) - n0
    assert n_ok >= 0.9 * reps * n_timed, (
        f"only {n_ok}/{reps * n_timed} frames tracked"
    )
    if counter.count:
        print("TIMED-REGION COMPILES:", counter.names, file=sys.stderr)
    lost_ids = [i for i, r in enumerate(slam.tracker.records) if r.lost]
    print("LOST FRAMES:", lost_ids[:80], file=sys.stderr)
    fl = slam.tracker.frame_log
    bad = [
        fl[max(0, j - 2) : j + 2]
        for j, row in enumerate(fl) if not row[2]
    ]
    print("TRACK-FAIL CONTEXT (fid, n_inliers, ok):", bad[:20],
          file=sys.stderr)
    # host-phase breakdown of the timed region (tracker self-accounting)
    perf = {
        k: [round(v * 1e3, 1), slam.tracker.perf_n[k]]
        for k, v in sorted(slam.tracker.perf.items())
    }
    print("HOST-PHASE ms [total, n_events]:", json.dumps(perf),
          file=sys.stderr)
    if slam.local_mapper is not None:
        mp_perf = {
            k: round(v * 1e3, 1)
            for k, v in sorted(slam.local_mapper.perf.items())
        }
        print("MAPPER-STAGE ms:", json.dumps(mp_perf), file=sys.stderr)

    # pure device+dispatch time of the steady-state chunk program
    # (staged input, no host bookkeeping): the device/host split that
    # makes tunnel contention distinguishable from real regressions
    tr = slam.tracker
    import jax.numpy as jnp
    g8s = jnp.asarray(np.stack([f[1] for f in frames[:chunk]]))
    d16s = jnp.asarray(np.stack([f[2] for f in frames[:chunk]]))
    r0, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
    jax.block_until_ready(r0["chunk_flat"])
    t0 = time.perf_counter()
    n_dev = 3
    for _ in range(n_dev):
        r0, _ = tr.chunk_step(g8s, d16s, tr.carry, tr.view)
        jax.block_until_ready(r0["chunk_flat"])
    device_ms = (time.perf_counter() - t0) / (n_dev * chunk) * 1e3

    # accuracy rides the same driver artifact: ATE vs the synthetic
    # ground truth over the full tracked sequence
    est = tr.trajectory_rows()
    ts = np.array([r[0] for r in est])
    pos = np.stack([r[1] for r in est])
    gt = seq.gt_rows()
    gt_ts = np.array([r[0] for r in gt])
    gt_pos = np.stack([r[1] for r in gt])
    ate = float(traj_io.ate_rmse((ts, pos), (gt_ts, gt_pos)))

    # ---- phase 2: the SYSTEM under a realistic keyframe cadence ----
    # A walking sweep (datasets/synthetic.py walk_poses) keeps the
    # viewpoint moving (~1 KF / 20-30 frames), with surfel fusion ON —
    # the regime the reference's always-running LocalMapping +
    # SurfelMapping threads define (System.cc:90-107).  The steady-state
    # number above is the tracker's ceiling; this one is the system's.
    map_reps, map_timed = 3, 6 * chunk
    n_warm2 = 1 + 2 * chunk
    seq2 = SyntheticSequence(
        n_frames=n_warm2 + map_reps * map_timed, cam=cfg.camera, view="walk"
    )
    frames2 = []
    for i in range(len(seq2)):
        t, gray, depth = seq2.frame(i)
        g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
        frames2.append((t, g8, d16))
    slam2 = System(cfg, fast=True, pipeline=True, chunk=chunk,
                   enable_surfels=True)
    for i in range(n_warm2):
        t, gray, depth = frames2[i]
        if i == 1 + chunk:
            slam2.tracker.force_keyframe = True  # compile the KF+surfel path
        slam2.track(gray, depth, t)
    slam2.tracker.flush()
    slam2.warmup()
    kf2_0 = slam2.map.n_kf - len(slam2.map.kf_free)
    jax.config.update("jax_log_compiles", True)
    counter2 = _CompileCounter()
    logging.getLogger("jax._src.interpreters.pxla").addHandler(counter2)
    marks2 = [time.perf_counter()]
    for rep in range(map_reps):
        lo = n_warm2 + rep * map_timed
        for i in range(lo, lo + map_timed):
            t, gray, depth = frames2[i]
            slam2.track(gray, depth, t)
        marks2.append(time.perf_counter())
    slam2.tracker.flush()
    marks2[-1] = time.perf_counter()
    jax.config.update("jax_log_compiles", False)
    logging.getLogger("jax._src.interpreters.pxla").removeHandler(counter2)
    fps2_reps = [map_timed / (b - a) for a, b in zip(marks2, marks2[1:])]
    fps2 = float(np.median(fps2_reps))
    kf2_1 = slam2.map.n_kf - len(slam2.map.kf_free)
    est2 = slam2.tracker.trajectory_rows()
    gt2 = seq2.gt_rows()
    ate2 = float(
        traj_io.ate_rmse(
            (np.array([r[0] for r in est2]),
             np.stack([r[1] for r in est2])),
            (np.array([r[0] for r in gt2]),
             np.stack([r[1] for r in gt2])),
        )
    )
    print("MAPPING WINDOW FPS:", [round(f, 2) for f in fps2_reps],
          "KFs:", [kf2_0, kf2_1], "ATE:", round(ate2, 4), file=sys.stderr)
    if slam2.local_mapper is not None:
        mp2 = {
            k: round(v * 1e3, 1)
            for k, v in sorted(slam2.local_mapper.perf.items())
        }
        print("MAPPING MAPPER-STAGE ms:", json.dumps(mp2), file=sys.stderr)
    hp2 = {
        k: [round(1e3 * slam2.tracker.perf[k], 1), slam2.tracker.perf_n[k]]
        for k in sorted(slam2.tracker.perf)
    }
    print("MAPPING HOST-PHASE ms [total, n]:", json.dumps(hp2),
          file=sys.stderr)

    fps = float(np.median(fps_reps))
    wall_ms = 1e3 / fps
    n_kf = slam.map.n_kf - len(slam.map.kf_free)
    print(
        json.dumps(
            {
                "metric": "slam_tracked_frames_per_sec_640x480",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 4),
                "spread_min_max": [
                    round(min(fps_reps), 2), round(max(fps_reps), 2),
                ],
                "n_timed_compiles": counter.count,
                "device_ms_per_frame": round(device_ms, 2),
                "host_ms_per_frame": round(max(wall_ms - device_ms, 0.0), 2),
                "ate_rmse_m": round(ate, 4),
                "n_keyframes": [kf0, n_kf],
                "n_frames_timed": reps * n_timed,
                "timed_wall_s": round(t_all, 1),
                # system-under-mapping regime (walk sweep, surfels ON)
                "slam_with_mapping_frames_per_sec": round(fps2, 2),
                "mapping_spread_min_max": [
                    round(min(fps2_reps), 2), round(max(fps2_reps), 2),
                ],
                "mapping_n_keyframes": [kf2_0, kf2_1],
                "mapping_ate_rmse_m": round(ate2, 4),
                "mapping_n_timed_compiles": counter2.count,
            }
        )
    )
    assert counter.count == 0, (
        f"{counter.count} XLA compiles inside the timed region"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
