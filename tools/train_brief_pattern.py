#!/usr/bin/env python3
"""Train a decorrelated BRIEF test pattern in-repo (rBRIEF construction).

The reference ships a LEARNED 256-pair table (bit_pattern_31_,
ORBextractor.cc:152-427) that this rebuild deliberately does not copy;
round 2 substituted a seeded-Gaussian pattern.  This tool reproduces the
ORB paper's greedy construction on OUR photo-texture corpus:

1. render photo-textured frames, extract oriented keypoints (jnp path),
2. build a candidate pool of Gaussian test pairs,
3. compute each candidate's bit over all rotated training patches,
4. greedily keep tests with mean near 0.5 and max |correlation| to the
   already-chosen set under a threshold (raised when the pool runs dry),
5. audit precision/recall of Gaussian vs learned pattern on held-out
   frame pairs with ground-truth geometry, and write the winner to
   manhattanslam_tpu/ops/brief_pattern.npy.

Run on CPU:  JAX_PLATFORMS=cpu python tools/train_brief_pattern.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_CAND = 3000
N_BITS = 256
CORR_TH0 = 0.2


def gather_training_patches(n_frames=6, width=320, height=240, seed=3):
    """Oriented keypoints from photo-textured frames -> (N, 31+2r, ...)
    raw images + keypoint (x, y, angle) lists."""
    import jax.numpy as jnp

    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.phototex import PhotoSequence
    from manhattanslam_tpu.frontend.frame import build_extractor
    from manhattanslam_tpu.ops.image import gaussian_blur

    cam = CameraConfig(
        fx=width * 0.82, fy=width * 0.82, cx=width / 2 - 0.5,
        cy=height / 2 - 0.5, k1=0, k2=0, p1=0, p2=0, k3=0,
        width=width, height=height,
    )
    cfg = SlamConfig(camera=cam)
    seq = PhotoSequence(n_frames=n_frames, cam=cam, seed=seed)
    extract = build_extractor(cfg, use_pallas=False)
    out = []
    for i in range(n_frames):
        t, gray, depth = seq.frame(i)
        feats = extract(jnp.asarray(gray), jnp.asarray(depth))
        blur = np.asarray(gaussian_blur(jnp.asarray(gray), 7, 2.0))
        xy = np.asarray(feats["xy"])
        ang = np.asarray(feats["angle"])
        val = np.asarray(feats["valid"]) & (np.asarray(feats["level"]) == 0)
        # keep level-0 keypoints away from borders
        b = 20
        sel = val & (xy[:, 0] > b) & (xy[:, 0] < width - b) \
            & (xy[:, 1] > b) & (xy[:, 1] < height - b)
        out.append((blur, xy[sel], ang[sel]))
    return out


def candidate_bits(frames, cands):
    """bits[p, c] for every training patch p and candidate pair c."""
    rows = []
    for blur, xy, ang in frames:
        h, w = blur.shape
        ca, sa = np.cos(ang), np.sin(ang)  # (P,)
        py, px = cands[:, :, 0], cands[:, :, 1]  # (C, 2)
        # rotated absolute sample coords: (P, C, 2)
        rx = px[None] * ca[:, None, None] - py[None] * sa[:, None, None]
        ry = px[None] * sa[:, None, None] + py[None] * ca[:, None, None]
        sx = np.clip(np.round(xy[:, 0, None, None] + rx), 0, w - 1).astype(int)
        sy = np.clip(np.round(xy[:, 1, None, None] + ry), 0, h - 1).astype(int)
        v = blur[sy, sx]  # (P, C, 2)
        rows.append(v[..., 0] < v[..., 1])
    return np.concatenate(rows, 0)  # (N, C)


def greedy_select(bits, n_bits=N_BITS, corr_th=CORR_TH0):
    """ORB-paper greedy: order by |mean-0.5|, keep tests uncorrelated with
    the chosen set; raise the threshold when the pool runs dry."""
    n, c = bits.shape
    mean = bits.mean(0)
    order = np.argsort(np.abs(mean - 0.5))
    b = bits.astype(np.float32)
    b -= b.mean(0, keepdims=True)
    norm = np.linalg.norm(b, axis=0).clip(1e-9)
    chosen: list[int] = [int(order[0])]
    th = corr_th
    while len(chosen) < n_bits:
        added = False
        for c_i in order:
            c_i = int(c_i)
            if c_i in chosen:
                continue
            corr = np.abs(
                b[:, chosen].T @ b[:, c_i] / (norm[chosen] * norm[c_i])
            )
            if corr.max() < th:
                chosen.append(c_i)
                added = True
                if len(chosen) >= n_bits:
                    break
        if not added:
            th += 0.05
            print(f"  pool dry at {len(chosen)}; corr threshold -> {th:.2f}")
    return np.array(chosen)


def audit(pattern, n_pairs=4, width=320, height=240, seed=11):
    """Match precision/recall on held-out photo frames with GT geometry."""
    import jax.numpy as jnp

    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.phototex import PhotoSequence
    from manhattanslam_tpu.frontend.frame import build_extractor
    from manhattanslam_tpu.ops import matching
    from manhattanslam_tpu.ops import orb as orb_ops
    from manhattanslam_tpu.ops.image import gaussian_blur

    cam = CameraConfig(
        fx=width * 0.82, fy=width * 0.82, cx=width / 2 - 0.5,
        cy=height / 2 - 0.5, k1=0, k2=0, p1=0, p2=0, k3=0,
        width=width, height=height,
    )
    cfg = SlamConfig(camera=cam)
    seq = PhotoSequence(n_frames=2 * n_pairs + 2, cam=cam, seed=seed)
    extract = build_extractor(cfg, use_pallas=False)
    K = np.asarray(cam.K, np.float64)

    old = orb_ops.PATTERN
    orb_ops.PATTERN = pattern  # monkeypatch for the audit only

    def frame_feats(i):
        t, gray, depth = seq.frame(i)
        feats = extract(jnp.asarray(gray), jnp.asarray(depth))
        blur = gaussian_blur(jnp.asarray(gray), 7, 2.0)
        desc = orb_ops.brief_descriptors(blur, feats["xy"], feats["angle"])
        return (
            np.asarray(feats["xy"]), np.asarray(feats["depth"]),
            np.asarray(feats["valid"]), np.asarray(desc), depth,
        )

    n_correct = n_matched = n_possible = 0
    for p in range(n_pairs):
        ia, ib = 2 * p, 2 * p + 1
        xy_a, d_a, v_a, desc_a, _ = frame_feats(ia)
        xy_b, d_b, v_b, desc_b, _ = frame_feats(ib)
        # GT mapping a->b through depth + poses
        Ta, Tb = seq.poses[ia], seq.poses[ib]  # camera-to-world
        T_ba = np.linalg.inv(Tb) @ Ta
        pc = np.stack(
            [
                (xy_a[:, 0] - K[0, 2]) / K[0, 0] * d_a,
                (xy_a[:, 1] - K[1, 2]) / K[1, 1] * d_a,
                d_a,
            ],
            -1,
        )
        pb = pc @ T_ba[:3, :3].T + T_ba[:3, 3]
        z = pb[:, 2].clip(1e-6)
        ub = pb[:, 0] / z * K[0, 0] + K[0, 2]
        vb = pb[:, 1] / z * K[1, 1] + K[1, 2]
        in_b = (
            v_a & (d_a > 0) & (pb[:, 2] > 0.05)
            & (ub >= 0) & (ub < width) & (vb >= 0) & (vb < height)
        )
        # a keypoint is matchable if some frame-b keypoint lies within 2 px
        dist_gt = np.hypot(
            ub[:, None] - xy_b[None, :, 0], vb[:, None] - xy_b[None, :, 1]
        )
        dist_gt[:, ~v_b] = 1e9
        has_gt = in_b & (dist_gt.min(1) < 2.0)
        n_possible += int(has_gt.sum())

        idx, dist, ok = matching.match_descriptors(
            jnp.asarray(desc_a), jnp.asarray(desc_b),
            jnp.asarray(v_a), jnp.asarray(v_b),
            max_dist=matching.TH_LOW, ratio=0.8,
        )
        idx, ok = np.asarray(idx), np.asarray(ok)
        m = ok & in_b
        err = dist_gt[np.arange(len(idx)), idx]
        n_matched += int(m.sum())
        n_correct += int((m & (err < 3.0)).sum())

    orb_ops.PATTERN = old
    prec = n_correct / max(n_matched, 1)
    rec = n_correct / max(n_possible, 1)
    return prec, rec, n_matched, n_possible


def main():
    rng = np.random.default_rng(99)
    pts = rng.normal(0.0, 31 / 5.0, size=(N_CAND, 2, 2))
    r = np.sqrt((pts**2).sum(-1, keepdims=True))
    pts = np.round(pts * np.minimum(1.0, 13.0 / np.maximum(r, 1e-6)))
    cands = pts.astype(np.int32)

    print("rendering training corpus ...", flush=True)
    frames = gather_training_patches()
    n_patches = sum(len(f[1]) for f in frames)
    print(f"  {n_patches} oriented patches", flush=True)
    print("computing candidate bits ...", flush=True)
    bits = candidate_bits(frames, cands)
    print("greedy decorrelated selection ...", flush=True)
    chosen = greedy_select(bits)
    learned = cands[chosen]

    from manhattanslam_tpu.ops import orb as orb_ops

    gauss = orb_ops._make_pattern()
    print("auditing (held-out photo pairs) ...", flush=True)
    pg = audit(gauss)
    pl = audit(learned)
    print(f"gaussian: precision {pg[0]:.4f} recall {pg[1]:.4f} "
          f"({pg[2]} matches / {pg[3]} possible)")
    print(f"learned : precision {pl[0]:.4f} recall {pl[1]:.4f} "
          f"({pl[2]} matches / {pl[3]} possible)")

    out = os.path.join(
        os.path.dirname(__file__), "..", "manhattanslam_tpu", "ops",
        "brief_pattern.npy",
    )
    winner = learned if (pl[0] * pl[1]) >= (pg[0] * pg[1]) else gauss
    name = "learned" if winner is learned else "gaussian"
    np.save(os.path.abspath(out), winner)
    print(f"saved {name} pattern -> {out}")


if __name__ == "__main__":
    main()
