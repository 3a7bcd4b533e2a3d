"""Relocalization: place recognition + pose recovery after tracking loss.

Replaces the reference's DBoW2 stack (ORBVocabulary + KeyFrameDatabase
inverted file, KeyFrameDatabase.cc:68-170) and EPnP relocalizer
(Tracking::Relocalization, Tracking.cc:1909-2055):

- Vocabulary: the shipped ORB vocabulary file is absent from the
  reference checkout (SURVEY.md headline facts), and a k-d word tree is a
  poor fit for the MXU anyway.  We use multi-bank LSH signatures instead:
  descriptors project onto B banks x K random hyperplanes (one matmul),
  giving B independent word ids per keypoint; each keyframe stores B
  L1-normalized word histograms.  Candidate scoring = IDF-weighted dot
  product summed over banks — one (1, B*W) x (B*W, KF) matmul — the same
  "share-enough-words then score" shape as DetectRelocalizationCandidates,
  including the covisibility-accumulated >= 0.75 * best gate.  Multiple
  independent banks + IDF down-weighting of common words recover the
  discrimination a single small vocabulary loses on self-similar indoor
  texture (measured: top-5 recall 62% -> >=90% at 208 keyframes,
  tests/test_reloc_stress.py).
- Pose recovery: descriptor matching (NN ratio 0.75, TH_LOW) against each
  candidate's map points, then 3D-3D Kabsch RANSAC (ops/ransac_pose.py)
  and the full LM pose refine, accepting at >= 50 inliers like the
  reference (Tracking.cc:2040).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import SlamConfig
from manhattanslam_tpu.frontend import tracking_ops
from manhattanslam_tpu.frontend.frame import backproject_keypoints
from manhattanslam_tpu.ops import lm, matching, ransac_pose
from manhattanslam_tpu.slam_map import SlamMap

N_BITS = 12  # hyperplane bits per bank
N_WORDS = 1 << N_BITS  # 4096 words per bank
N_BANKS = 4  # independent LSH banks (variance reduction)


class Relocalizer:
    def __init__(self, cfg: SlamConfig, slam_map: SlamMap):
        self.cfg = cfg
        self.map = slam_map
        rng = np.random.default_rng(1234)
        # random hyperplanes over the 256-bit descriptor space
        self.planes_np = rng.normal(size=(256, N_BANKS * N_BITS)).astype(
            np.float32
        )
        self.planes = jnp.asarray(self.planes_np)
        self.kf_bow = np.zeros(
            (cfg.caps.max_keyframes, N_BANKS * N_WORDS), np.float32
        )
        self.params = lm.default_params(cfg)
        self.K = jnp.asarray(cfg.camera.K)
        self.bf = jnp.float32(cfg.camera.bf)
        self._key = jax.random.PRNGKey(7)
        self._empty_planes = tracking_ops.empty_plane_obs(cfg.caps.max_planes_frame)
        self._empty_lines = tracking_ops.empty_line_obs(cfg.caps.max_lines)

    def reset(self, slam_map: SlamMap) -> None:
        self.map = slam_map
        self.kf_bow[:] = 0

    # ----------------------------------------------------------------- BoW
    def compute_bow(self, desc, valid) -> np.ndarray:
        """Concatenated L1-normalized word histograms, one per LSH bank.

        Pure host numpy: a (N,256)x(256,48) product costs ~50 us on CPU,
        while the device round trip used to wait behind every in-flight
        chunk on the in-order tunnel queue (~250 ms per keyframe event on
        the mapping-backend thread)."""
        desc = np.ascontiguousarray(desc)
        valid = np.asarray(valid)
        # (N, 8) uint32 -> (N, 256) bits, same global bit order as the
        # device unpack (little-endian within each word)
        bits = np.unpackbits(
            desc.view(np.uint8), axis=-1, bitorder="little"
        ).astype(np.float32)
        proj = ((2.0 * bits - 1.0) @ self.planes_np).reshape(
            -1, N_BANKS, N_BITS
        )
        words = ((proj > 0) << np.arange(N_BITS)[None, None]).sum(-1)
        flat = (words + N_WORDS * np.arange(N_BANKS)[None]).ravel()
        hist = np.zeros(N_BANKS * N_WORDS, np.float32)
        np.add.at(hist, flat, np.repeat(valid.astype(np.float32), N_BANKS))
        return hist / max(hist.sum(), 1e-9)

    def add_keyframe(self, kf_id: int) -> None:
        m = self.map
        self.kf_bow[kf_id] = self.compute_bow(
            m.kf_desc[kf_id], m.kf_kp_valid[kf_id]
        )

    def detect_candidates(self, feats: dict, max_cand: int = 5) -> list[int]:
        """DetectRelocalizationCandidates scoring shape."""
        m = self.map
        if m.n_kf == 0:
            return []
        q = self.compute_bow(feats["desc"], feats["valid"])
        # IDF: common words (floor/wall texture words that appear in most
        # keyframes) carry no place information — the DBoW2 vocabulary
        # encodes this in its word weights; here it is recomputed from the
        # live database (cheap: one boolean reduce over the histograms)
        kfb = self.kf_bow[: m.n_kf]
        n_valid = max(int(m.kf_valid[: m.n_kf].sum()), 1)
        df = (kfb > 0).astype(np.float32).T @ m.kf_valid[: m.n_kf].astype(
            np.float32
        )
        # smoothed so a word present in EVERY keyframe still scores > 0
        # (a tiny/degenerate database must fall back to plain TF, not
        # return no candidates)
        idf = np.log1p(n_valid / (1.0 + df)).astype(np.float32)
        scores = kfb @ (q * idf * idf)  # IDF on both sides, folded
        scores = scores * m.kf_valid[: m.n_kf]
        if scores.max() <= 0:
            return []
        # covisibility-accumulated score (KeyFrameDatabase.cc:120-160):
        # each KF accumulates the scores of its top-10 covisible neighbors
        # — one masked top-k over the weight matrix (the per-KF
        # covisible_kfs loop was O(KF^2 log KF) per lost frame)
        W = m.covis[: m.n_kf, : m.n_kf] * m.kf_valid[: m.n_kf][None, :]
        k10 = min(10, max(m.n_kf - 1, 1))
        top = np.argpartition(-W, k10 - 1, axis=1)[:, :k10]
        w_top = np.take_along_axis(W, top, axis=1)
        acc = scores + (scores[top] * (w_top >= 15)).sum(axis=1)
        acc = np.where(scores > 0, acc, 0.0)
        th = 0.75 * acc.max()
        cands = np.nonzero(acc >= th)[0]
        order = cands[np.argsort(-acc[cands])]
        return order[:max_cand].tolist()

    def warm(self, feats: dict) -> None:
        """Compile every device program of the relocalization pipeline
        (BoW, matching, RANSAC, LM refine, widen/narrow re-search) by
        running each once, ignoring the data-dependent early exits of
        relocalize() — so a tracking loss inside a timed benchmark region
        never pays a first-compile."""
        m = self.map
        if m.n_kf == 0:
            return
        self.detect_candidates(feats)
        ids = m.kf_mp_idx[0]
        safe = np.maximum(ids, 0)
        pts_valid = (ids >= 0) & m.mp_valid[safe]
        pts_c_all = backproject_keypoints(feats, self.cfg)
        idx, dist, ok = matching.match_descriptors(
            jnp.asarray(m.mp_desc[safe]), feats["desc"],
            jnp.asarray(pts_valid), feats["valid"],
            max_dist=matching.TH_LOW, ratio=0.75,
        )
        ok = matching.resolve_one_to_one(
            idx, dist, ok, feats["desc"].shape[0]
        )
        self._key, sub = jax.random.split(self._key)
        res = ransac_pose.pose_ransac_3d3d(
            jnp.asarray(m.mp_pos[safe]), pts_c_all[idx],
            feats["xy_und"][idx], ok, self.K, sub,
        )
        res_pnp = ransac_pose.pose_ransac_pnp(
            jnp.asarray(m.mp_pos[safe]), feats["xy_und"][idx], ok,
            self.K, sub,
        )
        prob = tracking_ops.build_point_problem(
            jnp.asarray(m.mp_pos[safe]), idx, ok,
            feats, self._empty_planes, self._empty_lines,
        )
        out = lm.solve_pose(
            prob, jnp.eye(4, dtype=jnp.float32), self.K, self.bf, self.params
        )
        bank = {
            "pos": jnp.asarray(m.mp_pos[safe]),
            "desc": jnp.asarray(m.mp_desc[safe]),
            "valid": jnp.asarray(pts_valid),
            "level": jnp.asarray(m.mp_level[safe]),
        }
        cam = self.cfg.camera
        out2 = tracking_ops.track_projection(
            bank, out["T"], feats, self.K, self.bf, self.params,
            jnp.float32(10.0), (cam.height, cam.width),
            self._empty_planes, self._empty_lines,
            scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
        )
        jax.device_get(
            (res["ok"], res_pnp["ok"], out["n_inliers"], out2["n_pt_inliers"])
        )

    # ---------------------------------------------------------------- pose
    def relocalize(self, feats: dict) -> np.ndarray | None:
        m = self.map
        pts_c_all = backproject_keypoints(feats, self.cfg)
        for kf in self.detect_candidates(feats):
            ids = m.kf_mp_idx[kf]
            safe = np.maximum(ids, 0)
            pts_valid = (ids >= 0) & m.mp_valid[safe]
            if pts_valid.sum() < 15:
                continue
            idx, dist, ok = matching.match_descriptors(
                jnp.asarray(m.mp_desc[safe]),
                feats["desc"],
                jnp.asarray(pts_valid),
                feats["valid"],
                max_dist=matching.TH_LOW,
                ratio=0.75,
            )
            ok = matching.resolve_one_to_one(
                idx, dist, ok, feats["desc"].shape[0]
            )
            ok_np = np.asarray(ok)
            if ok_np.sum() < 15:
                continue
            # 3D-3D RANSAC on depth-valid matches; when depth holes at the
            # matched keypoints starve that path (<10 usable), fall back to
            # depthless 2D-3D EPnP RANSAC (PnPsolver.h:60-200 role)
            kp_idx = np.asarray(idx)
            depth_ok = np.asarray(feats["depth"])[kp_idx] > 0
            use = ok_np & depth_ok
            self._key, sub = jax.random.split(self._key)
            if use.sum() >= 10:
                res = ransac_pose.pose_ransac_3d3d(
                    jnp.asarray(m.mp_pos[safe]),
                    pts_c_all[idx],
                    feats["xy_und"][idx],
                    jnp.asarray(use),
                    self.K,
                    sub,
                )
            else:
                res = ransac_pose.pose_ransac_pnp(
                    jnp.asarray(m.mp_pos[safe]),
                    feats["xy_und"][idx],
                    ok,
                    self.K,
                    sub,
                )
            if not bool(res["ok"]):
                continue
            T0 = np.eye(4, dtype=np.float32)
            T0[:3, :3] = np.asarray(res["R"])
            T0[:3, 3] = np.asarray(res["t"])
            # full LM refine against the candidate's points
            prob = tracking_ops.build_point_problem(
                jnp.asarray(m.mp_pos[safe]), idx, ok,
                feats, self._empty_planes, self._empty_lines,
            )
            out = lm.solve_pose(
                prob, jnp.asarray(T0), self.K, self.bf, self.params
            )
            n_in = int(out["n_inliers"])
            T_best = out["T"]
            if 10 <= n_in < 50:
                # widen-then-narrow projection search iteration
                # (Tracking.cc:1960-2046): with a coarse pose in hand,
                # re-search the candidate's points by projection with a
                # wide window (10 px), re-optimize; if still short,
                # a narrow window (3 px) disambiguates.
                bank = {
                    "pos": jnp.asarray(m.mp_pos[safe]),
                    "desc": jnp.asarray(m.mp_desc[safe]),
                    "valid": jnp.asarray(pts_valid),
                    "level": jnp.asarray(m.mp_level[safe]),
                }
                cam = self.cfg.camera
                for radius in (10.0, 3.0):
                    out2 = tracking_ops.track_projection(
                        bank, T_best, feats, self.K, self.bf, self.params,
                        jnp.float32(radius), (cam.height, cam.width),
                        self._empty_planes, self._empty_lines,
                        scale_factor=self.cfg.orb.scale_factor,
                        n_levels=self.cfg.orb.n_levels,
                    )
                    n2 = int(out2["n_pt_inliers"])
                    if n2 > n_in:
                        n_in, T_best = n2, out2["T"]
                    if n_in >= 50:
                        break
            if n_in >= 50 or (n_in >= 20 and n_in >= 0.5 * int(ok_np.sum())):
                # remember the matched keyframe: the caller re-anchors its
                # reference keyframe here (the reference's post-reloc
                # TrackReferenceKeyFrame works against this KF)
                self.last_kf = kf
                return np.asarray(T_best)
        return None

    last_kf: int = -1
