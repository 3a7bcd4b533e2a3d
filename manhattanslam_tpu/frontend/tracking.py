"""Host-side tracking state machine (reference Tracking.cc:214-546).

The branchy per-frame control flow (state machine, tracker fallbacks,
keyframe policy) runs on host — it is cheap and data-dependent — while
every heavy step (extraction, matching, optimization) is one of the jitted
programs in tracking_ops/frame.  Per-frame device round-trips: extract,
one or two track solves, plus small scalar pulls.

States mirror Tracking.h:85-91: NOT_INITIALIZED -> OK <-> LOST.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import SlamConfig
from manhattanslam_tpu.frontend import tracking_ops
from manhattanslam_tpu.frontend.frame import backproject_keypoints, build_extractor
from manhattanslam_tpu.geometry import se3
from manhattanslam_tpu.ops import lm
from manhattanslam_tpu.slam_map import SlamMap

NOT_INITIALIZED = "NOT_INITIALIZED"
OK = "OK"
LOST = "LOST"


@dataclass
class FrameRecord:
    """Per-frame trajectory bookkeeping (Tracking.cc:531-544)."""

    timestamp: float
    ref_kf: int
    T_cr: np.ndarray  # Tcw * inv(T_ref)
    lost: bool


class Tracker:
    def __init__(self, cfg: SlamConfig, slam_map: SlamMap):
        self.cfg = cfg
        self.map = slam_map
        self.extract = build_extractor(cfg)
        self.params = lm.default_params(cfg)
        self.K = jnp.asarray(cfg.camera.K)
        self.bf = jnp.float32(cfg.camera.bf)
        self.image_hw = (cfg.camera.height, cfg.camera.width)

        self.state = NOT_INITIALIZED
        self.only_tracking = False
        self.request_reset = False
        self.T_cw = np.eye(4, dtype=np.float32)
        self.velocity: np.ndarray | None = None
        self.frame_id = -1
        self.last_kf_frame_id = 0
        self.last_reloc_frame_id = -(10**9)
        self.ref_kf = 0
        self.n_inliers = 0

        self.last_feats = None  # device pytree of previous frame
        self.last_mp_idx = np.full(cfg.caps.max_keypoints, -1, np.int32)
        self.last_pose = np.eye(4, dtype=np.float32)

        self.records: list[FrameRecord] = []
        slam_map.kf_retire_callbacks.append(self._on_kf_retired)
        self.min_frames = 0
        self.max_frames = int(cfg.camera.fps)

        # hooks filled by the full system (planes/lines/manhattan/reloc)
        self.plane_module = None
        self.line_module = None
        self.reloc_module = None

        self._empty_planes = tracking_ops.empty_plane_obs(cfg.caps.max_planes_frame)
        self._empty_lines = tracking_ops.empty_line_obs(cfg.caps.max_lines)

    # ------------------------------------------------------------------ API
    def track(self, timestamp: float, gray: np.ndarray, depth: np.ndarray):
        """Process one RGB-D frame; returns Tcw (4,4) numpy or None."""
        self.frame_id += 1
        feats = self.extract(jnp.asarray(gray), jnp.asarray(depth))

        if self.state == NOT_INITIALIZED:
            self._stereo_initialization(timestamp, feats, gray, depth)
            self._record(timestamp, lost=False)
            self._set_last(feats)
            return self.T_cw.copy()

        lost_this_frame = not self._track_frame(timestamp, feats, gray, depth)
        self._record(timestamp, lost=lost_this_frame)
        self._set_last(feats)
        return None if lost_this_frame else self.T_cw.copy()

    # ------------------------------------------------------------- tracking
    def _track_frame(
        self, timestamp: float, feats: dict, gray: np.ndarray, depth: np.ndarray
    ) -> bool:
        cfg = self.cfg
        if self.state == LOST:
            ok = self._relocalize(feats)
            if not ok:
                return False
            self.state = OK
            self.velocity = None
            self.last_reloc_frame_id = self.frame_id

        T_seed = (
            self.velocity @ self.last_pose
            if self.velocity is not None
            else self.last_pose
        ).astype(np.float32)

        ok = False
        out = None
        local_ids = None

        # --- initial pose: full 6-dof point solve (motion model / ref-KF).
        # NOTE an intentional re-ordering vs the reference (Tracking.cc:253
        # runs PlaneMatcher on the velocity-seed pose): we associate planes
        # at the point-solve pose instead, which tolerates much larger
        # inter-frame motion for the same 5 cm association gate. ---
        if self.velocity is not None:
            out = self._track_last_frame(feats, T_seed, radius=7.0)
            ok = int(out["n_pt_inliers"]) >= 10
            if not ok:  # widen search (Tracking.cc:1321-1327 retry with 2*th)
                out = self._track_last_frame(feats, T_seed, radius=14.0)
                ok = int(out["n_pt_inliers"]) >= 10
        if not ok:
            out = self._track_ref_kf(feats, self.last_pose)
            ok = int(out["n_pt_inliers"]) >= 10
        if not ok:
            self._set_lost()
            return False

        T = np.asarray(out["T"])

        # --- planes: extract, associate at refined pose, detect Manhattan ---
        if self.plane_module is not None:
            self.plane_module.process_frame(depth, T)
            manhattan_R = self.plane_module.manhattan_Rcw
            # Manhattan decoupled path: rotation from the Manhattan frame,
            # translation-only re-solve (Tracking.cc:257-275,:846-944)
            if manhattan_R is not None:
                T_manh = T.copy()
                T_manh[:3, :3] = manhattan_R
                out_t = self._track_last_frame(
                    feats, T_manh, radius=7.0, translation_only=True
                )
                if int(out_t["n_pt_inliers"]) < 10:
                    # motion-model translation failed: retry against the
                    # reference keyframe by descriptors before abandoning
                    # the Manhattan rotation (TranslationEstimation,
                    # Tracking.cc:846-944)
                    out_t = self._track_ref_kf(
                        feats, T_manh, translation_only=True
                    )
                if int(out_t["n_pt_inliers"]) >= 10:
                    out = out_t
                    T = np.asarray(out["T"])
                    self.plane_module.match(T)
        if self.line_module is not None:
            self.line_module.process_frame(gray, depth, T)

        # --- track local map ---
        out2, local_ids = self._track_local_map(feats, T)
        self.n_inliers = int(out2["n_pt_inliers"])
        # require 50 inliers while within max_frames of a relocalization
        # (Tracking.cc TrackLocalMap reloc-recency rule), 30 otherwise
        recently_relocalized = (
            self.frame_id < self.last_reloc_frame_id + self.max_frames
        )
        ok = self.n_inliers >= (50 if recently_relocalized else 30)
        if not ok:
            self._set_lost()
            return False

        self.state = OK
        T = np.asarray(out2["T"])

        # final plane association at the optimized pose (bookkeeping quality:
        # new-plane flag, keyframe observations, Manhattan registration)
        if self.plane_module is not None:
            self.plane_module.match(T)

        # velocity model update (Tracking.cc:440-446)
        self.velocity = (T @ np.linalg.inv(self.last_pose)).astype(np.float32)
        self.T_cw = T

        # per-keypoint landmark associations for the next frame + stats
        kp_mp = np.full(self.cfg.caps.max_keypoints, -1, np.int32)
        kp_idx = np.asarray(out2["kp_idx"])
        inl = np.asarray(out2["pt_inlier"])
        matched = np.asarray(out2["matched"])
        vis = np.asarray(out2["visible"])
        ids = local_ids
        kp_mp[kp_idx[inl]] = ids[inl]
        self.last_mp_idx = kp_mp

        valid_ids = ids >= 0
        self.map.mp_visible[ids[valid_ids & vis]] += 1
        self.map.mp_found[ids[valid_ids & matched & inl]] += 1

        # --- keyframe policy ---
        if not self.only_tracking and self._need_new_keyframe(feats):
            self._create_keyframe(timestamp, feats)
        return True

    def _pts_view_from_map_ids(self, ids: np.ndarray) -> tuple[dict, np.ndarray]:
        """Fixed-shape landmark view for the given per-slot map ids (-1 pad)."""
        m = self.map
        safe = np.maximum(ids, 0)
        return {
            "pos": jnp.asarray(m.mp_pos[safe]),
            "desc": jnp.asarray(m.mp_desc[safe]),
            "valid": jnp.asarray((ids >= 0) & m.mp_valid[safe]),
            "level": jnp.asarray(m.mp_level[safe]),
        }

    def _temporal_points(self) -> dict | None:
        """Localization-mode temporal VO landmarks from the last frame's
        depth (UpdateLastFrame, Tracking.cc:1052-1144): close unmatched
        keypoints become throwaway landmarks for motion-model matching."""
        if self.last_feats is None:
            return None
        f = {k: np.asarray(v) for k, v in self.last_feats.items()}
        depth = f["depth"]
        usable = f["valid"] & (depth > 0) & (self.last_mp_idx < 0)
        order = np.argsort(np.where(usable, depth, np.inf))[:100]
        order = order[usable[order]]
        n_kp = self.cfg.caps.max_keypoints
        pos = np.zeros((n_kp, 3), np.float32)
        valid = np.zeros(n_kp, bool)
        cam = self.cfg.camera
        if len(order):
            d = depth[order]
            x = (f["xy_und"][order, 0] - cam.cx) / cam.fx * d
            y = (f["xy_und"][order, 1] - cam.cy) / cam.fy * d
            pc = np.stack([x, y, d], -1)
            T_wc = np.linalg.inv(self.last_pose)
            pos[: len(order)] = pc @ T_wc[:3, :3].T + T_wc[:3, 3]
            valid[: len(order)] = True
        desc = np.zeros((n_kp, 8), np.uint32)
        desc[: len(order)] = f["desc"][order]
        level = np.zeros(n_kp, np.int32)
        level[: len(order)] = f["level"][order]
        return {
            "pos": jnp.asarray(pos),
            "desc": jnp.asarray(desc),
            "valid": jnp.asarray(valid),
            "level": jnp.asarray(level),
        }

    def _track_last_frame(
        self, feats, T_seed, radius: float, translation_only: bool = False
    ) -> dict:
        pts = self._pts_view_from_map_ids(self.last_mp_idx)
        if self.only_tracking:
            vo = self._temporal_points()
            if vo is not None:
                pts = {k: jnp.concatenate([pts[k], vo[k]]) for k in pts}
        plane_obs, line_obs = self._gather_structural()
        return tracking_ops.track_projection(
            pts, jnp.asarray(T_seed), feats, self.K, self.bf, self.params,
            jnp.float32(radius), self.image_hw,
            plane_obs, line_obs,
            scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
            translation_only=translation_only,
        )

    def _track_ref_kf(self, feats, T_seed, translation_only: bool = False) -> dict:
        m = self.map
        kf = self.ref_kf
        ids = m.kf_mp_idx[kf]
        pts = self._pts_view_from_map_ids(ids)
        plane_obs, line_obs = self._gather_structural()
        return tracking_ops.track_descriptors(
            pts, jnp.asarray(T_seed), feats,
            jnp.asarray(m.kf_angle[kf]), self.K, self.bf, self.params,
            plane_obs, line_obs,
            translation_only=translation_only,
        )

    def _local_keyframes(self) -> np.ndarray:
        """KFs sharing landmarks with the current frame + top covisible
        neighbors (UpdateLocalKeyFrames, Tracking.cc:1754-1850)."""
        m = self.map
        matched = self.last_mp_idx[self.last_mp_idx >= 0]
        if len(matched) == 0:
            base = np.array([self.ref_kf])
        else:
            seen = np.isin(m.kf_mp_idx[: m.n_kf], matched).sum(axis=1)
            seen[~m.kf_valid[: m.n_kf]] = 0
            base = np.nonzero(seen > 0)[0]
            if len(base) == 0:
                base = np.array([self.ref_kf])
            # reference keyframe := most-sharing KF
            self.ref_kf = int(base[np.argmax(seen[base])])
        neigh = set(base.tolist())
        for k in base[:10]:
            neigh.update(m.covisible_kfs(int(k))[:10].tolist())
        out = np.array(sorted(neigh), np.int64)
        return out[: self.cfg.caps.max_local_keyframes]

    def _track_local_map(self, feats, T_seed) -> tuple[dict, np.ndarray]:
        m = self.map
        local_kfs = self._local_keyframes()
        view = m.local_map_view(local_kfs)
        pts = {
            "pos": jnp.asarray(view["pos"]),
            "desc": jnp.asarray(view["desc"]),
            "valid": jnp.asarray(view["valid"]),
            "normal": jnp.asarray(view["normal"]),
            "min_dist": jnp.asarray(view["min_dist"]),
            "max_dist": jnp.asarray(view["max_dist"]),
        }
        plane_obs, line_obs = self._gather_structural()
        out = tracking_ops.track_projection(
            pts, jnp.asarray(T_seed), feats, self.K, self.bf, self.params,
            jnp.float32(4.0), self.image_hw,
            plane_obs, line_obs,
            scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
            use_scale_gate=True,
        )
        return out, view["ids"]

    def _gather_structural(self):
        """Plane/line observations for the pose solves."""
        planes = (
            self.plane_module.plane_observations()
            if self.plane_module is not None
            else self._empty_planes
        )
        lines = (
            self.line_module.line_observations()
            if self.line_module is not None
            else self._empty_lines
        )
        return planes, lines

    # ------------------------------------------------------ initialization
    def _stereo_initialization(
        self, timestamp: float, feats: dict, gray: np.ndarray, depth: np.ndarray
    ) -> None:
        """StereoInitialization (Tracking.cc:548-625): first frame becomes a
        keyframe; every keypoint with depth becomes a map point; frame planes
        become map planes."""
        self.T_cw = np.eye(4, dtype=np.float32)
        feats_np = {k: np.asarray(v) for k, v in feats.items()}
        kf_id = self.map.add_keyframe(self.T_cw, timestamp, self.frame_id, feats_np)
        mp_idx = self._create_points_from_depth(
            feats, feats_np, kf_id, np.full(self.cfg.caps.max_keypoints, -1, np.int32),
            max_new=10**9, only_close=False,
        )
        self.map.set_kf_matches(kf_id, mp_idx)
        if self.plane_module is not None:
            self.plane_module.process_frame(depth, self.T_cw)
            self.plane_module.on_keyframe(kf_id, self.T_cw)
        if self.line_module is not None:
            self.line_module.process_frame(gray, depth, self.T_cw)
            self.line_module.on_keyframe(kf_id, self.T_cw)
        self.last_mp_idx = mp_idx
        self.prev_ref_kf = self.ref_kf  # surfel pose-graph reference link
        self.ref_kf = kf_id
        self.last_kf_frame_id = self.frame_id
        self.state = OK
        if self.on_keyframe is not None:
            self.on_keyframe(kf_id, feats, feats_np)

    def _create_points_from_depth(
        self,
        feats,
        feats_np: dict,
        kf_id: int,
        existing: np.ndarray,
        max_new: int,
        only_close: bool = True,
    ) -> np.ndarray:
        """Materialize new map points from depth (CreateNewKeyFrame,
        Tracking.cc:1510-1652: close points first, up to 100 total)."""
        cfg = self.cfg
        pts_cam = np.asarray(backproject_keypoints(feats, cfg))
        T_wc = np.linalg.inv(self.T_cw)
        pts_w = pts_cam @ T_wc[:3, :3].T + T_wc[:3, 3]
        depth = feats_np["depth"]
        valid = feats_np["valid"] & (depth > 0) & (existing < 0)
        order = np.argsort(np.where(valid, depth, np.inf))
        close_th = cfg.th_depth_m
        n_new = 0
        chosen = []
        for k in order:
            if not valid[k]:
                break
            if depth[k] > close_th and n_new >= max_new:
                break
            chosen.append(k)
            n_new += 1
            if n_new >= max_new and depth[k] > close_th:
                break
        if not chosen:
            return existing.copy()
        chosen = np.array(chosen)
        cam_center = T_wc[:3, 3]
        p = pts_w[chosen]
        dvec = p - cam_center
        dist = np.linalg.norm(dvec, axis=1)
        normal = dvec / np.maximum(dist[:, None], 1e-9)
        lvl = feats_np["level"][chosen]
        sf = cfg.orb.scale_factor
        max_dist = dist * sf**lvl
        min_dist = max_dist / sf ** (cfg.orb.n_levels - 1)
        ids = self.map.add_points(
            p, feats_np["desc"][chosen], normal, min_dist, max_dist, lvl, kf_id
        )
        out = existing.copy()
        out[chosen] = ids
        return out

    # ------------------------------------------------------ keyframe policy
    def _need_new_keyframe(self, feats) -> bool:
        """NeedNewKeyFrame (Tracking.cc:1433-1508), stereo/RGB-D branch."""
        m = self.map
        if m.n_kf >= self.cfg.caps.max_keyframes - 1:
            return False
        depth = np.asarray(feats["depth"])
        valid = np.asarray(feats["valid"])
        close = valid & (depth > 0) & (depth < self.cfg.th_depth_m)
        tracked_close = int((close & (self.last_mp_idx >= 0)).sum())
        nontracked_close = int((close & (self.last_mp_idx < 0)).sum())
        need_close = tracked_close < 100 and nontracked_close > 70

        ref_ids = m.kf_mp_idx[self.ref_kf]
        ref_matches = int((ref_ids >= 0).sum())
        th_ref = 0.75 if m.n_kf > 2 else 0.4

        frames_since = self.frame_id - self.last_kf_frame_id
        c1a = frames_since >= self.max_frames
        c1b = frames_since >= self.min_frames
        c1c = self.n_inliers < ref_matches * 0.25 or need_close
        c2 = (
            self.n_inliers < ref_matches * th_ref or need_close
        ) and self.n_inliers > 15
        # a new (unassociated) plane forces a keyframe (Tracking.cc:1494)
        new_plane = (
            self.plane_module is not None and self.plane_module.new_plane
        )
        return ((c1a or c1b or c1c) and c2) or new_plane

    def _create_keyframe(self, timestamp: float, feats) -> None:
        feats_np = {k: np.asarray(v) for k, v in feats.items()}
        kf_id = self.map.add_keyframe(self.T_cw, timestamp, self.frame_id, feats_np)
        mp_idx = self._create_points_from_depth(
            feats, feats_np, kf_id, self.last_mp_idx, max_new=100
        )
        self.map.set_kf_matches(kf_id, mp_idx)
        if self.plane_module is not None:
            self.plane_module.on_keyframe(kf_id, self.T_cw)
        if self.line_module is not None:
            self.line_module.on_keyframe(kf_id, self.T_cw)
        self.last_mp_idx = mp_idx
        self.prev_ref_kf = self.ref_kf  # surfel pose-graph reference link
        self.ref_kf = kf_id
        self.last_kf_frame_id = self.frame_id
        if self.on_keyframe is not None:
            self.on_keyframe(kf_id, feats, feats_np)

    on_keyframe = None  # hook: local mapping / surfels subscribe here

    # -------------------------------------------------------------- relocal
    def _relocalize(self, feats) -> bool:
        if self.reloc_module is None:
            return False
        T = self.reloc_module.relocalize(feats)
        if T is None:
            return False
        self.T_cw = T.astype(np.float32)
        self.last_pose = self.T_cw.copy()
        return True

    # ---------------------------------------------------------- bookkeeping
    def _set_lost(self) -> None:
        """Tracking lost; with a barely-started map (<=5 KFs) request a
        full system reset instead of relocalizing (Tracking.cc:517-523)."""
        self.state = LOST
        if not self.only_tracking and self.map.n_kf <= 5:
            self.request_reset = True

    def _record(self, timestamp: float, lost: bool) -> None:
        T_ref = self.map.kf_pose[self.ref_kf]
        if lost:
            # reuse previous relative pose (Tracking.cc:538-544)
            T_cr = self.records[-1].T_cr if self.records else np.eye(4, np.float32)
        else:
            T_cr = (self.T_cw @ np.linalg.inv(T_ref)).astype(np.float32)
        self.records.append(FrameRecord(timestamp, self.ref_kf, T_cr, lost))

    def _on_kf_retired(self, kf: int, parent: int) -> None:
        """Re-anchor records referencing a retired keyframe onto its
        spanning-tree parent (System.cc:221-224 replay, applied eagerly
        so the slot can be reused)."""
        if parent < 0:
            return
        m = self.map
        M = (m.kf_pose[kf] @ np.linalg.inv(m.kf_pose[parent])).astype(
            np.float32
        )
        for r in self.records:
            if r.ref_kf == kf:
                r.T_cr = r.T_cr @ M
                r.ref_kf = parent
        if self.ref_kf == kf:
            self.ref_kf = parent

    def _set_last(self, feats) -> None:
        self.last_feats = feats
        self.last_pose = self.T_cw.copy()

    # ------------------------------------------------------------- export
    def trajectory_rows(self):
        """Replay Tcr * T_ref chain (System::SaveTrajectoryTUM semantics)."""
        rows = []
        Two = np.linalg.inv(self.map.kf_pose[0])
        for rec in self.records:
            if rec.lost:
                continue
            Trw = self.map.kf_pose[rec.ref_kf] @ Two
            T_cw = rec.T_cr @ Trw
            R_wc = T_cw[:3, :3].T
            t_wc = -R_wc @ T_cw[:3, 3]
            q = se3.rotmat_to_quat_np(R_wc)
            rows.append((rec.timestamp, t_wc, q))
        return rows

    def keyframe_rows(self):
        rows = []
        m = self.map
        for i in range(m.n_kf):
            if not m.kf_valid[i]:
                continue
            T = m.kf_pose[i]
            R_wc = T[:3, :3].T
            t_wc = -R_wc @ T[:3, 3]
            q = se3.rotmat_to_quat_np(R_wc)
            rows.append((m.kf_time[i], t_wc, q))
        return rows
