"""Mapping back end (reference LocalMapping.cc) — synchronous per keyframe.

The reference runs this as a thread with a keyframe queue
(LocalMapping.cc:40-101); at TPU frame rates the whole back end fits in
the keyframe budget, so we run it synchronously when a keyframe is
inserted (System._on_keyframe):

1. landmark culling (MapPointCulling :227-263: found/visible < 0.25, or
   <= 2 observations 2 keyframes after creation)
2. new-point triangulation against the top covisible keyframes
   (CreateNewMapPoints :303-522) — device-batched per pair
3. duplicate fusion across 2-hop covisibility (SearchInNeighbors :524-622)
4. redundant-keyframe culling (KeyFrameCulling :704-758: >= 90% of close
   points observed by >= 3 other keyframes at same-or-finer scale)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import SlamConfig
from manhattanslam_tpu.mapping import triangulation as tri
from manhattanslam_tpu.slam_map import SlamMap


class LocalMapper:
    def __init__(self, cfg: SlamConfig, slam_map: SlamMap):
        self.cfg = cfg
        self.map = slam_map
        self.K = jnp.asarray(cfg.camera.K)
        # recently added points pending the culling probation window
        self.recent_points: list[tuple[int, int]] = []  # (mp_id, birth_kf)

    # ------------------------------------------------------------------ API
    def process_keyframe(self, kf_id: int) -> None:
        m = self.map
        born = m.kf_mp_idx[kf_id]
        for mp in born[born >= 0]:
            if m.mp_first_kf[mp] == kf_id:
                self.recent_points.append((int(mp), kf_id))

        self.cull_map_points(kf_id)
        self.create_new_points(kf_id)
        self.fuse_neighbors(kf_id)
        self.fuse_lines(kf_id)
        self.refresh_point_landmarks(kf_id)
        self.cull_keyframes(kf_id)
        self.cull_map_planes(kf_id)
        self.cull_map_lines(kf_id)

    # -------------------------------------------------------------- culling
    def _obs_counts(self) -> np.ndarray:
        """Observations per map point (one bincount over kf_mp_idx)."""
        m = self.map
        flat = m.kf_mp_idx[: m.n_kf]
        flat = flat[flat >= 0]
        return np.bincount(flat, minlength=len(m.mp_valid))

    def cull_map_points(self, cur_kf: int) -> None:
        """MapPointCulling rules (LocalMapping.cc:227-263), vectorized."""
        m = self.map
        if not self.recent_points:
            return
        mps = np.array([p for p, _ in self.recent_points])
        born = np.array([b for _, b in self.recent_points])
        alive = m.mp_valid[mps]
        obs = self._obs_counts()[mps]
        ratio = m.mp_found[mps] / np.maximum(m.mp_visible[mps], 1)
        erase = alive & ((ratio < 0.25) | ((cur_kf - born >= 2) & (obs <= 2)))
        graduate = alive & ~erase & (cur_kf - born >= 3)
        keep = alive & ~erase & ~graduate
        self.recent_points = [
            (int(p), int(b)) for p, b in zip(mps[keep], born[keep])
        ]
        if erase.any():
            m.erase_points(mps[erase])

    def cull_map_planes(self, cur_kf: int) -> None:
        """MapPlaneCulling: planes with <3 observations 2 KFs after birth."""
        m = self.map
        for pl in np.nonzero(m.pl_valid)[0]:
            born = m.pl_first_kf[pl]
            if cur_kf - born >= 2 and m.pl_n_obs[pl] < 3:
                n_kf_obs = int((m.kf_pl_idx[: m.n_kf] == pl).sum())
                if n_kf_obs < 2:
                    m.pl_valid[pl] = False
                    m.kf_pl_idx[m.kf_pl_idx == pl] = -1

    def cull_map_lines(self, cur_kf: int) -> None:
        """MapLineCulling analog: lines unseen after their probation window
        or with a poor found/visible ratio are dropped."""
        m = self.map
        ids = np.nonzero(m.ml_valid)[0]
        if len(ids) == 0:
            return
        born = m.ml_first_kf[ids]
        ratio = m.ml_found[ids] / np.maximum(m.ml_visible[ids], 1)
        erase = ((cur_kf - born) >= 2) & (m.ml_n_obs[ids] < 2)
        erase |= ratio < 0.1
        if erase.any():
            bad = ids[erase]
            m.ml_valid[bad] = False
            m.kf_ml_idx[np.isin(m.kf_ml_idx, bad)] = -1

    # -------------------------------------------------------- triangulation
    def _kf_kp_view(self, kf: int, only_free: bool) -> dict:
        m = self.map
        valid = m.kf_kp_valid[kf].copy()
        if only_free:
            valid &= m.kf_mp_idx[kf] < 0
        return {
            "xy": jnp.asarray(m.kf_xy[kf]),
            "desc": jnp.asarray(m.kf_desc[kf]),
            "valid": jnp.asarray(valid),
            "level": jnp.asarray(m.kf_level[kf]),
            "depth": jnp.asarray(m.kf_depth[kf]),
            "inv_sigma2": jnp.asarray(
                (1.0 / self.cfg.orb.scale_factor ** (2.0 * m.kf_level[kf])).astype(
                    np.float32
                )
            ),
        }

    def create_new_points(self, kf_id: int, n_neighbors: int = 10) -> None:
        """Triangulate new far points against top covisible keyframes."""
        m = self.map
        neighbors = m.covisible_kfs(kf_id)[:n_neighbors]
        if len(neighbors) == 0:
            return
        kp1 = self._kf_kp_view(kf_id, only_free=True)
        T1 = jnp.asarray(m.kf_pose[kf_id])
        # dispatch all neighbor pairs, then ONE batched pull (a per-neighbor
        # sync costs a ~40 ms roundtrip on this backend)
        jobs = []
        for nb in neighbors:
            # baseline check (LocalMapping.cc:354-372): skip tiny baselines
            baseline = np.linalg.norm(
                m.kf_pose[kf_id][:3, 3] - m.kf_pose[nb][:3, 3]
            )
            if baseline < self.cfg.camera.baseline:
                continue
            kp2 = self._kf_kp_view(int(nb), only_free=True)
            out = tri.triangulate_pair(
                kp1, kp2, T1, jnp.asarray(m.kf_pose[nb]),
                self.K, jnp.float32(self.cfg.orb.scale_factor),
            )
            jobs.append((int(nb), out))
        if not jobs:
            return
        results = jax.device_get([o for _, o in jobs])
        claimed = np.zeros(len(m.kf_mp_idx[kf_id]), bool)
        for (nb, _), out in zip(jobs, results):
            ok = out["ok"] & ~claimed
            if not ok.any():
                continue
            pos = out["pos_w"][ok]
            idx1 = np.nonzero(ok)[0]
            idx2 = out["idx2"][ok]
            free = (~m.mp_valid).sum()
            n_new = min(len(idx1), int(free))
            if n_new == 0:
                break
            idx1, idx2, pos = idx1[:n_new], idx2[:n_new], pos[:n_new]
            cam_center = -m.kf_pose[kf_id][:3, :3].T @ m.kf_pose[kf_id][:3, 3]
            dvec = pos - cam_center
            dist = np.linalg.norm(dvec, axis=1).clip(1e-6)
            normal = dvec / dist[:, None]
            lvl = m.kf_level[kf_id][idx1]
            sf = self.cfg.orb.scale_factor
            max_d = dist * sf**lvl
            min_d = max_d / sf ** (self.cfg.orb.n_levels - 1)
            ids = m.add_points(
                pos, m.kf_desc[kf_id][idx1], normal, min_d, max_d, lvl, kf_id
            )
            m.kf_mp_idx[kf_id, idx1] = ids
            m.kf_mp_idx[nb, idx2] = ids
            for mp in ids:
                self.recent_points.append((int(mp), kf_id))
            claimed[idx1] = True  # now matched; not free anymore
        m.update_covisibility(kf_id)

    # ------------------------------------------------------------- fusion
    def fuse_neighbors(self, kf_id: int, n_neighbors: int = 10) -> None:
        """SearchInNeighbors: project this KF's points into covisible KFs,
        merge duplicates / add missing observations."""
        m = self.map
        neighbors = m.covisible_kfs(kf_id)[:n_neighbors]
        my_ids = m.kf_mp_idx[kf_id]
        my_ids = np.unique(my_ids[my_ids >= 0])
        if len(my_ids) == 0 or len(neighbors) == 0:
            return
        cap = self.cfg.caps.max_local_points
        my_ids = my_ids[:cap]
        pos = jnp.asarray(m.mp_pos[my_ids])
        desc = jnp.asarray(m.mp_desc[my_ids])
        valid = jnp.asarray(m.mp_valid[my_ids])
        jobs = []
        for nb in neighbors:
            feats = {
                "xy": jnp.asarray(m.kf_xy[nb]),
                "desc": jnp.asarray(m.kf_desc[nb]),
                "valid": jnp.asarray(m.kf_kp_valid[nb]),
                "level": jnp.asarray(m.kf_level[nb]),
            }
            jobs.append(
                (
                    int(nb),
                    tri.fuse_candidates(
                        pos, desc, valid, jnp.asarray(m.kf_pose[nb]), feats,
                        self.K,
                        jnp.float32(self.cfg.camera.height),
                        jnp.float32(self.cfg.camera.width),
                    ),
                )
            )
        if not jobs:
            return
        results = jax.device_get([o for _, o in jobs])
        for (nb, _), out in zip(jobs, results):
            ok = out["ok"]
            kp_idx = out["kp_idx"]
            if not ok.any():
                continue
            obs_counts = self._obs_counts()
            for i in np.nonzero(ok)[0]:
                mp = int(my_ids[i])
                kp = int(kp_idx[i])
                existing = int(m.kf_mp_idx[nb, kp])
                if existing < 0:
                    m.kf_mp_idx[nb, kp] = mp  # new observation
                elif existing != mp and m.mp_valid[existing] and m.mp_valid[mp]:
                    # duplicate: keep the landmark with more observations
                    lose, win = (
                        (mp, existing)
                        if obs_counts[existing] >= obs_counts[mp]
                        else (existing, mp)
                    )
                    m.kf_mp_idx[: m.n_kf][m.kf_mp_idx[: m.n_kf] == lose] = win
                    m.mp_valid[lose] = False
        m.update_covisibility(kf_id)

    def fuse_lines(self, kf_id: int, n_neighbors: int = 10) -> None:
        """Line duplicate fusion across the covisibility neighborhood
        (SearchInNeighbors' line half, LocalMapping.cc:524-622 +
        LSDmatcher::Fuse, LSDmatcher.cpp:259-383): map lines observed by
        this KF and its neighbors that are mutually close in space and
        descriptor are merged into the better-observed landmark."""
        m = self.map
        kfs = [kf_id] + [int(k) for k in m.covisible_kfs(kf_id)[:n_neighbors]]
        ids = np.unique(m.kf_ml_idx[kfs])
        ids = ids[(ids >= 0)]
        ids = ids[m.ml_valid[ids]]
        if len(ids) < 2:
            return
        sp, ep = m.ml_sp[ids], m.ml_ep[ids]
        d = ep - sp
        length = np.linalg.norm(d, axis=-1).clip(1e-6)
        u = d / length[:, None]
        mid = 0.5 * (sp + ep)
        desc = m.ml_desc[ids]
        dn = np.linalg.norm(desc, axis=-1).clip(1e-9)
        sim = (desc / dn[:, None]) @ (desc / dn[:, None]).T
        cos_dir = np.abs(u @ u.T)
        d_mid = np.linalg.norm(mid[:, None] - mid[None], axis=-1)
        lc = self.cfg.line
        dup = (
            (sim > lc.fuse_desc_sim)
            & (cos_dir > np.cos(np.radians(lc.fuse_ang_deg)))
            & (d_mid < lc.fuse_mid_m)  # meters
        )
        np.fill_diagonal(dup, False)
        obs = m.ml_n_obs[ids]
        for a, b in zip(*np.nonzero(np.triu(dup))):
            la, lb = int(ids[a]), int(ids[b])
            if not (m.ml_valid[la] and m.ml_valid[lb]):
                continue
            lose, win = (la, lb) if obs[b] >= obs[a] else (lb, la)
            m.kf_ml_idx[: m.n_kf][m.kf_ml_idx[: m.n_kf] == lose] = win
            m.ml_n_obs[win] += m.ml_n_obs[lose]
            m.ml_found[win] += m.ml_found[lose]
            m.ml_visible[win] += m.ml_visible[lose]
            m.ml_valid[lose] = False

    # ---------------------------------------------------- landmark refresh
    def refresh_point_landmarks(self, kf_id: int) -> None:
        """MapPoint lifecycle refinement on new observations:
        distinctive-descriptor refresh (min median Hamming over all
        observations, MapPoint::ComputeDistinctiveDescriptors) and
        UpdateNormalAndDepth (mean viewing ray + scale-band from the
        first-observing keyframe, MapPoint.cc)."""
        m = self.map
        mine = m.kf_mp_idx[kf_id]
        mps = np.unique(mine[mine >= 0])
        mps = mps[m.mp_valid[mps]]
        if len(mps) == 0:
            return
        # observation table (kf, kp) per map point
        obs_kf, obs_kp = np.nonzero(
            (m.kf_mp_idx[: m.n_kf] >= 0) & m.kf_valid[: m.n_kf, None]
        )
        obs_mp = m.kf_mp_idx[obs_kf, obs_kp]
        order = np.argsort(obs_mp, kind="stable")
        obs_kf, obs_kp, obs_mp = obs_kf[order], obs_kp[order], obs_mp[order]
        starts = np.searchsorted(obs_mp, mps)
        ends = np.searchsorted(obs_mp, mps, side="right")
        sf = self.cfg.orb.scale_factor
        n_levels = self.cfg.orb.n_levels

        # camera centers per keyframe
        Rt = m.kf_pose[: m.n_kf, :3, :3]
        tt = m.kf_pose[: m.n_kf, :3, 3]
        centers = -np.einsum("kij,kj->ki", Rt.transpose(0, 2, 1), tt)

        for p, s, e in zip(mps, starts, ends):
            if e - s < 2:
                continue
            kfs, kps = obs_kf[s:e], obs_kp[s:e]
            descs = m.kf_desc[kfs, kps]  # (n, 8) uint32
            x = descs[:, None, :] ^ descs[None, :, :]
            ham = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
            med = np.median(ham, axis=1)
            best = int(np.argmin(med))
            m.mp_desc[p] = descs[best]
            # UpdateNormalAndDepth
            rays = m.mp_pos[p][None] - centers[kfs]
            norms = np.linalg.norm(rays, axis=1).clip(1e-9)
            normal = (rays / norms[:, None]).mean(0)
            nn = np.linalg.norm(normal)
            if nn > 1e-6:
                m.mp_normal[p] = normal / nn
            ref = int(m.mp_first_kf[p])
            if 0 <= ref < m.n_kf and m.kf_valid[ref]:
                in_ref = np.nonzero(kfs == ref)[0]
                if len(in_ref):
                    dist_ref = float(
                        np.linalg.norm(m.mp_pos[p] - centers[ref])
                    )
                    lvl = int(m.kf_level[ref, kps[in_ref[0]]])
                    m.mp_max_dist[p] = dist_ref * sf**lvl
                    m.mp_min_dist[p] = m.mp_max_dist[p] / sf ** (n_levels - 1)

    # --------------------------------------------------------- KF culling
    def cull_keyframes(self, kf_id: int) -> None:
        """KeyFrameCulling (LocalMapping.cc:704-758), vectorized via a
        sorted observation table."""
        m = self.map
        close_th = self.cfg.th_depth_m
        # global observation table: (kf, kp, mp, level), sorted by mp
        obs_kf, obs_kp = np.nonzero(
            (m.kf_mp_idx[: m.n_kf] >= 0) & m.kf_valid[: m.n_kf, None]
        )
        if len(obs_kf) == 0:
            return
        obs_mp = m.kf_mp_idx[obs_kf, obs_kp]
        obs_lvl = m.kf_level[obs_kf, obs_kp]
        order = np.argsort(obs_mp, kind="stable")
        obs_kf, obs_mp, obs_lvl = obs_kf[order], obs_mp[order], obs_lvl[order]
        starts = np.searchsorted(obs_mp, np.arange(len(m.mp_valid)))
        ends = np.searchsorted(obs_mp, np.arange(len(m.mp_valid)), side="right")

        for kf in m.covisible_kfs(kf_id)[:20]:
            kf = int(kf)
            if kf == 0 or kf in m.kf_not_erase or not m.kf_valid[kf]:
                continue
            ids = m.kf_mp_idx[kf]
            kp_sel = (ids >= 0) & m.mp_valid[np.maximum(ids, 0)]
            depth = m.kf_depth[kf]
            kp_sel &= (depth > 0) & (depth < close_th)
            kps = np.nonzero(kp_sel)[0]
            total = len(kps)
            if total < 30:
                continue
            my_lvl = m.kf_level[kf]
            redundant = 0
            for kp in kps:
                mp = ids[kp]
                s, e = starts[mp], ends[mp]
                seg_kf = obs_kf[s:e]
                seg_lvl = obs_lvl[s:e]
                n_better = int(
                    ((seg_kf != kf) & (seg_lvl <= my_lvl[kp] + 1)).sum()
                )
                if n_better >= 3:
                    redundant += 1
            if redundant > 0.9 * total:
                self._erase_keyframe(kf)

    def _erase_keyframe(self, kf: int) -> None:
        # retire through the map so trajectory records re-anchor and the
        # slot becomes reusable (spanning-tree reattachment included)
        self.map.retire_keyframe(kf)
