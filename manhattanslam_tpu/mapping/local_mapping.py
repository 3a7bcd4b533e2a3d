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


def kf_feats_one(m, kf: int) -> dict:
    """Single-keyframe keypoint feature view for fuse_candidates."""
    return {
        "xy": jnp.asarray(m.kf_xy[kf]),
        "desc": jnp.asarray(m.kf_desc[kf]),
        "valid": jnp.asarray(m.kf_kp_valid[kf]),
        "level": jnp.asarray(m.kf_level[kf]),
    }


class LocalMapper:
    def __init__(self, cfg: SlamConfig, slam_map: SlamMap):
        self.cfg = cfg
        self.map = slam_map
        self.K = jnp.asarray(cfg.camera.K)
        # recently added points pending the culling probation window
        self.recent_points: list[tuple[int, int]] = []  # (mp_id, birth_kf)
        from collections import defaultdict

        self.perf = defaultdict(float)  # per-stage host seconds

    # ------------------------------------------------------------------ API
    def warm_programs(self) -> None:
        """Compile the triangulation / fusion device programs ahead of the
        first real keyframe event (all fixed-shape: one compile each), so
        a timed benchmark region never pays a mid-loop XLA compile."""
        m = self.map
        if m.n_kf == 0:
            return
        kp = self._kf_kp_view(0, only_free=True)
        T = jnp.asarray(m.kf_pose[0])
        sf = jnp.float32(self.cfg.orb.scale_factor)
        kp2s = self._kf_kp_stack([0], self.N_TRI_NEIGHBORS, only_free=True)
        T2s = jnp.asarray(
            np.broadcast_to(
                m.kf_pose[0], (self.N_TRI_NEIGHBORS, 4, 4)
            ).copy()
        )
        out = tri.triangulate_pairs(kp, kp2s, T, T2s, self.K, sf)
        pos, desc, valid, _ = self._padded_bank(np.arange(1))
        h = jnp.float32(self.cfg.camera.height)
        w = jnp.float32(self.cfg.camera.width)
        N_TG = 24
        sl = np.zeros(N_TG, np.int64)
        feats_s = {
            "xy": jnp.asarray(m.kf_xy[sl]),
            "desc": jnp.asarray(m.kf_desc[sl]),
            "valid": jnp.asarray(m.kf_kp_valid[sl]),
            "level": jnp.asarray(m.kf_level[sl]),
        }
        out1 = tri.fuse_candidates_batch(
            pos, desc, valid, jnp.asarray(m.kf_pose[sl]), feats_s,
            self.K, h, w,
        )
        out2 = tri.fuse_candidates(
            pos, desc, valid, T, kf_feats_one(m, 0), self.K, h, w,
        )
        jax.device_get((out["ok"], out1["ok"], out2["ok"]))

    def process_keyframe(self, kf_id: int) -> None:
        import time as _time

        m = self.map
        born = m.kf_mp_idx[kf_id]
        for mp in born[born >= 0]:
            if m.mp_first_kf[mp] == kf_id:
                self.recent_points.append((int(mp), kf_id))

        for stage in (
            self.cull_map_points,
            self.create_and_fuse,
            self.fuse_lines,
            self.refresh_point_landmarks,
            self.cull_keyframes,
            self.cull_map_planes,
            self.cull_map_lines,
        ):
            t0 = _time.perf_counter()
            stage(kf_id)
            self.perf[stage.__name__] += _time.perf_counter() - t0

    def create_and_fuse(self, kf_id: int) -> None:
        """CreateNewMapPoints + SearchInNeighbors with ONE device sync:
        both programs dispatch back-to-back, then one blocking pull pays
        the in-order-queue drain once instead of twice per keyframe event.
        The fusion banks are built from the PRE-triangulation tables, so
        this keyframe's brand-new points first fuse at the next keyframe —
        one event later than the reference's ordering
        (LocalMapping.cc:303-622), at identical steady-state coverage."""
        tri_job = self._tri_dispatch(kf_id)
        fuse_job = self._fuse_dispatch(kf_id)
        pulled = jax.device_get(
            (
                tri_job[0] if tri_job is not None else None,
                (fuse_job[0], fuse_job[1]) if fuse_job is not None else None,
            )
        )
        if tri_job is not None:
            self._tri_apply(kf_id, pulled[0], tri_job[1])
        if fuse_job is not None:
            self._fuse_apply(kf_id, pulled[1][0], pulled[1][1], fuse_job[2])

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

    def _kf_kp_stack(self, kfs: list[int], n_pad: int, only_free: bool):
        """Stacked keypoint views of `kfs`, padded to n_pad rows (padding
        rows have valid=False so every device gate rejects them)."""
        m = self.map
        NKP = m.kf_xy.shape[1]
        sl = np.zeros(n_pad, np.int64)
        sl[: len(kfs)] = kfs
        valid = m.kf_kp_valid[sl].copy()
        if only_free:
            valid &= m.kf_mp_idx[sl] < 0
        valid[len(kfs):] = False
        lvl = m.kf_level[sl]
        return {
            "xy": jnp.asarray(m.kf_xy[sl]),
            "desc": jnp.asarray(m.kf_desc[sl]),
            "valid": jnp.asarray(valid),
            "level": jnp.asarray(lvl),
            "depth": jnp.asarray(m.kf_depth[sl]),
            "inv_sigma2": jnp.asarray(
                (1.0 / self.cfg.orb.scale_factor ** (2.0 * lvl)).astype(
                    np.float32
                )
            ),
        }

    N_TRI_NEIGHBORS = 10

    def create_new_points(self, kf_id: int, n_neighbors: int = 10) -> None:
        """Triangulate new far points against top covisible keyframes —
        ONE vmapped device call over a padded neighbor stack."""
        job = self._tri_dispatch(kf_id, n_neighbors)
        if job is None:
            return
        outs_d, neighbors = job
        self._tri_apply(kf_id, jax.device_get(outs_d), neighbors)

    def _tri_dispatch(self, kf_id: int, n_neighbors: int = 10):
        m = self.map
        neighbors = m.covisible_kfs(kf_id)[:n_neighbors]
        # baseline check (LocalMapping.cc:354-372): skip tiny baselines
        neighbors = [
            int(nb) for nb in neighbors
            if np.linalg.norm(m.kf_pose[kf_id][:3, 3] - m.kf_pose[nb][:3, 3])
            >= self.cfg.camera.baseline
        ][: self.N_TRI_NEIGHBORS]
        if not neighbors:
            return None
        kp1 = self._kf_kp_view(kf_id, only_free=True)
        T1 = jnp.asarray(m.kf_pose[kf_id])
        kp2s = self._kf_kp_stack(neighbors, self.N_TRI_NEIGHBORS,
                                 only_free=True)
        sl = np.zeros(self.N_TRI_NEIGHBORS, np.int64)
        sl[: len(neighbors)] = neighbors
        outs_d = tri.triangulate_pairs(
            kp1, kp2s, T1, jnp.asarray(m.kf_pose[sl]),
            self.K, jnp.float32(self.cfg.orb.scale_factor),
        )
        return outs_d, neighbors

    def _tri_apply(self, kf_id: int, outs, neighbors) -> None:
        m = self.map
        claimed = np.zeros(len(m.kf_mp_idx[kf_id]), bool)
        for j, nb in enumerate(neighbors):
            out = {k: v[j] for k, v in outs.items()}
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
    def _padded_bank(self, ids: np.ndarray):
        """Fixed-capacity (pos, desc, valid) bank for fuse_candidates —
        the jitted program must see ONE shape regardless of how many
        landmarks ride this call (a variable-length bank retraces)."""
        m = self.map
        cap = self.cfg.caps.max_local_points
        ids = ids[:cap]
        n = len(ids)
        pos = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        valid = np.zeros(cap, bool)
        pos[:n] = m.mp_pos[ids]
        desc[:n] = m.mp_desc[ids]
        valid[:n] = m.mp_valid[ids]
        padded = np.full(cap, -1, np.int64)
        padded[:n] = ids
        return jnp.asarray(pos), jnp.asarray(desc), jnp.asarray(valid), padded

    def fuse_neighbors(
        self, kf_id: int, n_neighbors: int = 10, n_second: int = 5
    ) -> None:
        """SearchInNeighbors (LocalMapping.cc:524-622): two-hop covisibility
        targets (first-order neighbors plus n_second of each neighbor's
        neighbors, :536-542), fused in BOTH directions — this KF's points
        into every target (:546-560) AND the union of the targets' points
        into this KF (:562-601)."""
        job = self._fuse_dispatch(kf_id, n_neighbors, n_second)
        if job is None:
            return
        outs1_d, out2_d, jobs = job
        outs1, out2 = jax.device_get((outs1_d, out2_d))
        self._fuse_apply(kf_id, outs1, out2, jobs)

    def _fuse_dispatch(
        self, kf_id: int, n_neighbors: int = 10, n_second: int = 5
    ):
        m = self.map
        first = [int(k) for k in m.covisible_kfs(kf_id)[:n_neighbors]]
        targets = list(first)
        seen = {kf_id, *targets}
        for nb in first:
            for nb2 in m.covisible_kfs(nb)[:n_second]:
                nb2 = int(nb2)
                if nb2 not in seen:
                    targets.append(nb2)
                    seen.add(nb2)
        my_ids = m.kf_mp_idx[kf_id]
        my_ids = np.unique(my_ids[my_ids >= 0])
        my_ids = my_ids[m.mp_valid[my_ids]]
        if len(my_ids) == 0 or len(targets) == 0:
            return None

        N_TG = 24  # fixed target-stack size (one compiled program)
        targets = targets[:N_TG]
        h = jnp.float32(self.cfg.camera.height)
        w = jnp.float32(self.cfg.camera.width)
        # direction 1: this KF's landmarks into every target keyframe —
        # ONE vmapped dispatch over the padded target stack (the previous
        # per-target dispatch/pull paid ~3 tunnel-latency roundtrips per
        # target: up to 60 x 30 ms per keyframe event)
        pos, desc, valid, my_pad = self._padded_bank(my_ids)
        sl = np.zeros(N_TG, np.int64)
        sl[: len(targets)] = targets
        feats_s = {
            "xy": jnp.asarray(m.kf_xy[sl]),
            "desc": jnp.asarray(m.kf_desc[sl]),
            "valid": jnp.asarray(
                m.kf_kp_valid[sl]
                & (np.arange(N_TG) < len(targets))[:, None]
            ),
            "level": jnp.asarray(m.kf_level[sl]),
        }
        outs1_d = tri.fuse_candidates_batch(
            pos, desc, valid, jnp.asarray(m.kf_pose[sl]), feats_s,
            self.K, h, w,
        )
        # direction 2: the union of the targets' landmarks into this KF
        jobs = [(nb, my_pad, j) for j, nb in enumerate(targets)]
        out2_d = None
        tgt_ids = m.kf_mp_idx[targets]
        tgt_ids = np.unique(tgt_ids[tgt_ids >= 0])
        tgt_ids = tgt_ids[m.mp_valid[tgt_ids]]
        tgt_ids = np.setdiff1d(tgt_ids, my_ids, assume_unique=True)
        if len(tgt_ids):
            pos2, desc2, valid2, tgt_pad = self._padded_bank(tgt_ids)
            out2_d = tri.fuse_candidates(
                pos2, desc2, valid2, jnp.asarray(m.kf_pose[kf_id]),
                kf_feats_one(m, kf_id), self.K, h, w,
            )
            jobs.append((kf_id, tgt_pad, None))
        return outs1_d, out2_d, jobs

    def _fuse_apply(self, kf_id: int, outs1, out2, jobs) -> None:
        m = self.map
        results = [
            ({k: v[j] for k, v in outs1.items()} if j is not None else out2)
            for _, _, j in jobs
        ]
        obs_counts = self._obs_counts()
        for (nb, bank_ids, _), out in zip(jobs, results):
            ok = out["ok"] & (bank_ids >= 0)
            kp_idx = out["kp_idx"]
            if not ok.any():
                continue
            for i in np.nonzero(ok)[0]:
                mp = int(bank_ids[i])
                kp = int(kp_idx[i])
                if not m.mp_valid[mp]:
                    continue
                existing = int(m.kf_mp_idx[nb, kp])
                if existing < 0:
                    m.kf_mp_idx[nb, kp] = mp  # new observation
                    obs_counts[mp] += 1
                elif existing != mp and m.mp_valid[existing]:
                    # duplicate: keep the landmark with more observations
                    lose, win = (
                        (mp, existing)
                        if obs_counts[existing] >= obs_counts[mp]
                        else (existing, mp)
                    )
                    tbl = m.kf_mp_idx[: m.n_kf]
                    tbl[tbl == lose] = win
                    obs_counts[win] += obs_counts[lose]
                    obs_counts[lose] = 0
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
        # observation table (kf, kp) restricted to this KF's landmarks
        obs_kf, obs_kp = np.nonzero(
            (m.kf_mp_idx[: m.n_kf] >= 0) & m.kf_valid[: m.n_kf, None]
        )
        obs_mp = m.kf_mp_idx[obs_kf, obs_kp]
        keep = np.isin(obs_mp, mps)
        obs_kf, obs_kp, obs_mp = obs_kf[keep], obs_kp[keep], obs_mp[keep]
        order = np.argsort(obs_mp, kind="stable")
        obs_kf, obs_kp, obs_mp = obs_kf[order], obs_kp[order], obs_mp[order]
        uniq, starts, counts = np.unique(
            obs_mp, return_index=True, return_counts=True
        )
        sel = counts >= 2
        uniq, starts, counts = uniq[sel], starts[sel], counts[sel]
        if len(uniq) == 0:
            return
        # padded (n_pts, MAXO) observation table — everything below is one
        # batched numpy pass (a per-point Python loop here cost seconds per
        # keyframe event at n_kf~70)
        MAXO = 32
        cnt = np.minimum(counts, MAXO)
        tab = np.minimum(
            starts[:, None] + np.arange(MAXO)[None], len(obs_mp) - 1
        )
        valid_o = np.arange(MAXO)[None] < cnt[:, None]  # (n, MAXO)
        kfs = obs_kf[tab]
        kps = obs_kp[tab]

        # distinctive descriptor: min median pairwise Hamming
        # (MapPoint::ComputeDistinctiveDescriptors)
        d64 = (
            np.ascontiguousarray(m.kf_desc[kfs, kps])
            .view(np.uint64)
            .reshape(len(uniq), MAXO, 4)
        )
        ham = np.bitwise_count(d64[:, :, None, :] ^ d64[:, None, :, :]).sum(
            -1, dtype=np.int32
        )  # (n, MAXO, MAXO)
        ham = np.where(valid_o[:, None, :], ham, np.int32(10**6))
        ham.sort(axis=-1)
        # median of the cnt valid distances: sorted[(cnt-1)//2] (the
        # reference's vDists[0.5*(N-1)])
        med_idx = (cnt[:, None, None] - 1) // 2
        med = np.take_along_axis(
            ham, np.broadcast_to(med_idx, ham.shape[:2] + (1,)), axis=-1
        )[..., 0]
        med = np.where(valid_o, med, np.int32(10**6))
        best = np.argmin(med, axis=1)
        rows = np.arange(len(uniq))
        m.mp_desc[uniq] = m.kf_desc[kfs[rows, best], kps[rows, best]]

        # UpdateNormalAndDepth: mean viewing ray over observations + scale
        # band anchored at the first-observing keyframe (MapPoint.cc)
        Rt = m.kf_pose[: m.n_kf, :3, :3]
        tt = m.kf_pose[: m.n_kf, :3, 3]
        centers = -np.einsum("kij,kj->ki", Rt.transpose(0, 2, 1), tt)
        rays = m.mp_pos[uniq][:, None, :] - centers[kfs]  # (n, MAXO, 3)
        rays /= np.linalg.norm(rays, axis=-1, keepdims=True).clip(1e-9)
        normal = (rays * valid_o[..., None]).sum(1) / cnt[:, None]
        nn = np.linalg.norm(normal, axis=-1)
        ok_n = nn > 1e-6
        m.mp_normal[uniq[ok_n]] = (
            normal[ok_n] / nn[ok_n, None]
        ).astype(np.float32)

        sf = self.cfg.orb.scale_factor
        n_levels = self.cfg.orb.n_levels
        ref = m.mp_first_kf[uniq]
        ref_ok = (ref >= 0) & (ref < m.n_kf) & m.kf_valid[np.maximum(ref, 0)]
        in_ref = (kfs == ref[:, None]) & valid_o
        has_ref = in_ref.any(axis=1) & ref_ok
        if has_ref.any():
            first_kp = kps[
                np.arange(len(uniq)), np.argmax(in_ref, axis=1)
            ]
            dist_ref = np.linalg.norm(
                m.mp_pos[uniq] - centers[np.maximum(ref, 0)], axis=-1
            )
            lvl = m.kf_level[np.maximum(ref, 0), first_kp]
            max_d = (dist_ref * sf**lvl).astype(np.float32)
            sel = has_ref
            m.mp_max_dist[uniq[sel]] = max_d[sel]
            m.mp_min_dist[uniq[sel]] = max_d[sel] / sf ** (n_levels - 1)

    # --------------------------------------------------------- KF culling
    def cull_keyframes(self, kf_id: int) -> None:
        """KeyFrameCulling (LocalMapping.cc:704-758), vectorized via a
        sorted observation table."""
        m = self.map
        close_th = self.cfg.th_depth_m
        n_levels = self.cfg.orb.n_levels
        # per-(map point, level) observation histogram, cumulative over
        # level: cum[mp, l] = #observations at octave <= l.  Replaces the
        # per-keypoint Python loop (seconds per event at n_kf~70) with one
        # batched table build + O(kps) gathers per candidate.
        obs_kf, obs_kp = np.nonzero(
            (m.kf_mp_idx[: m.n_kf] >= 0) & m.kf_valid[: m.n_kf, None]
        )
        if len(obs_kf) == 0:
            return
        obs_mp = m.kf_mp_idx[obs_kf, obs_kp]
        obs_lvl = np.minimum(m.kf_level[obs_kf, obs_kp], n_levels - 1)
        hist = np.zeros((len(m.mp_valid), n_levels), np.int32)
        np.add.at(hist, (obs_mp, obs_lvl), 1)
        cum = hist.cumsum(axis=1)

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
            mp = ids[kps]
            lvl_cap = np.minimum(m.kf_level[kf, kps] + 1, n_levels - 1)
            # own observation is at level <= lvl_cap by construction
            n_better = cum[mp, lvl_cap] - 1
            redundant = int((n_better >= 3).sum())
            if redundant > 0.9 * total:
                # keep the histogram consistent for later candidates
                e_kp = np.nonzero(m.kf_mp_idx[kf] >= 0)[0]
                e_mp = m.kf_mp_idx[kf, e_kp]
                e_lvl = np.minimum(m.kf_level[kf, e_kp], n_levels - 1)
                np.add.at(hist, (e_mp, e_lvl), -1)
                cum = hist.cumsum(axis=1)
                self._erase_keyframe(kf)

    def _erase_keyframe(self, kf: int) -> None:
        # retire through the map so trajectory records re-anchor and the
        # slot becomes reusable (spanning-tree reattachment included)
        self.map.retire_keyframe(kf)
