"""Dense surfel mapping (reference SurfelMapping.{h,cpp} + SurfelFusion).

Host orchestration of the device kernels in ops/surfels.py, run per
keyframe (the reference's dedicated thread consumes a keyframe tuple
queue, SurfelMapping.cpp:137-146):

- maintains the pose-graph adjacency and the BFS drift-free window of 10
  poses (:29, :326-351); surfels attached to poses sliding out of the
  window become inactive (no longer fused into, :194-304)
- final export merges stable local surfels (>= 5 updates), inactive
  surfels, and the MapPlane clouds flattened with the plane normal
  (:62-135) — written as a tinyply-schema PLY.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import SlamConfig
from manhattanslam_tpu.io.ply import save_surfel_ply
from manhattanslam_tpu.ops import surfels as surf_ops
from manhattanslam_tpu.slam_map import SlamMap

DRIFT_FREE_POSES = 10
STABLE_UPDATES = 5


import jax as _jax


@_jax.jit
def _window_active(attach_kf, valid, lut):
    """active[i] = valid[i] and attach_kf[i] in the drift-free window."""
    return valid & lut[jnp.clip(attach_kf, 0, lut.shape[0] - 1)]


class SurfelMapper:
    def __init__(self, cfg: SlamConfig, slam_map: SlamMap):
        self.cfg = cfg
        self.map = slam_map
        self.K = jnp.asarray(cfg.camera.K)
        cap = cfg.surfel.max_surfels
        self.surfels = {
            "pos": jnp.zeros((cap, 3)),
            "normal": jnp.zeros((cap, 3)),
            "color": jnp.zeros(cap),
            "radius": jnp.zeros(cap),
            "weight": jnp.zeros(cap),
            "n_updates": jnp.zeros(cap, jnp.int32),
            "last_kf": jnp.zeros(cap, jnp.int32),
            "attach_kf": jnp.zeros(cap, jnp.int32),
            "valid": jnp.zeros(cap, bool),
            "active": jnp.zeros(cap, bool),
        }
        self.pose_links: dict[int, set[int]] = {}
        self.n_keyframes = 0
        self._last_inserted: int | None = None

    def reset(self, slam_map: SlamMap) -> None:
        self.__init__(self.cfg, slam_map)

    # ------------------------------------------------------------------ API
    def insert_keyframe(
        self, kf_id: int, gray: np.ndarray, depth: np.ndarray, plane_module=None,
        plane_membership=None, ref_kf: int | None = None,
    ) -> None:
        m = self.map
        T_cw = m.kf_pose[kf_id].astype(np.float32)
        T_wc = np.linalg.inv(T_cw)

        # pose-graph link to the REFERENCE pose (SurfelMapping.cpp:162-168:
        # the new pose links to the tracker's reference keyframe, not the
        # chronological predecessor) — after a relocalization the link
        # reaches back into the revisited region, so the BFS drift-free
        # window reactivates the surfels there
        self.pose_links.setdefault(kf_id, set())
        if self.n_keyframes > 0:
            link = (
                ref_kf
                if ref_kf is not None and ref_kf != kf_id
                and ref_kf in self.pose_links
                else self._last_inserted
            )
            if link is not None and link != kf_id:
                self.pose_links[kf_id].add(link)
                self.pose_links.setdefault(link, set()).add(kf_id)
        self.n_keyframes += 1
        self._last_inserted = kf_id

        # drift-free window: BFS <=10 hops from the current pose.  The
        # membership test runs ON DEVICE via a keyframe-id lookup table
        # (256-byte upload) — pulling attach_kf here cost a full in-order
        # queue drain (~250 ms behind in-flight tracking chunks) per
        # keyframe event.
        window = self._bfs_window(kf_id)
        lut = np.zeros(self.cfg.caps.max_keyframes, bool)
        lut[np.fromiter(window, int)] = True
        self.surfels["active"] = _window_active(
            self.surfels["attach_kf"], self.surfels["valid"],
            jnp.asarray(lut),
        )

        # plane-pixel exclusion mask at full resolution — built on DEVICE
        # (the membership usually IS a device array from the fused tracking
        # step; pulling it to host cost a full queue drain per keyframe)
        H, W = gray.shape
        memb = plane_membership
        if memb is None and plane_module is not None and plane_module.frame_planes is not None:
            memb = plane_module.frame_planes["membership"]  # half-res
        if memb is not None:
            up = jnp.repeat(jnp.repeat(jnp.asarray(memb) >= 0, 2, 0), 2, 1)
            uh, uw = min(up.shape[0], H), min(up.shape[1], W)
            plane_mask = (
                jnp.zeros((H, W), bool).at[:uh, :uw].set(up[:uh, :uw])
            )
        else:
            plane_mask = jnp.zeros((H, W), bool)

        sp = surf_ops.superpixels(
            jnp.asarray(gray), jnp.asarray(depth), jnp.asarray(plane_mask), self.K
        )
        self.surfels, fused = surf_ops.fuse_surfels(
            self.surfels, sp, jnp.asarray(T_cw), jnp.asarray(T_wc), self.K,
            jnp.int32(kf_id), H, W,
        )
        self.surfels = surf_ops.add_new_surfels(
            self.surfels, sp, fused, jnp.asarray(T_wc), jnp.int32(kf_id)
        )

    def _bfs_window(self, start: int) -> set[int]:
        seen = {start}
        frontier = [start]
        for _ in range(DRIFT_FREE_POSES):
            nxt = []
            for p in frontier:
                for q in self.pose_links.get(p, ()):
                    if q not in seen:
                        seen.add(q)
                        nxt.append(q)
            frontier = nxt
        return seen

    # --------------------------------------------------------------- export
    def finish(self) -> None:
        pass  # synchronous design: nothing queued

    def export_arrays(self) -> dict:
        """Stable surfels + map-plane clouds flattened onto their planes
        (System.cc:296-382 merge semantics)."""
        s = {k: np.asarray(v) for k, v in self.surfels.items()}
        keep = s["valid"] & (
            (s["n_updates"] >= STABLE_UPDATES) | ~s["active"]
        )
        # low-weight never-confirmed surfels are dropped like the
        # reference's unstable local surfels
        keep &= s["n_updates"] >= 1
        pos = [s["pos"][keep]]
        nrm = [s["normal"][keep]]
        col = [s["color"][keep]]
        qual = [s["weight"][keep]]
        rad = [s["radius"][keep]]

        m = self.map
        for j in np.nonzero(m.pl_valid)[0]:
            cloud = m.pl_pts[j, : m.pl_n_pts[j]]
            if len(cloud) == 0:
                continue
            c = m.pl_coeffs[j]
            n = c[:3] / np.linalg.norm(c[:3])
            # flatten points onto the plane (reference projects cloud points
            # along the plane normal, System.cc:340-360)
            d = cloud @ n + c[3]
            flat = cloud - d[:, None] * n[None]
            pos.append(flat.astype(np.float32))
            nrm.append(np.tile(n.astype(np.float32), (len(flat), 1)))
            col.append(np.full(len(flat), 128.0, np.float32))
            qual.append(np.ones(len(flat), np.float32))
            rad.append(np.full(len(flat), 0.1, np.float32))

        return {
            "pos": np.concatenate(pos),
            "normal": np.concatenate(nrm),
            "intensity": np.concatenate(col),
            "quality": np.concatenate(qual),
            "radius": np.concatenate(rad),
        }

    def save_ply(self, path: str) -> None:
        a = self.export_arrays()
        save_surfel_ply(
            path, a["pos"], a["normal"], a["intensity"], a["quality"], a["radius"]
        )
