"""Headless viewer — snapshot renderings of map + annotated frame.

The reference's Pangolin/OpenGL thread (Viewer.cc, MapDrawer.cc,
FrameDrawer.cc) assumes a desktop GL context; TPU hosts are headless, so
the equivalent surface here is snapshot-based: ``update()`` keeps the
latest tracking state (cheap), ``save_map_png``/``save_frame_png`` render
the same content the reference draws — map points, lines, plane clouds
colored per plane, keyframe positions and the covisibility graph, the
current camera, and the annotated camera image with keypoint overlays and
the status text (FrameDrawer.cc:125-160).
"""

from __future__ import annotations

import numpy as np


class Viewer:
    def __init__(self, cfg, slam_map, tracker, surfel_mapper=None):
        self.cfg = cfg
        self.map = slam_map
        self.tracker = tracker
        self.surfel_mapper = surfel_mapper
        self._frame = None
        self._kp = None

    def update(self) -> None:
        """Copy the latest tracking state (Viewer/FrameDrawer::Update)."""
        tr = self.tracker
        res = getattr(tr, "last_result", None)
        if res is not None:
            self._kp = None  # lazily pulled in save_frame_png
            self._res = res

    # ------------------------------------------------------------- renders
    def save_map_png(self, path: str) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        m = self.map
        fig = plt.figure(figsize=(9, 7))
        ax = fig.add_subplot(111, projection="3d")
        pts = m.mp_pos[m.mp_valid]
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=1, c="k", alpha=0.4)
        for j in np.nonzero(m.ml_valid)[0]:
            sp, ep = m.ml_sp[j], m.ml_ep[j]
            ax.plot(*zip(sp, ep), c="b", lw=1)
        for j in np.nonzero(m.pl_valid)[0]:
            cl = m.pl_pts[j, : m.pl_n_pts[j]]
            if len(cl):
                ax.scatter(cl[:, 0], cl[:, 1], cl[:, 2], s=2,
                           color=m.pl_color[j], alpha=0.6)
        # surfels (MapDrawer.cc:141-165 draws the surfel cloud shaded by
        # intensity): stable surfels from the drift-free mapper, rendered
        # as small gray-scaled dots (decimated for plot weight)
        if self.surfel_mapper is not None:
            try:
                surf = self.surfel_mapper.export_arrays()
            except ValueError:  # no surfels yet (empty concatenate)
                surf = None
            if surf is not None and len(surf["pos"]):
                sp = surf["pos"]
                si = surf["intensity"] / 255.0
                step = max(1, len(sp) // 4000)
                ax.scatter(
                    sp[::step, 0], sp[::step, 1], sp[::step, 2], s=1,
                    c=np.clip(si[::step], 0, 1), cmap="gray", alpha=0.3,
                )
        # keyframes + covisibility graph (MapDrawer.cc:166-243)
        kf_centers = []
        for i in range(m.n_kf):
            if not m.kf_valid[i]:
                continue
            T = m.kf_pose[i]
            c = -T[:3, :3].T @ T[:3, 3]
            kf_centers.append((i, c))
            ax.scatter(*c, marker="s", c="g", s=14)
        for i, ci in kf_centers:
            for j, cj in kf_centers:
                if j > i and m.covis[i, j] >= 15:
                    ax.plot(*zip(ci, cj), c="g", lw=0.3, alpha=0.5)
        # current camera
        T = self.tracker.T_cw
        c = -T[:3, :3].T @ T[:3, 3]
        ax.scatter(*c, marker="^", c="r", s=40)
        ax.set_title(
            f"KFs: {int(m.kf_valid.sum())}  MPs: {int(m.mp_valid.sum())} "
            f"MLs: {int(m.ml_valid.sum())}  Planes: {int(m.pl_valid.sum())}"
        )
        fig.savefig(path, dpi=110)
        plt.close(fig)

    def save_frame_png(self, path: str, gray: np.ndarray | None = None) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        tr = self.tracker
        res = getattr(tr, "last_result", None)
        fig, ax = plt.subplots(figsize=(8, 6))
        if gray is not None:
            ax.imshow(gray, cmap="gray", vmin=0, vmax=255)
        if res is not None:
            feats = {k: np.asarray(v) for k, v in res["feats"].items()} if isinstance(
                res, dict
            ) else None
            if feats is not None:
                v = feats["valid"]
                matched = tr.last_mp_idx >= 0
                ax.scatter(
                    feats["xy"][v & ~matched, 0], feats["xy"][v & ~matched, 1],
                    s=4, c="b", marker="o", label="keypoints",
                )
                ax.scatter(
                    feats["xy"][v & matched, 0], feats["xy"][v & matched, 1],
                    s=6, c="lime", marker="o", label="tracked",
                )
        state = tr.state
        ax.set_title(
            f"{state} | KFs {int(self.map.kf_valid.sum())} "
            f"MPs {int(self.map.mp_valid.sum())} inliers {tr.n_inliers}"
        )
        ax.legend(loc="lower right", fontsize=7)
        fig.savefig(path, dpi=110)
        plt.close(fig)
