"""System facade — the public API (reference System.h:58-88).

Mirrors the reference surface: construct from a settings file (or
SlamConfig), feed RGB-D pairs through ``track``, toggle
localization-only mode, reset, shutdown, save TUM trajectories and the
surfel PLY.  The reference's four threads (System.cc:90-107) are replaced
by synchronous host orchestration of jitted device programs — at TPU
speeds the mapping backend fits in the frame budget, and XLA async
dispatch overlaps device work with host bookkeeping.
"""

from __future__ import annotations

import numpy as np

from manhattanslam_tpu.config import SlamConfig, load_config
from manhattanslam_tpu.datasets.tum import to_gray
from manhattanslam_tpu.frontend.tracking import Tracker
from manhattanslam_tpu.io import trajectory as traj_io
from manhattanslam_tpu.slam_map import SlamMap


class System:
    def __init__(
        self,
        settings: str | SlamConfig,
        use_viewer: bool = False,
        enable_planes: bool = True,
        enable_lines: bool = True,
        enable_surfels: bool = True,
    ):
        self.cfg = (
            settings if isinstance(settings, SlamConfig) else load_config(settings)
        )
        self.map = SlamMap(self.cfg)
        self.tracker = Tracker(self.cfg, self.map)
        self.viewer = None

        self.local_mapper = None
        self.surfel_mapper = None
        try:
            from manhattanslam_tpu.mapping.local_mapping import LocalMapper

            self.local_mapper = LocalMapper(self.cfg, self.map)
        except ImportError:
            pass
        if enable_planes:
            try:
                from manhattanslam_tpu.frontend.planes_module import PlaneModule

                self.tracker.plane_module = PlaneModule(self.cfg, self.map)
            except ImportError:
                pass
        if enable_lines:
            try:
                from manhattanslam_tpu.frontend.lines_module import LineModule

                self.tracker.line_module = LineModule(self.cfg, self.map)
            except ImportError:
                pass
        try:
            from manhattanslam_tpu.reloc.relocalizer import Relocalizer

            self.tracker.reloc_module = Relocalizer(self.cfg, self.map)
        except ImportError:
            pass
        if enable_surfels:
            try:
                from manhattanslam_tpu.mapping.surfel_mapping import SurfelMapper

                self.surfel_mapper = SurfelMapper(self.cfg, self.map)
            except ImportError:
                pass

        self.tracker.on_keyframe = self._on_keyframe
        if use_viewer:
            try:
                from manhattanslam_tpu.viewer import Viewer

                self.viewer = Viewer(self.cfg, self.map, self.tracker)
            except ImportError:
                pass
        self._last_gray = None
        self._last_depth = None

    # ------------------------------------------------------------------ API
    def track(self, rgb: np.ndarray, depth: np.ndarray, timestamp: float):
        """Process one frame. rgb: (H,W,3) uint8 or (H,W) gray; depth: (H,W)
        float32 meters.  Returns Tcw (4,4) or None if tracking failed.

        Equivalent of System::Track (System.cc:115-149).
        """
        gray = (
            rgb.astype(np.float32)
            if rgb.ndim == 2
            else to_gray(rgb, self.cfg.camera.rgb)
        )
        self._last_gray, self._last_depth = gray, depth
        T = self.tracker.track(timestamp, gray, depth)
        if self.viewer is not None:
            self.viewer.update()
        return T

    # alias matching the reference naming
    Track = track

    def activate_localization_mode(self) -> None:
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self) -> None:
        self.tracker.only_tracking = False

    def reset(self) -> None:
        """System reset (Tracking::Reset, Tracking.cc:2057-2087)."""
        self.map = SlamMap(self.cfg)
        tracker = Tracker(self.cfg, self.map)
        tracker.plane_module = self.tracker.plane_module
        tracker.line_module = self.tracker.line_module
        tracker.reloc_module = self.tracker.reloc_module
        if tracker.plane_module is not None:
            tracker.plane_module.map = self.map
        if tracker.reloc_module is not None:
            tracker.reloc_module.reset(self.map)
        self.tracker = tracker
        self.tracker.on_keyframe = self._on_keyframe
        if self.local_mapper is not None:
            self.local_mapper.map = self.map
        if self.surfel_mapper is not None:
            self.surfel_mapper.reset(self.map)

    def shutdown(self) -> None:
        """Flush mappers (System::Shutdown, System.cc:167-186)."""
        if self.surfel_mapper is not None:
            self.surfel_mapper.finish()

    def save_trajectory_tum(self, path: str) -> None:
        traj_io.save_trajectory_tum(path, self.tracker.trajectory_rows())

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        traj_io.save_keyframe_trajectory_tum(path, self.tracker.keyframe_rows())

    def save_surfels(self, path: str) -> None:
        if self.surfel_mapper is not None:
            self.surfel_mapper.save_ply(path)

    # ------------------------------------------------------------ internals
    def _on_keyframe(self, kf_id: int, feats, feats_np: dict) -> None:
        if self.local_mapper is not None:
            self.local_mapper.process_keyframe(kf_id)
        if self.tracker.reloc_module is not None:
            self.tracker.reloc_module.add_keyframe(kf_id)
        if self.surfel_mapper is not None and self._last_gray is not None:
            self.surfel_mapper.insert_keyframe(
                kf_id, self._last_gray, self._last_depth,
                self.tracker.plane_module,
            )
