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
        fast: bool = False,
        pipeline: bool = False,
        chunk: int = 1,
    ):
        """fast=True uses the fused single-jit device tracker
        (frontend/device_tracker.py): one host<->device roundtrip per
        frame, with enable_planes/enable_lines compiled into the step.
        fast=False uses the modular per-stage tracker
        (frontend/tracking.py) with per-subsystem module toggles.
        pipeline=True additionally overlaps device compute with the summary
        pull (one-frame result latency; fast mode only).  chunk=C scans C
        frames per device dispatch (one upload + one pull per chunk;
        keyframes at chunk boundaries; fast mode only).
        """
        self.cfg = (
            settings if isinstance(settings, SlamConfig) else load_config(settings)
        )
        self.map = SlamMap(self.cfg)
        self.fast = fast
        self.pipeline = pipeline
        self.chunk = chunk
        self.enable_planes = enable_planes
        self.enable_lines = enable_lines
        if fast:
            from manhattanslam_tpu.frontend.fast_tracking import FastTracker

            self.tracker = FastTracker(
                self.cfg, self.map, pipeline=pipeline, chunk=chunk,
                enable_planes=enable_planes, enable_lines=enable_lines,
            )
            enable_planes = enable_lines = False  # fused into the step
        else:
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

                self.viewer = Viewer(
                    self.cfg, self.map, self.tracker, self.surfel_mapper
                )
            except ImportError:
                pass
        self._last_gray = None
        self._last_depth = None
        self._prev_gray = None
        self._prev_depth = None

    # ------------------------------------------------------------------ API
    def track(self, rgb: np.ndarray, depth: np.ndarray, timestamp: float):
        """Process one frame. rgb: (H,W,3) uint8 or (H,W) gray; depth: (H,W)
        float32 meters.  Returns Tcw (4,4) or None if tracking failed.

        Equivalent of System::Track (System.cc:115-149).
        """
        expected = (self.cfg.camera.height, self.cfg.camera.width)
        if rgb.shape[:2] != expected or depth.shape[:2] != expected:
            raise ValueError(
                f"frame shape mismatch: rgb {rgb.shape[:2]}, depth "
                f"{depth.shape[:2]}, settings expect {expected}"
            )
        gray = (
            rgb.astype(np.float32)
            if rgb.ndim == 2
            else to_gray(rgb, self.cfg.camera.rgb)
        )
        self._prev_gray, self._prev_depth = self._last_gray, self._last_depth
        self._last_gray, self._last_depth = gray, depth
        T = self.tracker.track(timestamp, gray, depth)
        if getattr(self.tracker, "request_reset", False):
            # lost with <=5 keyframes: automatic full reset
            # (Tracking.cc:517-523)
            self.reset()
        if self.viewer is not None:
            self.viewer.update()
        return T

    # alias matching the reference naming
    Track = track

    def warmup(self) -> None:
        """Compile every device program the steady state and its keyframe /
        reloc events can reach (fast tracker only; no-op otherwise).  Run
        after tracking a few frames and before any timed measurement."""
        if hasattr(self.tracker, "warm_programs"):
            self.tracker.warm_programs(self.local_mapper)

    def activate_localization_mode(self) -> None:
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self) -> None:
        self.tracker.only_tracking = False

    def reset(self) -> None:
        """System reset (Tracking::Reset, Tracking.cc:2057-2087)."""
        if hasattr(self.tracker, "join_mapper"):
            self.tracker.join_mapper()
        self.map = SlamMap(self.cfg)
        if self.fast:
            from manhattanslam_tpu.frontend.fast_tracking import FastTracker

            tracker = FastTracker(
                self.cfg, self.map, pipeline=self.pipeline, chunk=self.chunk,
                enable_planes=self.enable_planes,
                enable_lines=self.enable_lines,
            )
        else:
            tracker = Tracker(self.cfg, self.map)
        tracker.plane_module = self.tracker.plane_module
        tracker.line_module = self.tracker.line_module
        tracker.reloc_module = self.tracker.reloc_module
        if tracker.plane_module is not None:
            tracker.plane_module.map = self.map
        if tracker.line_module is not None:
            tracker.line_module.map = self.map
        if tracker.reloc_module is not None:
            tracker.reloc_module.reset(self.map)
        self.tracker = tracker
        self.tracker.on_keyframe = self._on_keyframe
        if self.local_mapper is not None:
            self.local_mapper.map = self.map
            self.local_mapper.recent_points.clear()
        if self.surfel_mapper is not None:
            self.surfel_mapper.reset(self.map)

    def shutdown(self) -> None:
        """Flush mappers (System::Shutdown, System.cc:167-186)."""
        if hasattr(self.tracker, "flush"):
            self.tracker.flush()
        if self.surfel_mapper is not None:
            self.surfel_mapper.finish()

    def save_trajectory_tum(self, path: str) -> None:
        traj_io.save_trajectory_tum(path, self.tracker.trajectory_rows())

    def save_keyframe_trajectory_tum(self, path: str) -> None:
        traj_io.save_keyframe_trajectory_tum(path, self.tracker.keyframe_rows())

    def save_surfels(self, path: str) -> None:
        if self.surfel_mapper is not None:
            self.surfel_mapper.save_ply(path)

    def save_map(self, path: str) -> None:
        """Checkpoint the map (the reference's SaveMap TODO, System.h:90-92)."""
        from manhattanslam_tpu.io.map_io import save_map

        save_map(path, self.map)

    def load_map(self, path: str) -> None:
        """Restore a map checkpoint; tracking can continue / relocalize."""
        from manhattanslam_tpu.io.map_io import load_map

        load_map(path, self.map)
        if self.tracker.reloc_module is not None:
            # rebuild the place-recognition index
            for kf in range(self.map.n_kf):
                if self.map.kf_valid[kf]:
                    self.tracker.reloc_module.add_keyframe(kf)
        if hasattr(self.tracker, "refresh_view"):
            self.tracker.refresh_view()

    # ------------------------------------------------------------ internals
    def _on_keyframe(self, kf_id: int, feats, feats_np: dict) -> None:
        import time as _time

        from collections import defaultdict

        if not hasattr(self, "kf_perf"):
            self.kf_perf = defaultdict(float)
        t0 = _time.perf_counter()
        if self.local_mapper is not None:
            self.local_mapper.process_keyframe(kf_id)
        t1 = _time.perf_counter()
        self.kf_perf["local_mapper"] += t1 - t0
        if self.tracker.reloc_module is not None:
            self.tracker.reloc_module.add_keyframe(kf_id)
        t2 = _time.perf_counter()
        self.kf_perf["reloc_add"] += t2 - t1
        if self.surfel_mapper is not None and self._last_gray is not None:
            membership = None
            gray, depth = self._last_gray, self._last_depth
            if self.fast:
                membership = self.tracker.kf_membership
                if self.tracker.kf_gray is not None:
                    # chunk mode: the tracker stashed the keyframe's own
                    # gray/depth (System's last-frame copy is younger)
                    gray, depth = self.tracker.kf_gray, self.tracker.kf_depth
                elif getattr(self.tracker, "pipeline", False) and self._prev_gray is not None:
                    # pipelined: the keyframe is the PREVIOUS frame
                    gray, depth = self._prev_gray, self._prev_depth
            self.surfel_mapper.insert_keyframe(
                kf_id, gray, depth,
                self.tracker.plane_module, plane_membership=membership,
                ref_kf=getattr(self.tracker, "prev_ref_kf", None),
            )
            self.kf_perf["surfel_insert"] += _time.perf_counter() - t2
