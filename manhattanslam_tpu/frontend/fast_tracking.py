"""Fast host loop around the fused device frame step.

Steady-state frame cost: one host->device upload (gray+depth), one fused
jit dispatch, one batched summary pull.  All map-dependent state lives in
a device "map view" refreshed only at keyframe events (where the host
does the reference's keyframe machinery: landmark creation, plane/line
bookkeeping, Manhattan registration, local-mapping backend, surfels).

Public surface mirrors Tracker (frontend/tracking.py) so the System
facade can use either; this is the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import SlamConfig
from manhattanslam_tpu.frontend import device_tracker as dt
from manhattanslam_tpu.frontend.frame import backproject_keypoints
from manhattanslam_tpu.frontend.tracking import FrameRecord, LOST, NOT_INITIALIZED, OK
from manhattanslam_tpu.geometry import se3
from manhattanslam_tpu.slam_map import SlamMap


class FastTracker:
    def __init__(
        self,
        cfg: SlamConfig,
        slam_map: SlamMap,
        pipeline: bool = False,
        chunk: int = 1,
        enable_planes: bool = True,
        enable_lines: bool = True,
    ):
        self.cfg = cfg
        self.map = slam_map
        self.chunk = max(1, int(chunk))
        self.enable_planes = enable_planes
        self.enable_lines = enable_lines
        # chunk>1: C frames ride one upload + one lax.scan dispatch + one
        # summary pull (build_chunk_step), amortizing the host<->device
        # roundtrip latency C-fold; keyframe machinery runs at chunk
        # boundaries.  chunk=1: one fused dispatch per frame.
        if self.chunk > 1:
            self.step = None
            self.chunk_step = dt.build_chunk_step(
                cfg, enable_planes=enable_planes, enable_lines=enable_lines
            )
        else:
            self.step = dt.build_frame_step(
                cfg, enable_planes=enable_planes, enable_lines=enable_lines
            )
            self.chunk_step = None
        # vo_points=True: the temporal VO bank (previous frame's keypoints
        # back-projected in the carry, device_tracker.py:605-655) anchors
        # intra-chunk tracking while the map view is frozen for the chunk.
        # The reference gets away without it in SLAM mode because its
        # keyframe insertion latency is ~1 frame (Tracking.cc:1545);
        # chunked dispatch makes that latency C..2C frames, and map
        # coverage alone starves during exploration.  The keyframe policy
        # is driven by the separate map-only inlier count, so the VO bank
        # cannot suppress keyframing.
        self.carry = dt.init_carry(cfg, vo_points=True)
        self.view = None  # device map view
        # pipeline=True: dispatch frame/chunk k before pulling k-1's
        # summary, hiding the host<->device sync latency behind device
        # compute.  track() then returns the pose of a PREVIOUS
        # frame/chunk (one- or two-chunk latency, like the reference's
        # asynchronous mapping thread).  In chunk mode TWO chunks ride in
        # flight: the blocking summary pull of chunk k then overlaps the
        # device compute of chunk k+1 entirely.
        self.pipeline = pipeline
        self.pipeline_depth = 2 if (pipeline and self.chunk > 1) else 1
        self._pending = []  # [(meta, device result)] awaiting summary
        self._buf = []  # chunk mode: buffered (ts, fid, packed, gray, depth)
        # chunk staging: frames are written into preallocated (C,H,W)
        # buffers as they arrive (np.stack at dispatch cost ~17 ms/chunk on
        # this 1-core host; a prealloc row-fill costs ~2.6 ms and spreads
        # it across frame arrivals).  Ring of depth+1 buffer pairs so a
        # buffer is never rewritten while its upload may still be staging.
        if self.chunk > 1:
            H, W = cfg.camera.height, cfg.camera.width
            nbuf = self.pipeline_depth + 1
            self._stage = [
                (
                    np.empty((self.chunk, H, W), np.uint8),
                    np.empty((self.chunk, H, W), np.uint16),
                )
                for _ in range(nbuf)
            ]
            self._stage_i = 0
            # dedicated puller thread: the chunk-summary device_get blocks
            # (in C, GIL released) until the chunk's compute + D2H finish
            # on the in-order tunnel queue.  Submitting the pull HERE and
            # collecting it two chunks later overlaps that wait with the
            # next chunks' staging/dispatch on the main thread — the r4
            # bench showed ~80% of the timed wall inside the blocking pull.
            import concurrent.futures

            self._pull_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mslam-pull"
            )
            # mapping-backend worker: the reference runs LocalMapping +
            # SurfelMapping on their own threads (System.cc:90-107); here
            # ONE worker owns each keyframe's backend job (mapper stages,
            # surfel fusion, reloc indexing, view rebuild).  The main
            # thread joins it at the next chunk's summary — during which
            # it is blocked on the device anyway — so the ~0.5-1 s of
            # backend work per keyframe overlaps device compute instead of
            # stalling the dispatch loop.  Safe because the temporal VO
            # bank anchors tracking through a stale view and the epoch
            # gate blocks stale-view keyframe decisions.
            self._map_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="mslam-mapper"
            )
        else:
            self._pull_pool = None
            self._map_pool = None
        self._mapper_fut = None

        # host-phase accounting (seconds + event counts per section):
        # the perf story of this system is host overhead between device
        # dispatches, so the tracker self-reports where host time goes
        # (bench.py prints the breakdown next to the fps headline)
        from collections import defaultdict

        self.perf = defaultdict(float)
        self.perf_n = defaultdict(int)
        self.frame_log: list[tuple] = []  # (frame_id, n_inliers, tracked_ok)

        self.state = NOT_INITIALIZED
        self.only_tracking = False
        self.request_reset = False
        self.T_cw = np.eye(4, dtype=np.float32)
        slam_map.kf_retire_callbacks.append(self._on_kf_retired)
        self.frame_id = -1
        self.last_kf_frame_id = 0
        self.ref_kf = 0
        self.n_inliers = 0
        self.last_mp_idx = np.full(cfg.caps.max_keypoints, -1, np.int32)
        self.records: list[FrameRecord] = []
        self.max_frames = int(cfg.camera.fps)
        self.min_frames = int(cfg.min_kf_frames)
        self.last_reloc_frame_id = -(10**9)

        # Manhattan registries (host source of truth; dense mirrors upload)
        MP = cfg.caps.max_map_planes
        self.reg2 = np.full((MP, MP), -1, np.int32)
        self.reg3 = np.full((MP, MP, MP), -1, np.int32)

        # module hooks (same surface as Tracker)
        self.plane_module = None  # unused: planes are in the fused step
        self.line_module = None
        self.reloc_module = None
        self.on_keyframe = None
        self.last_result = None  # device result dict of the last frame
        self.velocity = None

    # ------------------------------------------------------------------ API
    def track(self, timestamp: float, gray: np.ndarray, depth: np.ndarray):
        self.frame_id += 1
        if self.only_tracking != self._vo_flag:
            # localization mode toggled: enable/disable the temporal VO
            # pseudo-landmark block (UpdateLastFrame, Tracking.cc:1052)
            self.carry = {
                **self.carry, "vo_points": jnp.array(self.only_tracking)
            }
            self._vo_flag = self.only_tracking
        if self.chunk > 1:
            # sensor-native buffering: no host byte work per frame (the
            # chunk dispatch uploads the raw u8/u16 stacks)
            g8, d16 = dt.to_native(gray, depth)
            if self.state == NOT_INITIALIZED:
                self._initialize(timestamp, (g8, d16))
                self._record(timestamp, lost=False)
                return self.T_cw.copy()
            self._buf_append((timestamp, self.frame_id, g8, d16, gray, depth))
            if len(self._buf) < self.chunk:
                return None
            return self._dispatch_chunk()

        packed = dt.pack_frame(gray, depth)
        if self.state == NOT_INITIALIZED:
            self._initialize(timestamp, packed)
            self._record(timestamp, lost=False)
            return self.T_cw.copy()

        pd = jnp.asarray(packed)  # one upload
        result, new_carry = self.step(pd, self.carry, self.view)
        try:  # prime the async summary transfer behind this frame's compute
            result["summary_flat"].copy_to_host_async()
        except (AttributeError, KeyError):
            pass
        self.last_result = result
        # carry updates are tracked_ok-gated on device, so adopting the new
        # carry before reading the summary is safe
        self.carry = new_carry

        if self.pipeline:
            out_pose = None
            self._pending.append((timestamp, result))
            if len(self._pending) >= self.pipeline_depth + 1:
                out_pose = self._finish_frame(*self._pending.pop(0))
            return out_pose
        return self._finish_frame(timestamp, result)

    def flush(self):
        """Finish in-flight work (pipeline and/or chunk mode)."""
        out = None
        while self._pending:
            pend = self._pending.pop(0)
            if self.chunk > 1:
                out2 = self._process_chunk(*pend)
            else:
                out2 = self._finish_frame(*pend)
            out = out2 if out2 is not None else out
        if self._buf:
            # pad the partial chunk by repeating the last frame; only the
            # real frames' summaries are processed (the padded frames
            # advance the device carry with a zero-motion repeat, which is
            # harmless at a flush boundary)
            metas = list(self._buf)
            self._buf = []
            n_real = len(metas)
            g8s, d16s = self._stage[self._stage_i]
            for j in range(n_real, self.chunk):
                g8s[j] = metas[-1][2]
                d16s[j] = metas[-1][3]
            self._stage_i = (self._stage_i + 1) % len(self._stage)
            results, new_carry = self.chunk_step(
                jnp.asarray(g8s), jnp.asarray(d16s), self.carry, self.view
            )
            try:
                results["chunk_flat"].copy_to_host_async()
                results["kfx_flat"].copy_to_host_async()
            except (AttributeError, KeyError):
                pass
            self.carry = new_carry
            self.last_result = results
            out2 = self._process_chunk(
                metas, results, epoch=self._view_applied_epoch
            )
            out = out2 if out2 is not None else out
        self.join_mapper()
        return out

    def _timed(self, section: str):
        import contextlib
        import time as _time

        @contextlib.contextmanager
        def cm():
            t0 = _time.perf_counter()
            try:
                yield
            finally:
                self.perf[section] += _time.perf_counter() - t0
                self.perf_n[section] += 1

        return cm()

    # ------------------------------------------------------------ chunk mode
    def _buf_append(self, meta) -> None:
        """Buffer one frame: write its native planes into the current
        staging pair (row = position in the chunk) and keep the meta."""
        g8s, d16s = self._stage[self._stage_i]
        i = len(self._buf)
        g8s[i] = meta[2]
        d16s[i] = meta[3]
        self._buf.append(meta)

    def _dispatch_chunk(self):
        metas = self._buf
        self._buf = []
        with self._timed("chunk_dispatch"):
            g8s, d16s = self._stage[self._stage_i]
            # rotate the ring: this pair must not be rewritten while its
            # upload may still be staging (depth+1 pairs in the ring)
            self._stage_i = (self._stage_i + 1) % len(self._stage)
            results, new_carry = self.chunk_step(
                jnp.asarray(g8s), jnp.asarray(d16s), self.carry, self.view
            )
            # prime the summary transfer NOW: the device queue is in-order,
            # so a copy enqueued here rides directly behind this chunk's
            # compute.  Pulled two chunks later (pipeline depth 2), the
            # bytes are already host-side — otherwise the blocking pull
            # waits behind the NEXT two chunks' device work (~350 ms).
            try:
                results["chunk_flat"].copy_to_host_async()
                results["kfx_flat"].copy_to_host_async()
            except (AttributeError, KeyError):  # single-frame result shape
                pass
        self.carry = new_carry
        self.last_result = results
        if self.pipeline:
            out = None
            # hand the blocking wait to the puller thread NOW; collected
            # two chunks later, by which point the bytes are host-side
            fut = self._pull_pool.submit(
                dt.pull_chunk_summary, results,
                self.cfg.caps.max_map_points, self.cfg.caps.max_map_lines,
            )
            self._pending.append(
                (metas, results, fut, self._view_applied_epoch)
            )
            if len(self._pending) >= self.pipeline_depth + 1:
                out = self._process_chunk(*self._pending.pop(0))
            return out
        return self._process_chunk(
            metas, results, epoch=self._view_applied_epoch
        )

    def _process_chunk(self, metas, results, fut=None, epoch=None):
        # ONE transfer: per-frame cores + chunk-accumulated landmark stats
        with self._timed("summary_pull"):
            if fut is not None:
                cores, stats = fut.result()
            else:
                cores, stats = dt.pull_chunk_summary(
                    results, self.cfg.caps.max_map_points,
                    self.cfg.caps.max_map_lines,
                )
        # join the in-flight mapping-backend job AFTER the summary wait
        # (the worker crunched while this thread was device-blocked); from
        # here on the map is read/written on this thread only
        with self._timed("mapper_join"):
            self.join_mapper()
        # landmark found/visible counts were accumulated on device over
        # the chunk (tracked_ok-gated); applied once per chunk — the same
        # latency class as the reference's asynchronous LocalMapping
        m = self.map
        m.mp_visible += np.where(m.mp_valid, stats["mp_visible"], 0)
        m.mp_found += np.where(m.mp_valid, stats["mp_found"], 0)
        m.ml_visible += np.where(m.ml_valid, stats["ml_visible"], 0)
        m.ml_found += np.where(m.ml_valid, stats["ml_found"], 0)
        out = None
        for i, (ts, fid, _g8, _d16, gray, depth) in enumerate(metas):
            pose = self._finish_frame(ts, results, s=cores[i], idx=i,
                                      frame_id=fid, gray=gray, depth=depth,
                                      epoch=epoch)
            out = pose if pose is not None else out
            if self._chunk_restart:
                # mid-chunk loss + successful relocalization: the remaining
                # frames of this chunk (and any in-flight chunks) were
                # computed with the pre-reloc carry — their results are
                # stale.  Re-run them with the reset carry so recovery
                # costs one frame, like the reference's per-frame reloc
                # (Tracking.cc:410).
                self._chunk_restart = False
                stale = list(metas[i + 1 :])
                for ms, *_rest in self._pending:
                    stale.extend(ms)
                self._pending = []
                pose2 = self._replay_frames(stale)
                return pose2 if pose2 is not None else out
        return out

    _chunk_restart = False

    def _replay_frames(self, metas):
        """Re-track already-uploaded frames through the normal chunk path
        (after a mid-chunk carry reset).  Leftover frames stay buffered
        and complete with the next track()/flush()."""
        out = None
        for meta in metas:
            self._buf_append(meta)
            if len(self._buf) >= self.chunk:
                pose = self._dispatch_chunk()
                out = pose if pose is not None else out
        return out

    def _finish_frame(
        self, timestamp: float, result, s=None, idx=None, frame_id=None,
        gray=None, depth=None, epoch=None,
    ) -> np.ndarray | None:
        if s is None:
            s = dt.pull_summary(result)  # single transfer
        if frame_id is None:
            frame_id = self.frame_id

        ok = bool(s["tracked_ok"])
        # stricter right after a relocalization (Tracking.cc:1423-1425):
        # the device gate is the lenient points+lines+planes >= 7; within
        # one fps-window of a reloc the reference demands >= 20
        if ok and frame_id < self.last_reloc_frame_id + self.max_frames:
            ok = int(s.get("n_inliers", 0)) >= 20
        self.frame_log.append(
            (int(frame_id), int(s.get("n_inliers", -1)), ok,
             self._ref_matches if self._ref_matches is not None else -1,
             self._ref_total)
        )
        if not ok:
            # relocalization attempt (every frame while lost,
            # Tracking.cc:410)
            if self._relocalize(result, idx=idx):
                # _relocalize already set T_cw and reset the carry; the
                # failed device track's pose/matches in `s` are garbage,
                # so skip every s-derived update (pose, inliers, landmark
                # stats, keyframe decision) for this frame.
                self.state = OK
                self.last_mp_idx = np.full(
                    self.cfg.caps.max_keypoints, -1, np.int32
                )
                if idx is not None:
                    # chunk mode: later frames of this chunk ran with the
                    # pre-reloc carry — tell _process_chunk to re-run them
                    self._chunk_restart = True
                self._record(timestamp, lost=False)
                return self.T_cw.copy()
        if not ok:
            self.state = LOST
            # barely-started map: request a full system reset instead of
            # waiting for relocalization (Tracking.cc:517-523)
            if not self.only_tracking and self.map.n_kf <= 5:
                self.request_reset = True
            self._record(timestamp, lost=True)
            return None

        self.state = OK
        self.T_cw = s["T"].astype(np.float32)
        self.velocity = None  # velocity lives in the device carry
        self.n_inliers = int(s["n_inliers"])
        self.n_map_inliers = int(s.get("n_map_inliers", s["n_inliers"]))
        self.n_ok_frames += 1
        # Manhattan-path usage telemetry (Tracking.cc:257-275 branch):
        # the low-texture proof and the bench report what fraction of
        # frames the decoupled rotation + translation-only solve carried
        if bool(s.get("use_manhattan", False)):
            self.n_manhattan_frames += 1

        chunk_core = "kp_mp" not in s  # chunk-mode core summary
        if not chunk_core:
            self.last_mp_idx = s["kp_mp"]
            # landmark statistics (single-frame path; chunk mode
            # accumulates these on device, applied in _process_chunk)
            m = self.map
            vis = s["visible"] & m.mp_valid
            m.mp_visible[vis] += 1
            m.mp_found[s["matched"] & vis & s["visible"]] += 1
            # line found/visible ratios (MapLine::IncreaseVisible/Found)
            lvis = s["ml_visible"] & m.ml_valid
            m.ml_visible[lvis] += 1
            matched_ml = s["line_assoc"][s["line_assoc"] >= 0]
            matched_ml = matched_ml[m.ml_valid[matched_ml]]
            # np.add.at counts duplicates (two frame lines -> same map line)
            np.add.at(m.ml_found, matched_ml, 1)

        # view-staleness gate (the reference's "mapper busy" c1b arm,
        # Tracking.cc:1454): a frame computed against a view OLDER than the
        # last keyframe's refresh reports artificially low map matches —
        # the refreshed view usually covers it.  Only frames dispatched
        # under the current view may mint keyframes; the temporal VO bank
        # keeps tracking anchored meanwhile.  Override: once the camera is
        # a full chunk past the last keyframe, its viewpoint has left that
        # keyframe's coverage anyway — letting such frames mint caps the
        # pipeline-induced inter-keyframe floor at ~chunk frames instead
        # of ~3 chunks (a fresh chunk's round-trip), which is what keeps
        # exploration drift at reference-like levels.
        view_fresh = (
            epoch is None
            or epoch >= self._view_epoch
            or frame_id >= self.last_kf_frame_id + max(self.chunk, 8)
        )
        if (
            not self.only_tracking
            and view_fresh
            and self._need_new_keyframe(s, frame_id)
        ):
            if chunk_core:
                # fetch the keyframe extras for this one frame (lazy pull)
                s = {**s, **dt.pull_kfx(result, idx)}
                self.last_mp_idx = s["kp_mp"]
            self._create_keyframe(timestamp, result, s, frame_id, idx=idx,
                                  gray=gray, depth=depth)
        self._record(timestamp, lost=False)
        return self.T_cw.copy()

    # ------------------------------------------------------------- keyframe
    def _need_new_keyframe(self, s: dict, frame_id: int | None = None) -> bool:
        if frame_id is None:
            frame_id = self.frame_id
        m = self.map
        c = self.cfg.caps
        # capacity: count FREE slots — retired (culled) slots in kf_free are
        # reusable, so a saturated high-water mark (n_kf) must not stop
        # keyframing forever on long sequences
        free_kf = (c.max_keyframes - m.n_kf) + len(m.kf_free)
        if free_kf <= 1:
            self.force_keyframe = False
            return False
        if self.force_keyframe:  # warmup hook (compile the KF-event path)
            self.force_keyframe = False
            return True
        n_kfs = m.n_kf - len(m.kf_free)  # live keyframes
        # reloc-recency gate (Tracking.cc:1443-1444): no keyframes right
        # after a relocalization while the map is mature
        if (
            frame_id < self.last_reloc_frame_id + self.max_frames
            and n_kfs > self.max_frames
        ):
            return False
        since_kf = frame_id - self.last_kf_frame_id
        # min-frames hysteresis replaces the reference's "mapper idle" c1b
        # arm (our backend is synchronous, so c1b alone would always pass)
        if since_kf < self.min_frames:
            self._new_plane_streak = (
                self._new_plane_streak + 1 if bool(s["new_plane"]) else 0
            )
            return False
        # TrackedMapPoints(nMinObs): ref-KF matches with >= nMinObs total
        # observations (Tracking.cc:1447-1450) — counting ALL matches
        # inflates ref_matches and over-triggers c2.  The count only
        # changes at keyframe / reloc / retire events, so it is cached.
        if self._ref_matches is None:
            nmin = 3 if n_kfs > 2 else 2
            ref_ids = m.kf_mp_idx[self.ref_kf]
            ref_ids = ref_ids[ref_ids >= 0]
            if len(ref_ids):
                flat = m.kf_mp_idx[: m.n_kf][m.kf_valid[: m.n_kf]]
                flat = flat[flat >= 0]
                obs = np.bincount(flat, minlength=c.max_map_points)
                self._ref_matches = int((obs[ref_ids] >= nmin).sum())
                self._ref_total = len(ref_ids)
            else:
                self._ref_matches = 0
                self._ref_total = 0
        ref_matches = self._ref_matches
        th_ref = 0.75 if n_kfs > 2 else 0.4
        tracked_close = int(s["tracked_close"])
        nontracked_close = int(s["nontracked_close"])
        need_close = tracked_close < 100 and nontracked_close > 70
        # the ratio arm watches MAP matches (TrackedMapPoints semantics):
        # with the temporal VO bank active, total inliers stay high while
        # map coverage starves — exactly when a keyframe is needed.  The
        # >15 pose-trust arm uses TOTAL inliers: a VO-carried pose is a
        # valid keyframe pose even at near-zero map matches.
        map_inl = getattr(self, "n_map_inliers", self.n_inliers)
        c1a = since_kf >= self.max_frames
        c1c = map_inl < ref_matches * 0.25 or need_close
        c2 = (
            map_inl < ref_matches * th_ref or need_close
        ) and self.n_inliers > 15
        # new-plane trigger (Tracking.cc:1494), but only for a plane that
        # PERSISTS unassociated across >= 2 consecutive frames — a one-frame
        # segmentation flicker must not mint a keyframe
        self._new_plane_streak = (
            self._new_plane_streak + 1 if bool(s["new_plane"]) else 0
        )
        new_plane = self._new_plane_streak >= 2 and self.n_inliers > 15
        # past the min-frames hysteresis, c1b' (mapper idle) holds, so the
        # reference's (c1a||c1b||c1c)&&c2 collapses to c2; c1a/c1c are kept
        # for documentation of intent (they are implied by c1b')
        del c1a, c1c
        decision = c2 or new_plane
        if decision:
            self._new_plane_streak = 0
        return decision

    force_keyframe = False
    n_ok_frames = 0
    n_manhattan_frames = 0
    _new_plane_streak = 0
    _ref_matches = None  # cache; None = recompute (map/ref-KF changed)
    _ref_total = 0
    _vo_flag = False  # carry["vo_points"] mirror (localization mode)

    def _pull_payload(self, result, idx=None) -> dict:
        """Keyframe payload in two transfers (flat pack + descriptors;
        chunk mode: slice frame idx on device first)."""
        return dt.pull_payload(result, idx)

    def _create_keyframe(
        self, timestamp, result, s, frame_id, idx=None, gray=None, depth=None,
    ) -> None:
        with self._timed("keyframe_event"):
            self._create_keyframe_inner(
                timestamp, result, s, frame_id, idx, gray, depth
            )

    def _create_keyframe_inner(
        self, timestamp, result, s, frame_id, idx=None, gray=None, depth=None,
    ) -> None:
        m = self.map
        with self._timed("kf_payload_pull"):
            payload = self._pull_payload(result, idx)
        feats_np = payload["feats"]
        kf_id = m.add_keyframe(self.T_cw, timestamp, frame_id, feats_np)

        # new map points from depth (close-first, cap 100)
        mp_idx = self._create_points_from_depth(feats_np, kf_id, s["kp_mp"])
        m.set_kf_matches(kf_id, mp_idx)
        self.last_mp_idx = mp_idx

        # planes: observations / new landmarks + Manhattan registration
        self._kf_planes(kf_id, payload, s)
        # lines
        self._kf_lines(kf_id, payload)

        # the tracker's reference keyframe BEFORE this one took over — the
        # surfel mapper links the new pose to it (SurfelMapping.cpp:162-168)
        self.prev_ref_kf = self.ref_kf
        self.ref_kf = kf_id
        self.last_kf_frame_id = frame_id
        membership = result["plane_membership"]
        self.kf_membership = (
            membership if idx is None
            else dt._dyn_row(membership, np.int32(idx))
        )
        # chunk mode: the keyframe's own gray/depth for the surfel mapper
        # (System's last-frame copy would be a younger frame)
        self.kf_gray, self.kf_depth = gray, depth
        self._ref_matches = None
        # synchronous mini-refresh (~15 ms: the view diff is incremental):
        # the new keyframe's points enter the device view NOW, so the very
        # next dispatched chunk tracks against them — and may mint the
        # next keyframe (epoch re-arms at the applied value).  Frames
        # already in flight keep their stale tag and cannot mint.
        self._view_epoch += 1
        self._refresh_view_apply()

        def backend_job():
            if self.on_keyframe is not None:
                with self._timed("mapping_backend"):
                    self.on_keyframe(kf_id, payload["feats"], feats_np)
            # second, content-only refresh: triangulated / fused / culled
            # landmarks from the mapper stages reach the device view
            # without invalidating in-flight keyframe decisions — the
            # reference's tracker reads a concurrently-mutating map the
            # same way (LocalMapping runs during TrackLocalMap)
            self._refresh_view_apply()

        if self._map_pool is not None:
            # LocalMapping-thread parity: the backend overlaps the next
            # chunks' device compute; joined in _process_chunk
            self._mapper_fut = self._map_pool.submit(backend_job)
        else:
            backend_job()

    kf_membership = None
    kf_gray = None
    kf_depth = None

    def _create_points_from_depth(self, feats_np, kf_id, existing, max_new=100):
        """All close points + nearest far points up to max_new total
        (CreateNewKeyFrame depth-sorted rule, Tracking.cc:1554-1580)."""
        cfg = self.cfg
        m = self.map
        depth = feats_np["depth"]
        valid = feats_np["valid"] & (depth > 0) & (existing < 0)
        close_th = cfg.th_depth_m
        idx_close = np.nonzero(valid & (depth <= close_th))[0]
        chosen = idx_close
        if len(idx_close) < max_new:
            far = np.nonzero(valid & (depth > close_th))[0]
            far = far[np.argsort(depth[far])][: max_new - len(idx_close)]
            chosen = np.concatenate([idx_close, far])
        out = existing.copy()
        if len(chosen) == 0:
            return out
        cam = cfg.camera
        d = depth[chosen]
        x = (feats_np["xy_und"][chosen, 0] - cam.cx) / cam.fx * d
        y = (feats_np["xy_und"][chosen, 1] - cam.cy) / cam.fy * d
        pts_c = np.stack([x, y, d], -1)
        T_wc = np.linalg.inv(self.T_cw)
        pts_w = pts_c @ T_wc[:3, :3].T + T_wc[:3, 3]
        cam_center = T_wc[:3, 3]
        dvec = pts_w - cam_center
        dist = np.linalg.norm(dvec, axis=1).clip(1e-9)
        lvl = feats_np["level"][chosen]
        sf = cfg.orb.scale_factor
        max_d = dist * sf**lvl
        min_d = max_d / sf ** (cfg.orb.n_levels - 1)
        n_free = int((~m.mp_valid).sum())
        if n_free < len(chosen):
            chosen = chosen[:n_free]
            if len(chosen) == 0:
                return out
            pts_w, dist, lvl = pts_w[: len(chosen)], dist[: len(chosen)], lvl[: len(chosen)]
            max_d, min_d, dvec = max_d[: len(chosen)], min_d[: len(chosen)], dvec[: len(chosen)]
        ids = m.add_points(
            pts_w, feats_np["desc"][chosen], dvec / dist[:, None],
            min_d, max_d, lvl, kf_id,
        )
        out[chosen] = ids
        return out

    def _kf_planes(self, kf_id, payload, s) -> None:
        m = self.map
        T_wc = np.linalg.inv(self.T_cw)
        P = self.cfg.caps.max_planes_frame
        assoc = s["plane_assoc"].copy()
        from manhattanslam_tpu.frontend.planes_module import transform_plane_np

        for i in range(P):
            if not payload["plane_valid"][i]:
                continue
            cloud_c = payload["plane_cloud"][i][: payload["plane_npts"][i]]
            cloud_w = cloud_c @ T_wc[:3, :3].T + T_wc[:3, 3]
            j = int(assoc[i])
            if j >= 0 and m.pl_valid[j]:
                m.merge_plane_points(j, cloud_w)
                m.pl_n_obs[j] += 1
            else:
                if (~m.pl_valid).sum() == 0:
                    continue
                pi_w = transform_plane_np(T_wc, payload["plane_coeffs"][i])
                j = m.add_plane(pi_w, cloud_w, kf_id)
                assoc[i] = j
            m.kf_pl_idx[kf_id, i] = j
            m.kf_plane_coeffs[kf_id, i] = payload["plane_coeffs"][i]
            m.kf_plane_npts[kf_id, i] = payload["plane_support"][i]

        # Manhattan registration (LocalMapping.cc:172-218)
        th = self.cfg.plane.mf_vertical_threshold
        ids = [
            i for i in range(P)
            if payload["plane_valid"][i] and assoc[i] >= 0
        ]
        for a in range(len(ids)):
            i = ids[a]
            ni = payload["plane_coeffs"][i][:3]
            for b in range(a + 1, len(ids)):
                j = ids[b]
                nj = payload["plane_coeffs"][j][:3]
                if abs(float(ni @ nj)) > th:
                    continue
                pa, pb = int(assoc[i]), int(assoc[j])
                if self.reg2[pa, pb] < 0:
                    for x, y in ((pa, pb), (pb, pa)):
                        self.reg2[x, y] = kf_id
                    m.add_manhattan_pair(pa, pb, kf_id)
                for c_ in range(b + 1, len(ids)):
                    k = ids[c_]
                    nk = payload["plane_coeffs"][k][:3]
                    if abs(float(ni @ nk)) > th or abs(float(nj @ nk)) > th:
                        continue
                    pc_ = int(assoc[k])
                    trip = (pa, pb, pc_)
                    if self.reg3[trip] < 0:
                        import itertools

                        for perm in itertools.permutations(trip):
                            self.reg3[perm] = kf_id
                        m.add_manhattan_triple(pa, pb, pc_, kf_id)

    def _kf_lines(self, kf_id, payload, max_new: int = 30) -> None:
        m = self.map
        T_wc = np.linalg.inv(self.T_cw)
        n_new = 0
        for i in range(self.cfg.caps.max_lines):
            if not payload["line_valid"][i]:
                continue
            j = int(payload["line_assoc"][i])
            if j >= 0 and m.ml_valid[j]:
                if payload["line_has3d"][i]:
                    m.observe_line(
                        j,
                        payload["line_sp3"][i] @ T_wc[:3, :3].T + T_wc[:3, 3],
                        payload["line_ep3"][i] @ T_wc[:3, :3].T + T_wc[:3, 3],
                        payload["line_desc"][i],
                    )
                m.ml_n_obs[j] += 1
            elif payload["line_has3d"][i] and n_new < max_new:
                free = np.nonzero(~m.ml_valid)[0]
                if len(free) == 0:
                    break
                j = int(free[0])
                m.ml_sp[j] = payload["line_sp3"][i] @ T_wc[:3, :3].T + T_wc[:3, 3]
                m.ml_ep[j] = payload["line_ep3"][i] @ T_wc[:3, :3].T + T_wc[:3, 3]
                m.ml_desc[j, : payload["line_desc"].shape[1]] = payload["line_desc"][i]
                m.ml_valid[j] = True
                m.ml_n_obs[j] = 1
                m.ml_first_kf[j] = kf_id
                n_new += 1
            else:
                continue
            m.kf_ml_idx[kf_id, i] = j

    # ------------------------------------------------------- initialization
    def _initialize(self, timestamp, packed) -> None:
        self.T_cw = np.eye(4, dtype=np.float32)
        # bootstrap view so the step can run (empty map)
        self.refresh_view()
        if self.chunk > 1:
            # reuse the (single-trace) chunk program on a repeated frame
            g8, d16 = packed  # chunk mode passes the native pair
            gs = jnp.asarray(np.broadcast_to(g8, (self.chunk,) + g8.shape))
            ds = jnp.asarray(np.broadcast_to(d16, (self.chunk,) + d16.shape))
            results, _ = self.chunk_step(gs, ds, self.carry, self.view)
            self.last_result = results
            result = results
            idx = 0
        else:
            result, _ = self.step(jnp.asarray(packed), self.carry, self.view)
            self.last_result = result
            idx = None
        payload = self._pull_payload(result, idx)
        feats_np = payload["feats"]
        m = self.map
        kf_id = m.add_keyframe(self.T_cw, timestamp, self.frame_id, feats_np)
        mp_idx = self._create_points_from_depth(
            feats_np, kf_id,
            np.full(self.cfg.caps.max_keypoints, -1, np.int32), max_new=10**9,
        )
        m.set_kf_matches(kf_id, mp_idx)
        self.last_mp_idx = mp_idx
        s0 = {
            "plane_assoc": np.full(self.cfg.caps.max_planes_frame, -1, np.int32),
        }
        self._kf_planes(kf_id, payload, s0)
        self._kf_lines(kf_id, payload)
        self.ref_kf = kf_id
        self.last_kf_frame_id = self.frame_id
        self.state = OK
        self.carry = dt.init_carry(self.cfg, vo_points=True)
        membership = result["plane_membership"]
        self.kf_membership = (
            membership if idx is None
            else dt._dyn_row(membership, np.int32(idx))
        )
        if self.on_keyframe is not None:
            self.on_keyframe(kf_id, payload["feats"], feats_np)
        self.refresh_view()
        self._ref_matches = None

    def warm_programs(self, local_mapper=None) -> None:
        """Compile every program reachable from the steady-state loop and
        its keyframe / relocalization events (pulls, view updates, mapping
        backend, reloc pipeline).  Call after at least one tracked chunk;
        benchmark timed regions then run with ZERO XLA compiles."""
        r = self.last_result
        if r is None:
            return
        if self.chunk > 1:
            dt.pull_kfx(r, 0)
            dt.pull_payload(r, 0)
            jax.device_get(dt._dyn_row(r["plane_membership"], np.int32(0)))
            feats0 = dt._dyn_tree(r["feats"], np.int32(0))
        else:
            dt.pull_payload(r, None)
            feats0 = r["feats"]
        if self._shadow is not None and self.view is not None:
            self.view = dt.apply_view_update(
                self.view, [dt.noop_view_update(self._shadow)]
            )
        if self.reloc_module is not None:
            self.reloc_module.warm(feats0)
        if local_mapper is not None:
            local_mapper.warm_programs()

    _shadow = None  # host snapshot of what the device view holds

    # view epochs: _view_epoch bumps synchronously whenever the map state
    # a dispatched chunk saw becomes stale (keyframe insertion);
    # _view_applied_epoch records the epoch of the view actually installed
    # on device.  A frame may mint a keyframe only if the view it was
    # computed against is current (tag == _view_epoch).
    _view_epoch = 0
    _view_applied_epoch = 0

    def join_mapper(self) -> None:
        """Wait for the in-flight mapping-backend job (no-op if none)."""
        fut = self._mapper_fut
        if fut is not None:
            self._mapper_fut = None
            fut.result()

    def refresh_view(self) -> None:
        self._view_epoch += 1
        self._refresh_view_apply()

    def _refresh_view_apply(self) -> None:
        target_epoch = self._view_epoch
        with self._timed("refresh_view"):
            host = dt.build_host_view(
                self.cfg, self.map, self.reg2, self.reg3, self.ref_kf
            )
            if self.view is None or self._shadow is None:
                self.view = jax.device_put(host)
            else:
                updates = dt.diff_host_views(self._shadow, host)
                self.view = dt.apply_view_update(self.view, updates)
            self._shadow = host
        self._view_applied_epoch = target_epoch

    # --------------------------------------------------------------- reloc
    def _relocalize(self, result, idx=None) -> bool:
        if self.reloc_module is None:
            return False
        self.join_mapper()  # reloc reads the map; no concurrent mutation
        with self._timed("relocalize"):
            return self._relocalize_inner(result, idx)

    def _relocalize_inner(self, result, idx=None) -> bool:
        feats = result["feats"]
        if idx is not None:
            feats = dt._dyn_tree(feats, np.int32(idx))
        T = self.reloc_module.relocalize(feats)
        if T is None:
            return False
        self.T_cw = T.astype(np.float32)
        self.carry = dt.init_carry(self.cfg, self.T_cw, vo_points=True)
        self.n_inliers = 50
        self.last_reloc_frame_id = self.frame_id
        self._ref_matches = None
        # re-anchor the reference keyframe to the relocalization match so
        # the next frame's descriptor-fallback candidate searches a KF
        # that actually overlaps the current view
        kf = getattr(self.reloc_module, "last_kf", -1)
        if kf >= 0 and self.map.kf_valid[kf]:
            self.ref_kf = int(kf)
            self.view = dt.set_ref_kf(self.view, self.map, self.ref_kf)
            if self._shadow is not None:
                for k, src in (
                    ("ref_desc", self.map.kf_desc[kf]),
                    ("ref_angle", self.map.kf_angle[kf]),
                    ("ref_mp", self.map.kf_mp_idx[kf]),
                ):
                    self._shadow[k] = src.copy()
        return True

    # ---------------------------------------------------------- export etc.
    def _on_kf_retired(self, kf: int, parent: int) -> None:
        """Re-anchor trajectory records referencing a retired keyframe to
        its spanning-tree parent: T_cr' = T_cr @ T_kf @ inv(T_parent)
        (the eager form of the replay chain at System.cc:221-224).  The
        slot can then be reused without corrupting the trajectory."""
        if parent < 0:
            return
        self._ref_matches = None
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
            if self.view is not None:
                self.view = dt.set_ref_kf(self.view, m, parent)
                if self._shadow is not None:
                    self._shadow["ref_desc"] = m.kf_desc[parent].copy()
                    self._shadow["ref_angle"] = m.kf_angle[parent].copy()
                    self._shadow["ref_mp"] = m.kf_mp_idx[parent].copy()

    def _record(self, timestamp: float, lost: bool) -> None:
        T_ref = self.map.kf_pose[self.ref_kf]
        if lost:
            T_cr = self.records[-1].T_cr if self.records else np.eye(4, np.float32)
        else:
            T_cr = (self.T_cw @ np.linalg.inv(T_ref)).astype(np.float32)
        self.records.append(FrameRecord(timestamp, self.ref_kf, T_cr, lost))

    def trajectory_rows(self):
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
