"""System facade: the public entry point of the SLAM engine.

Replaces the reference's System class (reference: src/System.cc, 516
LoC): constructs the map, tracking, local mapping, loop closing and dense
mapping stages, routes frames per sensor type, exposes localization-mode
/ reset / shutdown controls and the trajectory / map savers.

Where the reference spawns four std::threads over a mutexed map
(src/System.cc:107-133), this system runs the stages as host-orchestrated
phases by default (deterministic, race-free) with an optional background
mode that overlaps mapping with tracking using a worker thread — the
device does the heavy lifting either way.
"""

from __future__ import annotations

import enum
import queue
import threading
from typing import List, Optional, Tuple

import numpy as np

from ..config import SystemConfig
from ..io import trajectory as traj_io
from ..utils import profiling
from .local_mapping import LocalMapper
from .mapstore import MapStore
from .tracking import Tracker, TrackingState


class Sensor(enum.Enum):
    MONOCULAR = 0
    STEREO = 1
    RGBD = 2


class SLAMSystem:
    def __init__(self, cfg: SystemConfig, sensor: Sensor = Sensor.RGBD,
                 vocabulary=None, enable_loop_closing: bool = True,
                 enable_dense_mapping: bool = False,
                 async_mapping: bool = False,
                 background_gba: bool = False,
                 pipeline_depth: int = 24,
                 max_keyframes: int = 512, max_points: int = 1 << 16):
        from ..ops import orb
        from ..utils import compile_cache

        compile_cache.ensure()
        self.cfg = cfg
        self.sensor = sensor
        kp_cap = orb.total_capacity(cfg.orb)
        self.map = MapStore(max_keyframes=max_keyframes,
                            max_points=max_points, kp_capacity=kp_cap)

        self.loop_closer = None
        self.place_db = None
        if enable_loop_closing:
            try:
                from ..place.database import KeyFrameDatabase
                from .loop_closing import LoopCloser

                self.place_db = KeyFrameDatabase(cfg, self.map,
                                                 vocabulary=vocabulary)
                self.loop_closer = LoopCloser(cfg, self.map, self.place_db,
                                              fix_scale=sensor != Sensor.MONOCULAR)
            except ImportError:
                pass

        self.dense_mapper = None
        if enable_dense_mapping:
            from ..dense.pointcloud import DenseMapper

            # background worker (the reference's PointCloudMapping
            # thread): keyframe creation never blocks on cloud fusion
            self.dense_mapper = DenseMapper(cfg, self.map,
                                            loop_closer=self.loop_closer,
                                            background=True)

        self.local_mapper = LocalMapper(cfg, self.map,
                                        loop_closer=self.loop_closer)
        self.tracker = Tracker(cfg, self.map,
                               local_mapper=self._mapper_hook(async_mapping),
                               dense_mapper=self.dense_mapper,
                               relocalizer=self.place_db)
        if self.loop_closer is not None:
            # re-base the tracker's cached poses when a loop correction
            # or GBA merge moves the map under it (see
            # Tracker.apply_map_transform)
            self.loop_closer.transform_listeners.append(
                self.tracker.apply_map_transform)
        self._async = async_mapping
        self._worker = None
        self._queue: "queue.Queue[int]" = queue.Queue()
        if async_mapping:
            self._worker = threading.Thread(target=self._mapping_loop,
                                            daemon=True)
            self._running = True
            self._worker.start()
        self._pipeline = None
        self._pipeline_depth = pipeline_depth
        if background_gba and self.loop_closer is not None:
            self.loop_closer.enable_background_gba()

    # ------------------------------------------------------------------
    # pipelined (asynchronous) tracking
    # ------------------------------------------------------------------

    @property
    def pipeline(self):
        """Lazy AsyncRGBDPipeline: device-resident tracking recurrence
        with background supervision (slam/async_pipeline.py). Use
        track_rgbd_async + flush for maximum throughput; track_rgbd stays
        the synchronous reference-compatible path."""
        if self._pipeline is None:
            from .async_pipeline import AsyncRGBDPipeline

            if (self.loop_closer is not None
                    and self.loop_closer.background_gba is None):
                # post-loop global BA must not stall the pipeline
                self.loop_closer.enable_background_gba()
            self._pipeline = AsyncRGBDPipeline(
                self.cfg, self.tracker, local_mapper=self.local_mapper,
                dense_mapper=self.dense_mapper,
                max_in_flight=self._pipeline_depth)
        return self._pipeline

    def track_rgbd_async(self, timestamp: float, gray: np.ndarray,
                         depth: np.ndarray,
                         rgb: Optional[np.ndarray] = None) -> None:
        """Non-blocking frame submission (poses are recovered from the
        trajectory log; results lag by the pipeline depth)."""
        assert self.sensor == Sensor.RGBD
        self.pipeline.submit(timestamp, gray, depth, rgb=rgb)

    def flush(self):
        if self._pipeline is not None:
            self._pipeline.flush()

    # ------------------------------------------------------------------

    def _mapper_hook(self, async_mapping):
        if not async_mapping:
            return self.local_mapper

        system = self

        class _QueueHook:
            def process_keyframe(self, kid):
                system._queue.put(kid)

        return _QueueHook()

    def _mapping_loop(self):
        while self._running:
            try:
                kid = self._queue.get(timeout=0.05)
            except queue.Empty:
                continue
            self.local_mapper.process_keyframe(kid)

    # ------------------------------------------------------------------
    # frame entry points (reference: src/System.cc:148-330 Track*)
    # ------------------------------------------------------------------

    def track_rgbd(self, timestamp: float, gray: np.ndarray,
                   depth: np.ndarray, rgb: Optional[np.ndarray] = None):
        assert self.sensor == Sensor.RGBD
        with profiling.stage("track_rgbd"):
            if self.place_db is not None:
                self.place_db.maybe_refresh()
            if self.loop_closer is not None:
                # merge a finished background global BA (staged
                # write-back, reference: src/LoopClosing.cc:643-744)
                self.loop_closer.poll_background()
            return self.tracker.track_rgbd(timestamp, gray, depth, rgb=rgb)

    def track_monocular(self, timestamp: float, gray: np.ndarray):
        assert self.sensor == Sensor.MONOCULAR
        from .mono_init import track_monocular_frame

        with profiling.stage("track_monocular"):
            return track_monocular_frame(self, timestamp, gray)

    def track_stereo(self, timestamp: float, gray_left: np.ndarray,
                     gray_right: np.ndarray):
        assert self.sensor == Sensor.STEREO
        from . import frame as frame_mod

        with profiling.stage("track_stereo"):
            f = frame_mod.build_stereo_frame(self.cfg, gray_left,
                                             gray_right)
            return self.tracker.track_frame(timestamp, f)

    # ------------------------------------------------------------------
    # modes / control (reference: src/System.cc:160-192, 296-347)
    # ------------------------------------------------------------------

    def activate_localization_mode(self):
        self.tracker.only_tracking = True
        self.local_mapper.enabled = False

    def deactivate_localization_mode(self):
        self.tracker.only_tracking = False
        self.local_mapper.enabled = True

    def reset(self):
        self.tracker.reset()
        if self.place_db is not None:
            self.place_db.clear()

    def final_optimize(self, iters: int = 40, rounds: int = 2):
        """Offline post-processing polish: drain any background global
        BA, then run synchronous global BA to convergence on the final
        map. The reference's workflow evaluates trajectories saved
        after Shutdown (src/System.cc:332-347 + SaveTrajectory*); this
        is the TPU-native equivalent of that offline step — a few
        seconds of MXU time that takes the post-closure map from ~2.5
        to ~1.5 cm KF ATE (BA floor of the bench world: 0.5 cm).
        Call flush() first in async mode."""
        from ..optim.global_ba import run_global_ba

        if self.loop_closer is not None and \
                self.loop_closer.background_gba is not None:
            self.loop_closer.background_gba.wait(timeout=300.0)
            self.loop_closer.poll_background()
        lock = getattr(self._pipeline, "_map_lock", None)
        for _ in range(rounds):
            if lock is not None:
                with lock:
                    run_global_ba(self.cfg, self.map,
                                  fixed_kf=self.map.kf_origin,
                                  iters=iters)
            else:
                run_global_ba(self.cfg, self.map,
                              fixed_kf=self.map.kf_origin, iters=iters)

    def shutdown(self):
        if self._pipeline is not None:
            self._pipeline.shutdown()
        if self._worker is not None:
            self._running = False
            self._worker.join(timeout=5.0)
        if self.dense_mapper is not None:
            self.dense_mapper.finalize()

    @property
    def tracking_state(self) -> TrackingState:
        return self.tracker.state

    def profile_report(self) -> str:
        """Per-stage timing table (tracking / local mapping / loop
        closing / dense), the observability the reference lacks
        (SURVEY.md §5.1)."""
        return profiling.PROFILER.report()

    # ------------------------------------------------------------------
    # output (reference: src/System.cc:349-515)
    # ------------------------------------------------------------------

    def trajectory(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.tracker.trajectory()

    def save_trajectory_tum(self, path: str):
        ts, Twc = self.trajectory()
        traj_io.write_tum(path, ts, Twc)

    def save_keyframe_trajectory_tum(self, path: str):
        kfs = self.map.keyframe_ids()
        ts = self.map.kf_timestamp[kfs]
        mats = [self.map.kf_Twc(int(k)) for k in kfs]
        traj_io.write_tum(path, ts, mats)

    def save_trajectory_kitti(self, path: str):
        _, Twc = self.trajectory()
        traj_io.write_kitti(path, Twc)

    def save_map(self, path: str):
        from ..io.mapio import save_map

        save_map(path, self.map)

    def load_map(self, path: str):
        """Implements the resume the reference declares but leaves TODO
        (reference: include/System.h:114-116)."""
        from ..io.mapio import load_map

        load_map(path, self.map)
        if self.place_db is not None:
            self.place_db.rebuild()
