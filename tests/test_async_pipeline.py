"""Asynchronous pipelined tracking: correctness vs the sync path.

The async pipeline (slam/async_pipeline.py) keeps the tracking
recurrence on device and supervises results with a few frames of lag;
these tests check it tracks the same synthetic sequences the sync path
does, builds an equivalent map, and recovers from an injected failure.
"""

import numpy as np
import pytest

from orb_slam2_map_tpu.io import evaluate
from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                            sweep_trajectory)


@pytest.fixture(scope="module")
def async_tracked(small_world):
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    world, cfg = small_world
    Twc, ts = sweep_trajectory(30)
    seq = SyntheticRGBDSequence(world, Twc, ts)
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False,
                      max_keyframes=64, max_points=1 << 14)
    for i in range(len(seq)):
        t, gray, depth, rgb = seq[i]
        slam.track_rgbd_async(t, gray, depth)
    slam.flush()
    return slam, Twc, ts


class TestAsyncPipeline:
    def test_all_frames_logged(self, async_tracked):
        slam, Twc, ts = async_tracked
        ts_est, _ = slam.trajectory()
        assert len(ts_est) == len(ts)

    def test_ate_at_target(self, async_tracked):
        slam, Twc, ts = async_tracked
        ts_est, Twc_est = slam.trajectory()
        pos_est = np.asarray([T[:3, 3] for T in Twc_est])
        ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
        assert ate < 0.02, f"ATE {ate*100:.2f}cm exceeds the 2cm target"

    def test_map_grows(self, async_tracked):
        slam, _, _ = async_tracked
        assert slam.map.n_keyframes() >= 1
        assert slam.map.n_points() > 200

    def test_loop_closes_on_dedicated_thread(self, small_world):
        """Loop closing runs on its OWN thread in the async pipeline
        (reference: src/LoopClosing.cc:58-102): while a closure's Sim3
        compute runs (artificially slowed here), frame submission keeps
        flowing — the map lock is held only for detection, the snapshot
        and the correction write-back."""
        import time

        from orb_slam2_map_tpu.io.synthetic import orbit_trajectory
        from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

        world, cfg = small_world
        # slower angular rate than the sync orbit test: the async device
        # carry has no per-frame reference-KF fallback, so fast rotation
        # triggers recovery resets that wipe the revisit map
        Twc, ts = orbit_trajectory(180, angle_range=2.4 * np.pi)
        seq = SyntheticRGBDSequence(world, Twc, ts)
        slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=True,
                          background_gba=True,
                          max_keyframes=192, max_points=1 << 15)
        lc = slam.loop_closer
        pipe = slam.pipeline
        assert pipe._loop_thread is not None, \
            "async pipeline must give loop closing a dedicated thread"

        windows = []
        orig = lc._compute_sim3

        def timed_compute(snap):
            t0 = time.perf_counter()
            res = orig(snap)
            windows.append((t0, time.perf_counter()))
            return res

        lc._compute_sim3 = timed_compute
        submits = []              # (end_time, blocked_duration, mode)
        for i in range(len(seq)):
            t, gray, depth, rgb = seq[i]
            s0 = time.perf_counter()
            slam.track_rgbd_async(t, gray, depth)
            submits.append((time.perf_counter(),
                            time.perf_counter() - s0, pipe._mode))
        slam.flush()
        assert lc.n_loops_closed >= 1, "orbit must close a loop"
        ts_est, _ = slam.trajectory()
        assert len(ts_est) >= len(seq) - 2

        # tracking must not stall for a closure: EITHER a frame was
        # accepted strictly inside a lock-free Sim3-compute window, OR
        # no async-mode submission ever blocked for 0.5 s — both prove
        # the closure ran off the tracking path
        overlapped = any(
            any(w[0] < se < w[1] for se, _, md in submits if md == "async")
            for w in windows)
        max_async_block = max(
            [d for _, d, md in submits if md == "async"], default=0.0)
        assert overlapped or max_async_block < 0.5, \
            (f"closure stalled tracking: max async submit block "
             f"{max_async_block:.2f}s, no overlap with compute windows")
        slam.shutdown()

    def test_failure_recovery(self, small_world):
        """Feed garbage frames mid-sequence: the pipeline must flag the
        failure, mark frames lost, relocalize/reset and keep running
        without deadlock (reference behavior: LOST -> Relocalization,
        src/Tracking.cc:1645-1806)."""
        from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

        world, cfg = small_world
        Twc, ts = sweep_trajectory(24)
        seq = SyntheticRGBDSequence(world, Twc, ts)
        slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False,
                          max_keyframes=64, max_points=1 << 14)
        rng = np.random.default_rng(0)
        H, W = cfg.camera.height, cfg.camera.width
        for i in range(len(seq)):
            t, gray, depth, rgb = seq[i]
            if 10 <= i < 14:   # blackout: featureless noise frames
                gray = rng.uniform(0, 2, (H, W)).astype(np.float32)
                depth = np.zeros((H, W), dtype=np.float32)
            slam.track_rgbd_async(t, gray, depth)
        slam.flush()
        ts_est, _ = slam.trajectory()
        # with <=5 KFs the lost tracker auto-resets (reference:
        # src/Tracking.cc:729-737), wiping the pre-blackout log; the
        # post-blackout frames must re-initialize and track cleanly
        assert len(ts_est) >= 9
        from orb_slam2_map_tpu.slam import TrackingState
        assert slam.tracker.state == TrackingState.OK
        slam.shutdown()
