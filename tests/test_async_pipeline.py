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

        import threading

        # during each Sim3 hypothesis compute, a probe thread must be
        # able to take the map lock — the deterministic form of "the
        # expensive closure stage does not block tracking/mapping"
        # (wall-clock stall bounds are meaningless on a 2-core CI host
        # where all threads contend for the same cores)
        lock_free = []
        orig = lc._compute_sim3

        def probing_compute(snap):
            got = {}

            def probe():
                ok = pipe._map_lock.acquire(timeout=30.0)
                if ok:
                    pipe._map_lock.release()
                got["ok"] = ok

            th = threading.Thread(target=probe, daemon=True)
            th.start()
            res = orig(snap)
            th.join(timeout=60.0)
            lock_free.append(got.get("ok", False))
            return res

        lc._compute_sim3 = probing_compute
        for i in range(len(seq)):
            t, gray, depth, rgb = seq[i]
            slam.track_rgbd_async(t, gray, depth)
        slam.flush()
        assert lc.n_loops_closed >= 1, "orbit must close a loop"
        ts_est, _ = slam.trajectory()
        assert len(ts_est) >= len(seq) - 2
        assert lock_free and all(lock_free), \
            "map lock was unavailable during a Sim3 hypothesis compute"
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
