"""Long-trajectory end-to-end run (KITTI-00-class, BASELINE config #3):
~1000 frames through the FULL async system — tracking, mapping thread,
dedicated loop-closing thread, background GBA — with one big loop.

Asserts the properties the reference sustains on multi-thousand-frame
sequences (reference: Examples/Stereo/stereo_kitti.cc): every frame
produces a pose, memory stays bounded, per-frame cost stays flat as the
map grows, and the loop closes.

Slow (minutes): gated behind ORB_TPU_LONG=1; the driver-run full-system
benchmark (bench.py, 600 noisy frames each round) covers the same path
continuously at TPU speed.
"""

import os
import time

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ORB_TPU_LONG") != "1",
    reason="long-trajectory e2e is minutes-long; set ORB_TPU_LONG=1")


class TestLongTrajectory:
    def test_thousand_frame_loop_run(self, small_world):
        from orb_slam2_map_tpu.io import evaluate
        from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                    orbit_trajectory)
        from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

        world, cfg = small_world
        n = 1000
        Twc, ts = orbit_trajectory(n, angle_range=2.3 * np.pi)
        seq = SyntheticRGBDSequence(world, Twc, ts)
        slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=True,
                          background_gba=True,
                          max_keyframes=1024, max_points=1 << 17)
        block_walls = []
        t0 = time.perf_counter()
        for i in range(n):
            t, gray, depth, rgb = seq[i]
            slam.track_rgbd_async(t, gray, depth)
            if (i + 1) % 100 == 0:
                block_walls.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
        slam.flush()

        ts_est, Twc_est = slam.trajectory()
        assert len(ts_est) >= 0.99 * n, \
            f"only {len(ts_est)}/{n} frames produced poses"
        assert slam.loop_closer.n_loops_closed >= 1, \
            "the revisit at 2.3pi must close a loop"

        pos_est = np.asarray([T[:3, 3] for T in Twc_est])
        ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
        assert ate < 0.10, f"post-loop ATE {ate*100:.1f}cm"

        # per-frame cost stays flat as the map grows: the last 100-frame
        # block costs at most 3x the cheapest warm block
        warm = block_walls[1:]
        assert warm[-1] < 3.0 * min(warm), \
            f"per-frame cost grew: blocks {np.round(warm, 1)}"

        # bounded memory: the SoA store at its configured capacity
        m = slam.map
        total = sum(v.nbytes for v in vars(m).values()
                    if isinstance(v, np.ndarray))
        assert total < 1 << 30, f"map store {total / 2**20:.0f} MB"
        assert m.n_keyframes() >= 20
        slam.shutdown()
