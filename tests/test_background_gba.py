"""Background global BA: staged write-back + spanning-tree correction
(reference: src/LoopClosing.cc:643-744, mbStopGBA :412-421)."""

import time

import numpy as np
import pytest

from orb_slam2_map_tpu.io import evaluate
from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                            orbit_trajectory,
                                            sweep_trajectory)


def _build_small_map(small_world, n_frames=16):
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    world, cfg = small_world
    Twc, ts = sweep_trajectory(n_frames)
    seq = SyntheticRGBDSequence(world, Twc, ts)
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False,
                      max_keyframes=64, max_points=1 << 14)
    for i in range(len(seq)):
        t, gray, depth, rgb = seq[i]
        slam.track_rgbd(t, gray, depth)
    return slam


class TestBackgroundGBA:
    def test_staged_merge_and_tree_correction(self, small_world):
        """Launch GBA, insert a keyframe while it runs, poll: snapshot
        KFs get optimized poses; the late KF is corrected through the
        spanning tree so its RELATIVE pose to its parent is preserved."""
        from orb_slam2_map_tpu.parallel.background import BackgroundGBA

        world, cfg = small_world
        slam = _build_small_map(small_world)
        m = slam.map
        assert m.n_keyframes() >= 2

        bgba = BackgroundGBA(cfg, m)
        assert bgba.launch(iters=10)

        # add a keyframe "during" the run: clone the last KF, perturbed
        parent = int(m.keyframe_ids()[-1])
        kid = m.alloc_keyframe()
        m.kf_R[kid] = m.kf_R[parent].copy()
        m.kf_t[kid] = m.kf_t[parent] + np.asarray([0.05, 0, 0],
                                                  np.float32)
        m.parent[kid] = parent
        T_child = np.eye(4, dtype=np.float32)
        T_child[:3, :3] = m.kf_R[kid]
        T_child[:3, 3] = m.kf_t[kid]
        T_parent = np.eye(4, dtype=np.float32)
        T_parent[:3, :3] = m.kf_R[parent]
        T_parent[:3, 3] = m.kf_t[parent]
        rel_before = T_child @ np.linalg.inv(T_parent)

        bgba.wait(timeout=120.0)
        assert not bgba.running()
        assert bgba.poll()

        T_child2 = np.eye(4, dtype=np.float32)
        T_child2[:3, :3] = m.kf_R[kid]
        T_child2[:3, 3] = m.kf_t[kid]
        T_parent2 = np.eye(4, dtype=np.float32)
        T_parent2[:3, :3] = m.kf_R[parent]
        T_parent2[:3, 3] = m.kf_t[parent]
        rel_after = T_child2 @ np.linalg.inv(T_parent2)
        np.testing.assert_allclose(rel_after, rel_before, atol=1e-4)

    def test_abort(self, small_world):
        from orb_slam2_map_tpu.parallel.background import BackgroundGBA

        world, cfg = small_world
        slam = _build_small_map(small_world)
        bgba = BackgroundGBA(cfg, slam.map)
        assert bgba.launch(iters=1000)   # long run
        bgba.abort()
        bgba.wait(timeout=120.0)
        assert not bgba.running()
        # aborted runs stage nothing (reference drops the stale GBA)
        assert not bgba.poll()


class TestLoopClosureEndToEnd:
    def test_orbit_loop_closes_while_tracking(self, small_world):
        """Drive a revisiting orbit with loop closing + BACKGROUND GBA:
        the loop must be detected and corrected while tracking keeps
        running, the GBA result staged and merged via poll, and the
        trajectory must stay accurate (reference CorrectLoop + the
        concurrent RunGlobalBundleAdjustment thread,
        src/LoopClosing.cc:403-744)."""
        from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

        world, cfg = small_world
        Twc, ts = orbit_trajectory(110, angle_range=2.4 * np.pi)
        seq = SyntheticRGBDSequence(world, Twc, ts)
        slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=True,
                          background_gba=True,
                          max_keyframes=128, max_points=1 << 15)
        n_lost = 0
        for i in range(len(seq)):
            t, gray, depth, rgb = seq[i]
            if slam.track_rgbd(t, gray, depth) is None:
                n_lost += 1
        lc = slam.loop_closer
        assert lc.n_loops_closed >= 1, "revisit orbit must close a loop"
        # drain + merge the background GBA (normally merged by the next
        # tracked frame's poll)
        assert lc.background_gba is not None
        lc.background_gba.wait(timeout=300.0)
        merged = lc.poll_background()
        assert merged or not lc.background_gba.running()
        ts_est, Twc_est = slam.trajectory()
        # the frame tracked concurrently with the correction may miss
        # (the map moves under it); anything more means a regression
        assert n_lost <= 2
        assert len(ts_est) >= len(ts) - 2
        pos_est = np.asarray([T[:3, 3] for T in Twc_est])
        ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
        # r5: measured 1.67 cm on this scenario (BA-optimum floor of the
        # orbit world: 0.76 cm KF RMSE, _diag_orbit.py). Two r5 fixes
        # brought this from ~5 cm (and the r4 gate of 16 cm): tracker
        # pose re-basing on loop corrections (Tracker.apply_map_transform)
        # and the background GBA actually converging (plateau 1e-4 ->
        # 1e-6, 60 iters). 4 cm leaves threading-schedule variance.
        assert ate < 0.04, f"orbit ATE {ate*100:.1f}cm"
