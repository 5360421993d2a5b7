"""Sim3 match widening (reference: src/ORBmatcher.cc:1102-1326
SearchBySim3 + src/LoopClosing.cc:324,376-386 projection widen and the
>= 40 total-matches gate)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import small_config


def _project(cam, Xc):
    return np.stack([cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx,
                     cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy], axis=1)


def _sim3_pair(cfg, n=96, seed=0):
    """Two keyframes seeing the same points, related by a known Sim3."""
    cam = cfg.camera
    rng = np.random.default_rng(seed)
    # points in camera-1 frame, comfortably inside both frusta
    Xc1 = np.stack([rng.uniform(-0.5, 0.5, n),
                    rng.uniform(-0.35, 0.35, n),
                    rng.uniform(2.5, 3.5, n)], axis=1).astype(np.float32)
    ang = 0.05
    R12 = np.asarray([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]], np.float32)
    t12 = np.asarray([0.1, 0.0, 0.05], np.float32)
    s12 = 1.15
    # X_c1 = s12 R12 X_c2 + t12  =>  X_c2 = (1/s) R12^T (X_c1 - t12)
    Xc2 = ((Xc1 - t12) @ R12) / s12
    xy1 = _project(cam, Xc1).astype(np.float32)
    xy2 = _project(cam, Xc2).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
    d1 = np.linalg.norm(Xc1, axis=1).astype(np.float32)
    d2 = np.linalg.norm(Xc2, axis=1).astype(np.float32)
    return Xc1, Xc2, xy1, xy2, desc, d1, d2, (R12, t12, s12)


class TestSearchBySim3:
    def test_mutual_widening_recovers_unmatched(self):
        from orb_slam2_map_tpu.slam import mapping_kernels

        cfg = small_config()
        N = cfg.orb.max_keypoints
        n = 96
        Xc1, Xc2, xy1, xy2, desc, d1, d2, (R12, t12, s12) = \
            _sim3_pair(cfg, n)

        def pad(a, fill=0.0):
            out = np.full((N,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        has = np.zeros(N, bool)
        has[:n] = True
        # pretend the first 20 pairs are already matched (RANSAC inliers);
        # widening must recover a large share of the rest
        already = np.zeros(N, bool)
        already[:20] = True
        lvl = np.zeros(N, np.int32)
        sf_last = cfg.orb.scale_factors[-1]

        res = mapping_kernels.search_by_sim3(
            cfg, jnp.asarray(R12), jnp.asarray(t12),
            jnp.asarray(np.float32(s12)),
            jnp.asarray(pad(Xc1)), jnp.asarray(has), jnp.asarray(pad(desc)),
            jnp.asarray(lvl), jnp.asarray(pad(d2 / sf_last)),
            jnp.asarray(pad(d2, 1.0)), jnp.asarray(pad(xy1)),
            jnp.asarray(already),
            jnp.asarray(pad(Xc2)), jnp.asarray(has), jnp.asarray(pad(desc)),
            jnp.asarray(lvl), jnp.asarray(pad(d1 / sf_last)),
            jnp.asarray(pad(d1, 1.0)), jnp.asarray(pad(xy2)),
            jnp.asarray(already))
        m12 = np.asarray(res.match12)
        ok = np.asarray(res.ok)
        # already-matched rows are untouched
        assert not ok[:20].any()
        # the bulk of the remaining pairs is recovered, mutually & exactly
        recovered = np.nonzero(ok[:n])[0]
        assert len(recovered) >= 0.8 * (n - 20)
        np.testing.assert_array_equal(m12[recovered], recovered)

    def test_wrong_sim3_yields_no_matches(self):
        from orb_slam2_map_tpu.slam import mapping_kernels

        cfg = small_config()
        N = cfg.orb.max_keypoints
        n = 96
        Xc1, Xc2, xy1, xy2, desc, d1, d2, _ = _sim3_pair(cfg, n)
        # grossly wrong hypothesis: 180-degree rotation
        R_bad = np.diag([-1.0, 1.0, -1.0]).astype(np.float32)
        t_bad = np.zeros(3, np.float32)

        def pad(a, fill=0.0):
            out = np.full((N,) + a.shape[1:], fill, a.dtype)
            out[:n] = a
            return out

        has = np.zeros(N, bool)
        has[:n] = True
        lvl = np.zeros(N, np.int32)
        sf_last = cfg.orb.scale_factors[-1]
        res = mapping_kernels.search_by_sim3(
            cfg, jnp.asarray(R_bad), jnp.asarray(t_bad),
            jnp.asarray(np.float32(1.0)),
            jnp.asarray(pad(Xc1)), jnp.asarray(has), jnp.asarray(pad(desc)),
            jnp.asarray(lvl), jnp.asarray(pad(d2 / sf_last)),
            jnp.asarray(pad(d2, 1.0)), jnp.asarray(pad(xy1)),
            jnp.asarray(np.zeros(N, bool)),
            jnp.asarray(pad(Xc2)), jnp.asarray(has), jnp.asarray(pad(desc)),
            jnp.asarray(lvl), jnp.asarray(pad(d1 / sf_last)),
            jnp.asarray(pad(d1, 1.0)), jnp.asarray(pad(xy2)),
            jnp.asarray(np.zeros(N, bool)))
        assert int(np.asarray(res.ok).sum()) == 0


class TestSim3PadTruncationLogging:
    def test_ransac_pad_overflow_is_counted(self):
        """The fixed 256-pad for Sim3 RANSAC correspondences must COUNT
        and log overflow instead of silently dropping matches
        (no-silent-caps; the pads are slam/loop_closing.py
        SIM3_RANSAC_PAD / SIM3_OPT_PAD)."""
        from orb_slam2_map_tpu.slam.loop_closing import LoopCloser
        from orb_slam2_map_tpu.slam.mapstore import MapStore

        cfg = small_config()
        cam = cfg.camera
        N = 512
        n = 300            # > SIM3_RANSAC_PAD == 256 shared observations
        rng = np.random.default_rng(0)
        m = MapStore(max_keyframes=4, max_points=1024, kp_capacity=N)
        mids = m.alloc_points(n)
        X = np.stack([rng.uniform(-0.5, 0.5, n),
                      rng.uniform(-0.35, 0.35, n),
                      rng.uniform(2.5, 3.5, n)], axis=1).astype(np.float32)
        m.mp_pos[mids] = X
        m.mp_min_dist[mids] = 0.1
        m.mp_max_dist[mids] = 50.0
        desc = rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)
        for k, t in ((0, np.zeros(3, np.float32)),
                     (1, np.asarray([0.05, 0, 0], np.float32))):
            m.kf_exists[k] = True
            m.kf_t[k] = t
            m.kf_desc[k, :n] = desc
            m.kf_kp_valid[k, :n] = True
            m.kf_obs[k, :n] = mids
            Xc = X + t
            m.kf_xy[k, :n, 0] = cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx
            m.kf_xy[k, :n, 1] = cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy
        m._next_kf = 2

        lc = LoopCloser(cfg, m, None, fix_scale=True,
                        run_global_ba=False)
        snap = lc._snapshot_pair(0, 1)
        lc._compute_sim3(snap)
        assert lc.n_ransac_pad_truncations >= 1, \
            "300 BoW matches above the 256 pad must bump the counter"


class TestTotalMatchGate:
    def test_min_total_matches_config_is_live(self):
        """The >= 40 gate (reference: src/LoopClosing.cc:376-386) must be
        read from config: with an impossibly high threshold no loop can
        be accepted even when Sim3 estimation succeeds."""
        from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                    orbit_trajectory)
        from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

        import dataclasses

        cfg = small_config()
        cfg = dataclasses.replace(
            cfg, loop_closing=dataclasses.replace(
                cfg.loop_closing, sim3_min_total_matches=10 ** 6))
        Twc, ts = orbit_trajectory(110, angle_range=2.4 * np.pi)
        seq = SyntheticRGBDSequence(
            __import__("orb_slam2_map_tpu.io.synthetic",
                       fromlist=["SyntheticWorld"]).SyntheticWorld(
                           cam=cfg.camera), Twc, ts)
        slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=True,
                          max_keyframes=128, max_points=1 << 15)
        for i in range(len(seq)):
            t, gray, depth, rgb = seq[i]
            slam.track_rgbd(t, gray, depth)
        assert slam.loop_closer.n_loops_closed == 0
