"""Diagnostic: per-correction ATE accounting on the loop-bearing orbit.

Runs the synchronous clean orbit (the test_background_gba scenario) with
instrumented loop closing: KF-pose ATE vs ground truth is computed
immediately before/after each loop correction, after the essential graph,
and after each GBA merge. Then computes the BA-optimum floor of the
world: KF poses initialized from GT -> 20-iter global BA -> ATE.

Usage: python _diag_orbit.py [n_frames] [noisy] [async]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))
import jax

jax.config.update("jax_platforms", os.environ.get("DIAG_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from conftest import small_config
from orb_slam2_map_tpu.io import evaluate
from orb_slam2_map_tpu.io.synthetic import (SensorNoiseModel,
                                            SyntheticRGBDSequence,
                                            SyntheticWorld,
                                            orbit_trajectory)
from orb_slam2_map_tpu.slam import SLAMSystem, Sensor
from orb_slam2_map_tpu.slam.loop_closing import LoopCloser

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 110
noisy = "noisy" in sys.argv
use_async = "async" in sys.argv

cfg = small_config()
world = SyntheticWorld(cam=cfg.camera)
Twc, ts = orbit_trajectory(n_frames, angle_range=2.4 * np.pi)
noise = SensorNoiseModel(seed=1) if noisy else None
seq = SyntheticRGBDSequence(world, Twc, ts, noise=noise)

gt_pos_of_ts = {float(t): Twc[i, :3, 3] for i, t in enumerate(ts)}


def kf_ate(m):
    kfs = m.keyframe_ids()
    est, gt = [], []
    for k in kfs:
        t = float(m.kf_timestamp[k])
        if t in gt_pos_of_ts:
            R, tt = m.kf_R[k], m.kf_t[k]
            est.append(-R.T @ tt)      # camera center
            gt.append(gt_pos_of_ts[t])
    est, gt = np.asarray(est), np.asarray(gt)
    s, R, t = evaluate.umeyama_alignment(est, gt)
    res = gt - (s * est @ R.T + t)
    return float(np.sqrt((res ** 2).sum(1).mean()))


events = []

orig_correct = LoopCloser._correct_loop
orig_essential = LoopCloser._optimize_essential_graph


def patched_correct(self, kid, loop_kf, S12, loop_points=None,
                    mkp=None, mmp=None):
    a0 = kf_ate(self.map)
    r = orig_correct(self, kid, loop_kf, S12, loop_points, mkp, mmp)
    a1 = kf_ate(self.map)
    events.append(("correct", kid, loop_kf, a0, a1))
    print(f"[diag] correct kid={kid} loop={loop_kf}: "
          f"KF-ATE {a0*100:.2f} -> {a1*100:.2f} cm", flush=True)
    return r


def patched_essential(self, kid, loop_kf, corrected, R_pre=None,
                      t_pre=None):
    a0 = kf_ate(self.map)
    r = orig_essential(self, kid, loop_kf, corrected, R_pre, t_pre)
    a1 = kf_ate(self.map)
    events.append(("essential", kid, loop_kf, a0, a1))
    print(f"[diag]   essential: KF-ATE {a0*100:.2f} -> {a1*100:.2f} cm",
          flush=True)
    return r


LoopCloser._correct_loop = patched_correct
LoopCloser._optimize_essential_graph = patched_essential

from orb_slam2_map_tpu.parallel.background import BackgroundGBA

orig_poll = BackgroundGBA.poll


def patched_poll(self):
    staged = self._staged is not None
    a0 = kf_ate(self.map) if staged else None
    r = orig_poll(self)
    if r:
        a1 = kf_ate(self.map)
        events.append(("gba_merge", -1, -1, a0, a1))
        print(f"[diag]   gba merge: KF-ATE {a0*100:.2f} -> {a1*100:.2f} cm",
              flush=True)
    return r


BackgroundGBA.poll = patched_poll

slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=True,
                  background_gba=True,
                  enable_dense_mapping=use_async,
                  pipeline_depth=8 if use_async else None,
                  max_keyframes=1024 if use_async else 128,
                  max_points=(1 << 17) if use_async else (1 << 15)) \
    if use_async else \
    SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=True,
               background_gba=True, max_keyframes=128, max_points=1 << 15)

n_lost = 0
import time

t0 = time.perf_counter()
for i in range(len(seq)):
    t, gray, depth, rgb = seq[i]
    if use_async:
        slam.track_rgbd_async(t, gray, depth, rgb=rgb)
    else:
        if slam.track_rgbd(t, gray, depth) is None:
            n_lost += 1
    if (i + 1) % 50 == 0:
        print(f"[diag] frame {i+1}/{n_frames} "
              f"({time.perf_counter()-t0:.0f}s) kfs={slam.map.n_keyframes()}"
              f" loops={slam.loop_closer.n_loops_closed}", flush=True)
if use_async:
    slam.flush()
lc = slam.loop_closer
if lc.background_gba is not None:
    lc.background_gba.wait(timeout=300.0)
    lc.poll_background()

ts_est, Twc_est = slam.trajectory()
pos_est = np.asarray([T[:3, 3] for T in Twc_est])
ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
print(f"\n[diag] FINAL: frames={len(ts_est)} lost={n_lost} "
      f"kfs={slam.map.n_keyframes()} loops={lc.n_loops_closed} "
      f"traj-ATE {ate*100:.2f} cm  KF-ATE {kf_ate(slam.map)*100:.2f} cm")

# ---- extra GBA rounds on the live final map: does more BA help? ----
from orb_slam2_map_tpu.optim.global_ba import run_global_ba

m = slam.map
for r in range(3):
    run_global_ba(cfg, m, fixed_kf=m.kf_origin, iters=20)
    print(f"[diag] live map + {20*(r+1)} extra GBA iters: "
          f"KF-ATE {kf_ate(m)*100:.3f} cm")

# ---- BA-optimum floor: GT-init poses AND re-map points consistently
#      (each point keeps its camera-frame coords w.r.t. its ref KF) ----
kfs = m.keyframe_ids()
R_old, t_old = m.kf_R.copy(), m.kf_t.copy()
for k in kfs:
    t = float(m.kf_timestamp[k])
    i = int(np.argmin(np.abs(ts - t)))
    T = Twc[i]
    m.kf_R[k] = T[:3, :3].T.astype(np.float32)
    m.kf_t[k] = (-T[:3, :3].T @ T[:3, 3]).astype(np.float32)
mids = m.point_ids()
ref = m.mp_first_kf[mids]
ok = (ref >= 0) & m.kf_exists[np.clip(ref, 0, None)]
mids, ref = mids[ok], ref[ok]
Xc = np.einsum("pij,pj->pi", R_old[ref], m.mp_pos[mids]) + t_old[ref]
Rwc = np.swapaxes(m.kf_R[ref], 1, 2)
m.mp_pos[mids] = np.einsum("pij,pj->pi", Rwc, Xc - m.kf_t[ref])
print(f"[diag] floor: KF-ATE after GT init {kf_ate(m)*100:.3f} cm")
for r in range(2):
    run_global_ba(cfg, m, fixed_kf=m.kf_origin, iters=20)
    print(f"[diag] floor: KF-ATE after GT-init + {20*(r+1)} GBA iters "
          f"{kf_ate(m)*100:.3f} cm")
if use_async:
    slam.shutdown()
