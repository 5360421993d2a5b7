"""Instrumented full-system bench pass on the real TPU: reproduces
_bench_full_system with per-correction ATE accounting, recovery logging,
and a profiler dump. Usage: python _diag_full.py [n_full]"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _cached_frames, _tunnel_probe_ms
from orb_slam2_map_tpu.config import SystemConfig
from orb_slam2_map_tpu.io import evaluate
from orb_slam2_map_tpu.io.synthetic import (SensorNoiseModel,
                                            SyntheticRGBDSequence,
                                            SyntheticWorld,
                                            orbit_trajectory)
from orb_slam2_map_tpu.slam import SLAMSystem, Sensor
from orb_slam2_map_tpu.slam.loop_closing import LoopCloser
from orb_slam2_map_tpu.slam.async_pipeline import AsyncRGBDPipeline
from orb_slam2_map_tpu.parallel.background import BackgroundGBA
from orb_slam2_map_tpu.utils import profiling

n_full = int(sys.argv[1]) if len(sys.argv) > 1 else 600
world = SyntheticWorld()
cfg = SystemConfig(camera=world.cam)
Twc, ts = orbit_trajectory(n_full, angle_range=2.4 * np.pi)
seq = SyntheticRGBDSequence(world, Twc, ts, noise=SensorNoiseModel(seed=1))
frames = _cached_frames("orbit_noisy_s1", seq, n_full)

gt_pos_of_ts = {float(t): Twc[i, :3, 3] for i, t in enumerate(ts)}


def kf_ate(m):
    kfs = m.keyframe_ids()
    est, gt = [], []
    for k in kfs:
        t = float(m.kf_timestamp[k])
        if t in gt_pos_of_ts:
            R, tt = m.kf_R[k], m.kf_t[k]
            est.append(-R.T @ tt)
            gt.append(gt_pos_of_ts[t])
    if len(est) < 3:
        return float("nan")
    est, gt = np.asarray(est), np.asarray(gt)
    s, R, t = evaluate.umeyama_alignment(est, gt)
    res = gt - (s * est @ R.T + t)
    return float(np.sqrt((res ** 2).sum(1).mean()))


def log(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


orig_correct = LoopCloser._correct_loop
orig_essential = LoopCloser._optimize_essential_graph
orig_poll = BackgroundGBA.poll
orig_recover = AsyncRGBDPipeline._recover


def patched_correct(self, kid, loop_kf, S12, loop_points=None,
                    mkp=None, mmp=None):
    a0 = kf_ate(self.map)
    t0 = time.perf_counter()
    r = orig_correct(self, kid, loop_kf, S12, loop_points, mkp, mmp)
    log(f"correct kid={kid} loop={loop_kf}: KF-ATE {a0*100:.2f} -> "
        f"{kf_ate(self.map)*100:.2f} cm ({time.perf_counter()-t0:.2f}s)")
    return r


def patched_essential(self, kid, loop_kf, corrected, R_pre=None,
                      t_pre=None):
    a0 = kf_ate(self.map)
    t0 = time.perf_counter()
    r = orig_essential(self, kid, loop_kf, corrected, R_pre, t_pre)
    log(f"  essential: KF-ATE {a0*100:.2f} -> {kf_ate(self.map)*100:.2f} "
        f"cm ({time.perf_counter()-t0:.2f}s)")
    return r


def patched_poll(self):
    staged = self._staged is not None
    a0 = kf_ate(self.map) if staged else None
    r = orig_poll(self)
    if r:
        log(f"  gba merge: KF-ATE {a0*100:.2f} -> "
            f"{kf_ate(self.map)*100:.2f} cm")
    return r


def patched_recover(self):
    log(f"RECOVERY at failed_at={self._failed_at} "
        f"frame_id={self.tracker.frame_id}")
    t0 = time.perf_counter()
    r = orig_recover(self)
    log(f"  recovery done ({time.perf_counter()-t0:.2f}s) "
        f"state={self.tracker.state}")
    return r


LoopCloser._correct_loop = patched_correct
LoopCloser._optimize_essential_graph = patched_essential
BackgroundGBA.poll = patched_poll
AsyncRGBDPipeline._recover = patched_recover

T0 = time.perf_counter()
log(f"tunnel probe {_tunnel_probe_ms()} ms")
profiling.PROFILER.reset()
slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=True,
                  background_gba=True, enable_dense_mapping=True,
                  pipeline_depth=8,
                  max_keyframes=1024, max_points=1 << 17)
budget = 1.0 / 30.0
stalls = []
t0 = time.perf_counter()
for i, (t, gray, depth, rgb) in enumerate(frames):
    s0 = time.perf_counter()
    slam.track_rgbd_async(t, gray, depth, rgb=rgb)
    stalls.append(time.perf_counter() - s0 > budget)
    if (i + 1) % 100 == 0:
        log(f"frame {i+1}/{n_full} kfs={slam.map.n_keyframes()} "
            f"loops={slam.loop_closer.n_loops_closed} "
            f"KF-ATE {kf_ate(slam.map)*100:.2f} cm")
slam.flush()
wall = time.perf_counter() - t0
lc = slam.loop_closer
if lc is not None and lc.background_gba is not None:
    lc.background_gba.wait(timeout=120.0)
    lc.poll_background()
ts_est, Twc_est = slam.trajectory()
pos_est = np.asarray([T[:3, 3] for T in Twc_est])
ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])

# per-frame error distribution after final alignment
ia, ib = evaluate.associate(ts_est, ts)
s, Ra, ta = evaluate.umeyama_alignment(pos_est[ia], Twc[ib, :3, 3])
err = np.linalg.norm(Twc[ib, :3, 3] - (s * pos_est[ia] @ Ra.T + ta),
                     axis=1)
worst = np.argsort(-err)[:12]
log(f"FINAL: fps {n_full/wall:.2f} frames={len(ts_est)} "
    f"kfs={slam.map.n_keyframes()} loops={lc.n_loops_closed} "
    f"traj-ATE {ate*100:.2f} cm KF-ATE {kf_ate(slam.map)*100:.2f} cm")
log(f"per-frame err cm: p50 {np.percentile(err,50)*100:.2f} "
    f"p90 {np.percentile(err,90)*100:.2f} p99 "
    f"{np.percentile(err,99)*100:.2f} max {err.max()*100:.2f}")
log(f"worst frames (ts): {[round(float(ts_est[ia[w]]),2) for w in worst]}")
max_stall = run = 0
for sl in stalls:
    run = run + 1 if sl else 0
    max_stall = max(max_stall, run)
log(f"max_stall {max_stall}")

# --- refinement postmortem: per-frame inlier counts + path taken for
#     the worst frames ---
tr = slam.tracker
ts_raw, Twc_raw = tr.trajectory(refine=False)
pos_raw = np.asarray([T[:3, 3] for T in Twc_raw])
s2, R2, t2 = evaluate.umeyama_alignment(pos_raw[ia], Twc[ib, :3, 3])
err_raw = np.linalg.norm(Twc[ib, :3, 3] -
                         (s2 * pos_raw[ia] @ R2.T + t2), axis=1)
log(f"UNREFINED traj ATE {np.sqrt((err_raw**2).mean())*100:.2f} cm")
# recompute refinement capture of inlier counts
import orb_slam2_map_tpu.slam.tracking as trk
orig_interp = trk._se3_interp
interp_used = set()
def count_interp(Ta, Tb, w):
    interp_used.add(len(interp_used))
    return orig_interp(Ta, Tb, w)
ninl_rec = {}
orig_jit = trk._refine_batch_jit
def capture_jit(cam):
    fn = orig_jit(cam)
    def wrapper(*args):
        res = fn(*args)
        ninl_rec["n"] = np.asarray(res.n_inliers)
        return res
    return wrapper
trk._refine_batch_jit = capture_jit
ts_r, Twc_r = tr.trajectory(refine=True)
trk._refine_batch_jit = orig_jit
n_inl = ninl_rec.get("n")
if n_inl is not None:
    logs_ok = [l for l in tr.logs if not l.lost]
    m = slam.map
    cam = cfg.camera
    for w in worst[:6]:
        fi = ia[w]
        l = logs_ok[fi]
        extra = ""
        if l.obs is not None:
            mids, uv_o, ur_o, is2_o = l.obs
            mids = m.mp_redirect[np.clip(mids, 0, m.M - 1)]
            alive = m.mp_exists[mids]
            j = int(np.argmin(np.abs(ts - l.timestamp)))
            Tcw_gt = np.linalg.inv(Twc[j])
            Xc = m.mp_pos[mids[alive]] @ Tcw_gt[:3, :3].T + Tcw_gt[:3, 3]
            z = np.maximum(Xc[:, 2], 1e-6)
            u = cam.fx * Xc[:, 0] / z + cam.cx
            v = cam.fy * Xc[:, 1] / z + cam.cy
            r = np.hypot(u - uv_o[alive, 0], v - uv_o[alive, 1])
            extra = (f" gt-reproj px: med {np.median(r):.1f} "
                     f"p90 {np.percentile(r, 90):.1f} n={alive.sum()}")
        log(f"  worst ts={ts_est[fi]:.2f} err={err[w]*100:.1f}cm "
            f"refine_inliers={int(n_inl[fi])}{extra}")
summ = profiling.PROFILER.summary()
for k in sorted(summ):
    v = summ[k]
    print(f"    {k:40s} n={v['count']:5.0f} mean={v['mean_ms']:8.2f} "
          f"max={v['max_ms']:9.2f}", flush=True)
slam.shutdown()
