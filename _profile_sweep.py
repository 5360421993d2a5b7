"""Profile the noisy-sweep async pipeline on the real TPU: per-stage
profiler summary + per-pass fps/ATE. Warms the persistent compile cache
and the bench frame cache as a side effect.

Usage: python _profile_sweep.py [n_frames] [n_passes]
"""
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
                                            sweep_trajectory)
from orb_slam2_map_tpu.slam import SLAMSystem, Sensor
from orb_slam2_map_tpu.utils import profiling

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

world = SyntheticWorld()
cfg = SystemConfig(camera=world.cam)
Twc, ts = sweep_trajectory(n_frames)
seq = SyntheticRGBDSequence(world, Twc, ts, noise=SensorNoiseModel(seed=0))
T0 = time.perf_counter()
print(f"[{time.perf_counter()-T0:6.1f}s] rendering/loading frames",
      flush=True)
frames = _cached_frames("sweep_noisy_s0", seq, n_frames)

for trial in range(n_passes):
    tunnel = _tunnel_probe_ms()
    print(f"[{time.perf_counter()-T0:6.1f}s] pass {trial} "
          f"(tunnel {tunnel} ms)", flush=True)
    profiling.PROFILER.reset()
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
    t0 = time.perf_counter()
    for t, gray, depth, rgb in frames:
        slam.track_rgbd_async(t, gray, depth)
    slam.flush()
    wall = time.perf_counter() - t0
    ts_est, Twc_est = slam.trajectory()
    pos_est = np.asarray([T[:3, 3] for T in Twc_est])
    ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
    summ = profiling.PROFILER.summary()
    slam.shutdown()
    print(f"  fps={n_frames/wall:.2f} ate={ate*100:.2f}cm "
          f"wall={wall:.1f}s", flush=True)
    rows = sorted(summ.items(),
                  key=lambda kv: -kv[1]["mean_ms"] * kv[1]["count"])
    for k, v in rows[:24]:
        print(f"    {k:42s} n={v['count']:5d} mean={v['mean_ms']:8.2f}ms "
              f"max={v['max_ms']:8.1f}ms total={v['mean_ms']*v['count']/1000:7.2f}s",
              flush=True)
