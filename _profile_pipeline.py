"""Profile the end-to-end async pipeline (bench section 1) and print the
per-stage host breakdown. Run on the real TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from orb_slam2_map_tpu.config import SystemConfig
from orb_slam2_map_tpu.io import evaluate
from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                            SyntheticWorld, sweep_trajectory)
from orb_slam2_map_tpu.slam import SLAMSystem, Sensor
from orb_slam2_map_tpu.utils import profiling

n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
world = SyntheticWorld()
cfg = SystemConfig(camera=world.cam)
Twc, ts = sweep_trajectory(n_frames)
seq = SyntheticRGBDSequence(world, Twc, ts)
frames = [seq[i] for i in range(len(seq))]

for trial in range(2):
    profiling.PROFILER.reset()
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False,
                      pipeline_depth=int(os.environ.get("PDEPTH", "12")))
    t0 = time.perf_counter()
    lat = []
    for t, gray, depth, rgb in frames:
        f0 = time.perf_counter()
        slam.track_rgbd_async(t, gray, depth)
        lat.append(time.perf_counter() - f0)
    t_submit = time.perf_counter() - t0
    slam.flush()
    wall = time.perf_counter() - t0
    ts_est, Twc_est = slam.trajectory()
    pos_est = np.asarray([T[:3, 3] for T in Twc_est])
    ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
    print(f"--- trial {trial}: {len(frames)/wall:.1f} fps "
          f"(submit loop {len(frames)/t_submit:.1f}), ate {ate*100:.3f} cm")
    lat = np.asarray(lat) * 1e3
    print(f"submit latency ms: mean {lat.mean():.2f} median "
          f"{np.median(lat):.2f} p95 {np.percentile(lat, 95):.2f} "
          f"max {lat.max():.2f}")
    print(profiling.PROFILER.report())
    slam.shutdown()
