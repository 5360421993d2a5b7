#!/usr/bin/env python
"""Benchmark: tracked frames/s/chip + ATE on a synthetic RGB-D sequence.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

- value = sustained throughput of the fused per-frame tracking step
  (ORB extraction + projection matching + 4x10 LM pose optimization as a
  single device program — the reference's per-frame hot path,
  SURVEY.md §3.2) at TUM resolution (640x480, 1000-feature budget).
- vs_baseline = value / 30 fps, the reference's real-time design point
  (Examples/RGB-D/TUM1.yaml:23 Camera.fps; README claims real-time).
- ate_cm = full-pipeline ATE RMSE vs ground truth on the synthetic
  sweep (north-star target <= 2 cm; no TUM image data exists in this
  environment, so the geometrically-exact synthetic world stands in).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    n_step_iters = int(os.environ.get("BENCH_STEP_ITERS", "30"))

    from orb_slam2_map_tpu.config import SystemConfig
    from orb_slam2_map_tpu.io import evaluate
    from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                                SyntheticWorld,
                                                sweep_trajectory)
    from orb_slam2_map_tpu.slam import SLAMSystem, Sensor

    world = SyntheticWorld()
    cfg = SystemConfig(camera=world.cam)
    Twc, ts = sweep_trajectory(n_frames)
    seq = SyntheticRGBDSequence(world, Twc, ts)
    frames = [seq[i] for i in range(len(seq))]

    # --- 1) full pipeline (asynchronous device-resident tracking):
    #         ATE + end-to-end wall-clock fps, measured on a warm second
    #         pass (first pass pays one-time jit compilation) ---
    ate = pipeline_fps = 0.0
    for _ in range(2):
        slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False)
        t0 = time.perf_counter()
        for t, gray, depth, rgb in frames:
            slam.track_rgbd_async(t, gray, depth)
        slam.flush()
        wall = time.perf_counter() - t0
        ts_est, Twc_est = slam.trajectory()
        pos_est = np.asarray([T[:3, 3] for T in Twc_est])
        ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
        pipeline_fps = len(frames) / wall
        slam.shutdown()

    # --- 2) fused tracking step: device throughput (frames/s/chip) ---
    import jax.numpy as jnp

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_step_iters):
        out = fn(*args)
    jax.block_until_ready(out)
    step_fps = n_step_iters / (time.perf_counter() - t0)

    result = {
        "metric": "synthetic RGB-D tracking (fused step) frames/s/chip",
        "value": round(float(step_fps), 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(float(step_fps) / 30.0, 3),
        "ate_cm": round(float(ate * 100), 3),
        "ate_ok": bool(ate * 100 <= 2.0),   # north-star gate (BASELINE.md)
        "pipeline_fps": round(float(pipeline_fps), 2),
        "frames": n_frames,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
