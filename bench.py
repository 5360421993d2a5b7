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

    n_frames = int(os.environ.get("BENCH_FRAMES", "240"))
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
    for trial in range(2):
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
        if trial == 0 and wall > 240.0:
            break   # degraded network tunnel: skip the warm pass

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

    # --- 3) loop-closure latency: Sim3 RANSAC + essential graph +
    #         20-iteration global BA on reference-scale problems ---
    loop_ms = _bench_loop_latency(cfg)

    # --- 4) dense point-cloud fusion throughput ---
    dense_pps = _bench_dense(cfg, frames[0])

    result = {
        "metric": "synthetic RGB-D tracking (fused step) frames/s/chip",
        "value": round(float(step_fps), 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(float(step_fps) / 30.0, 3),
        "ate_cm": round(float(ate * 100), 3),
        "ate_ok": bool(ate * 100 <= 2.0),   # north-star gate (BASELINE.md)
        "pipeline_fps": round(float(pipeline_fps), 2),
        "loop_closure_ms": round(float(loop_ms), 1),
        "dense_fusion_pts_per_s": round(float(dense_pps)),
        "frames": n_frames,
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(result))


def _bench_loop_latency(cfg) -> float:
    """Wall time of one loop closure's numeric core at reference scale
    (fr3/long_office-ish: ~200 KFs, 20k points): Sim3 RANSAC (300 iters)
    + essential-graph optimization + 20-iteration global BA
    (reference: src/LoopClosing.cc:232-583 + 643-744)."""
    import jax
    import jax.numpy as jnp

    from orb_slam2_map_tpu.geom import se3 as se3_mod
    from orb_slam2_map_tpu.optim import global_ba as gba
    from orb_slam2_map_tpu.optim import pose_graph, sim3_solver

    rng = np.random.default_rng(0)
    cam = cfg.camera

    # Sim3 RANSAC on 200 correspondences
    X1 = rng.uniform(-2, 2, (256, 3)).astype(np.float32)
    X1[:, 2] += 4.0
    X2 = (X1 + rng.normal(0, 0.01, X1.shape)).astype(np.float32)
    s2 = np.ones(256, dtype=np.float32)
    valid = np.ones(256, dtype=bool)

    def run_sim3():
        return sim3_solver.sim3_ransac(
            cam, jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(s2),
            jnp.asarray(s2), jnp.asarray(valid),
            jax.random.PRNGKey(0), fix_scale=True)

    # essential graph: 256-vertex ring + loop edge
    V = 256
    Rv = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    tv = rng.normal(0, 1.0, (V, 3)).astype(np.float32)
    ij = np.stack([np.arange(V - 1), np.arange(1, V)], 1).astype(np.int32)
    ij = np.concatenate([ij, [[V - 1, 0]]], 0).astype(np.int32)
    Rm = np.tile(np.eye(3, dtype=np.float32), (len(ij), 1, 1))
    tm = (tv[ij[:, 1]] - tv[ij[:, 0]]).astype(np.float32)
    sm = np.ones(len(ij), dtype=np.float32)
    ev = np.ones(len(ij), dtype=bool)
    vv = np.ones(V, dtype=bool)
    fixed = np.zeros(V, dtype=bool)
    fixed[0] = True

    def run_essential():
        return pose_graph.optimize_pose_graph(
            (jnp.asarray(Rv), jnp.asarray(tv), jnp.ones(V, jnp.float32)),
            jnp.asarray(ij), (jnp.asarray(Rm), jnp.asarray(tm),
                              jnp.asarray(sm)),
            jnp.asarray(ev), jnp.asarray(vv), jnp.asarray(fixed),
            None, fix_scale=True, iters=12)

    # global BA: 128 cameras x 16k points, 8 obs each
    K, Pn, opp = 128, 1 << 14, 8
    z = rng.uniform(1.0, 4.0, Pn)
    u = rng.uniform(20, cam.width - 20, Pn)
    v = rng.uniform(20, cam.height - 20, Pn)
    X = np.stack([(u - cam.cx) / cam.fx * z, (v - cam.cy) / cam.fy * z, z],
                 axis=1).astype(np.float32)
    pnt_idx = np.repeat(np.arange(Pn, dtype=np.int32), opp)
    cam_idx = rng.integers(0, K, len(pnt_idx)).astype(np.int32)
    Xc = X[pnt_idx]
    uv = np.stack([cam.fx * Xc[:, 0] / Xc[:, 2] + cam.cx,
                   cam.fy * Xc[:, 1] / Xc[:, 2] + cam.cy], 1).astype(np.float32)
    O = len(pnt_idx)
    prob = gba.GBAProblem(
        R=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))),
        t=jnp.asarray(rng.normal(0, 0.02, (K, 3)).astype(np.float32)),
        X=jnp.asarray(X),
        cam_free=jnp.asarray(np.asarray([False] + [True] * (K - 1))),
        cam_idx=jnp.asarray(cam_idx), pnt_idx=jnp.asarray(pnt_idx),
        uv=jnp.asarray(uv), ur=jnp.full(O, -1.0, dtype=jnp.float32),
        inv_sigma2=jnp.ones(O, dtype=jnp.float32),
        obs_valid=jnp.ones(O, dtype=bool))

    def run_gba():
        return gba.global_ba(cam, prob, 20)

    total = 0.0
    for fn in (run_sim3, run_essential, run_gba):
        out = fn()
        jax.block_until_ready(out)      # warm (compile)
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        total += time.perf_counter() - t0
    return total * 1000.0


def _bench_dense(cfg, frame0) -> float:
    """Dense cloud fusion throughput: unproject + voxel-downsample one
    KF's cloud (reference: src/PointCloudMap.cc:78-138 + :244-266)."""
    from orb_slam2_map_tpu.dense import pointcloud as pc

    t, gray, depth, rgb = frame0
    if rgb is None:
        rgb = np.stack([gray] * 3, axis=-1)
    depth, rgb = np.asarray(depth), np.asarray(rgb)
    xyz, col, valid = pc._unproject_cloud(cfg, depth, rgb, decimation=3)
    n_iters, n_pts = 5, int(np.asarray(valid).sum())
    t0 = time.perf_counter()
    for _ in range(n_iters):
        xyz2, col2, v2 = pc._unproject_cloud(cfg, depth, rgb, decimation=3)
        v2 = np.asarray(v2)
        pc.voxel_downsample(np.asarray(xyz2)[v2], np.asarray(col2)[v2],
                            cfg.dense.resolution)
    dt = time.perf_counter() - t0
    return n_pts * n_iters / dt


if __name__ == "__main__":
    main()
