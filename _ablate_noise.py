import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from orb_slam2_map_tpu.io import evaluate
from orb_slam2_map_tpu.io.synthetic import (SyntheticRGBDSequence,
                                            SyntheticWorld, sweep_trajectory,
                                            SensorNoiseModel)
from test_slam import small_config

cfg = small_config()
world = SyntheticWorld(cam=cfg.camera)
Twc, ts = sweep_trajectory(25)

variants = {
    "clean": None,
    "depth_only": SensorNoiseModel(read_noise=0, exposure_drift=0,
                                   motion_blur_px=0, seed=3),
    "read_noise": SensorNoiseModel(depth_sigma_base=0, depth_sigma_quad=0,
                                   depth_dropout=0, depth_factor=0,
                                   exposure_drift=0, motion_blur_px=0, seed=3),
    "exposure": SensorNoiseModel(depth_sigma_base=0, depth_sigma_quad=0,
                                 depth_dropout=0, depth_factor=0,
                                 read_noise=0, motion_blur_px=0, seed=3),
    "blur": SensorNoiseModel(depth_sigma_base=0, depth_sigma_quad=0,
                             depth_dropout=0, depth_factor=0,
                             read_noise=0, exposure_drift=0, seed=3),
    "full": SensorNoiseModel(seed=3),
}
from orb_slam2_map_tpu.slam import SLAMSystem, Sensor
for name, nm in variants.items():
    seq = SyntheticRGBDSequence(world, Twc, ts, noise=nm)
    slam = SLAMSystem(cfg, Sensor.RGBD, enable_loop_closing=False,
                      max_keyframes=64, max_points=1 << 14)
    n_lost = 0
    for i in range(len(seq)):
        t, gray, depth, rgb = seq[i]
        if slam.track_rgbd(t, gray, depth) is None:
            n_lost += 1
    ts_est, Twc_est = slam.trajectory()
    pos_est = np.asarray([T[:3, 3] for T in Twc_est])
    ate = evaluate.ate_rmse(ts_est, pos_est, ts, Twc[:, :3, 3])
    print(f"{name:12s} ate {ate*100:6.2f} cm  lost {n_lost}")
