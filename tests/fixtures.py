"""On-disk dataset fixtures: tiny TUM RGB-D and KITTI stereo sequences
rendered from the synthetic world, so the dataset drivers in apps/ can
be exercised end-to-end from real files (the reference's de-facto test
strategy is running its Examples binaries on TUM sequences,
Examples/RGB-D/rgbd_tum.cc)."""

import os

import numpy as np

from orb_slam2_map_tpu.geom.camera import PinholeCamera
from orb_slam2_map_tpu.io.synthetic import SyntheticWorld, sweep_trajectory
from orb_slam2_map_tpu.io.trajectory import write_tum


def _save_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def small_camera():
    return PinholeCamera(fx=258.0, fy=258.0, cx=159.5, cy=119.5,
                         width=320, height=240, bf=20.0, fps=30.0,
                         th_depth=50.0)


def make_tum_fixture(root: str, n_frames: int = 12):
    """Write a TUM-format sequence: rgb/, depth/ (uint16, factor 5000),
    associations.txt, groundtruth.txt, settings.yaml. Returns
    (root, association_path, groundtruth_path, settings_path)."""
    cam = small_camera()
    world = SyntheticWorld(cam=cam)
    Twc, ts = sweep_trajectory(n_frames)
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    assoc_lines = []
    for i in range(n_frames):
        gray, depth, rgb = world.render(Twc[i])
        rgb8 = np.clip(np.asarray(rgb), 0, 255).astype(np.uint8)
        if rgb8.ndim == 2:
            rgb8 = np.stack([rgb8] * 3, axis=-1)
        d16 = np.clip(np.asarray(depth) * 5000.0, 0, 65535).astype(np.uint16)
        t = ts[i]
        rname, dname = f"rgb/{t:.6f}.png", f"depth/{t:.6f}.png"
        _save_png(os.path.join(root, rname), rgb8)
        _save_png(os.path.join(root, dname), d16)
        assoc_lines.append(f"{t:.6f} {rname} {t:.6f} {dname}\n")
    assoc = os.path.join(root, "associations.txt")
    with open(assoc, "w") as f:
        f.writelines(assoc_lines)
    # rgb.txt for the monocular driver (mono_tum.cc LoadImages format)
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("# timestamp filename\n")
        f.writelines(line.split()[0] + " " + line.split()[1] + "\n"
                     for line in assoc_lines)
    gt = os.path.join(root, "groundtruth.txt")
    write_tum(gt, ts, list(Twc))
    settings = os.path.join(root, "settings.yaml")
    with open(settings, "w") as f:
        f.write(f"""%YAML:1.0
Camera.fx: {cam.fx}
Camera.fy: {cam.fy}
Camera.cx: {cam.cx}
Camera.cy: {cam.cy}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {cam.width}
Camera.height: {cam.height}
Camera.fps: {cam.fps}
Camera.bf: {cam.bf}
Camera.RGB: 1
ThDepth: {cam.th_depth}
DepthMapFactor: 5000.0
ORBextractor.nFeatures: 400
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    return root, assoc, gt, settings


def make_kitti_fixture(root: str, n_frames: int = 6):
    """Write a KITTI-format stereo sequence: image_0/, image_1/,
    times.txt, calib.txt. Returns (root, gt_poses [N, 3, 4])."""
    cam = small_camera()
    world = SyntheticWorld(cam=cam)
    Twc, ts = sweep_trajectory(n_frames)
    baseline = cam.bf / cam.fx
    os.makedirs(os.path.join(root, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(root, "image_1"), exist_ok=True)
    for i in range(n_frames):
        gl, _, _ = world.render(Twc[i])
        Twc_r = Twc[i].copy()
        Twc_r[:3, 3] += Twc[i][:3, :3] @ np.asarray([baseline, 0, 0])
        gr, _, _ = world.render(Twc_r)
        _save_png(os.path.join(root, "image_0", f"{i:06d}.png"),
                  np.clip(np.asarray(gl), 0, 255).astype(np.uint8))
        _save_png(os.path.join(root, "image_1", f"{i:06d}.png"),
                  np.clip(np.asarray(gr), 0, 255).astype(np.uint8))
    with open(os.path.join(root, "times.txt"), "w") as f:
        f.writelines(f"{t:.6e}\n" for t in ts)
    P0 = (f"{cam.fx:.6e} 0.000000e+00 {cam.cx:.6e} 0.000000e+00 "
          f"0.000000e+00 {cam.fy:.6e} {cam.cy:.6e} 0.000000e+00 "
          f"0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00")
    P1 = (f"{cam.fx:.6e} 0.000000e+00 {cam.cx:.6e} {-cam.bf:.6e} "
          f"0.000000e+00 {cam.fy:.6e} {cam.cy:.6e} 0.000000e+00 "
          f"0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00")
    with open(os.path.join(root, "calib.txt"), "w") as f:
        f.write(f"P0: {P0}\nP1: {P1}\nP2: {P0}\nP3: {P1}\n")
    return root, Twc
