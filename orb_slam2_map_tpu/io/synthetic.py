"""Synthetic RGB-D world: a ray-cast textured box room with ground truth.

The evaluation environment ships no TUM/KITTI image data, so integration
tests and the benchmark run on this generator: a camera moving inside a
textured box, rendered analytically (plane intersection per pixel), which
yields *geometrically exact* RGB + depth + ground-truth trajectories. It
plays the role of the reference's dataset fixtures
(reference: Examples/RGB-D/associations/*, SURVEY.md §4.2) while also
providing ground truth for built-in ATE evaluation.

Rendering is a jitted JAX program (one fused elementwise pass over pixels,
TPU-friendly), so long benchmark sequences are cheap to produce on device.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geom.camera import PinholeCamera


def synthetic_camera(width: int = 640, height: int = 480) -> PinholeCamera:
    """Distortion-free TUM-like intrinsics for synthetic sequences."""
    return PinholeCamera(
        fx=517.3, fy=516.5, cx=(width - 1) / 2.0, cy=(height - 1) / 2.0,
        width=width, height=height, bf=40.0, fps=30.0, th_depth=50.0,
    )


def _make_textures(key, n_faces: int, coarse: int, fine: int):
    k1, k2, k3 = jax.random.split(key, 3)
    coarse_tex = jax.random.uniform(k1, (n_faces, coarse, coarse, 3))
    fine_tex = jax.random.uniform(k2, (n_faces, fine, fine, 3))
    # A sparse set of bright blobs adds strong isolated corners.
    blob_tex = (jax.random.uniform(k3, (n_faces, fine, fine, 1)) > 0.985).astype(
        jnp.float32
    )
    return coarse_tex, fine_tex, blob_tex


class SyntheticWorld:
    """Textured axis-aligned box room [0,Lx]x[0,Ly]x[0,Lz], y-up.

    render(Twc) -> (gray f32 [H,W] in [0,255], depth f32 [H,W] meters,
    rgb u8 [H,W,3]).
    """

    def __init__(self, cam: Optional[PinholeCamera] = None,
                 size=(6.0, 3.0, 6.0), seed: int = 0,
                 coarse_texels_per_m: float = 8.0,
                 fine_texels_per_m: float = 40.0):
        self.cam = cam or synthetic_camera()
        self.size = np.asarray(size, dtype=np.float32)
        key = jax.random.PRNGKey(seed)
        # 256 texels tile; sampled with wraparound at the chosen densities.
        self.coarse_tex, self.fine_tex, self.blob_tex = _make_textures(
            key, 6, 256, 512
        )
        self.coarse_scale = coarse_texels_per_m
        self.fine_scale = fine_texels_per_m
        self._render = jax.jit(functools.partial(_render_box,
                                                 cam=self.cam,
                                                 size=tuple(float(s) for s in size)))

    def render(self, Twc: np.ndarray):
        gray, depth, rgb = self._render(
            jnp.asarray(Twc, dtype=jnp.float32),
            self.coarse_tex, self.fine_tex, self.blob_tex,
            self.coarse_scale, self.fine_scale,
        )
        return (np.asarray(gray), np.asarray(depth),
                np.asarray(rgb))


def _render_box(Twc, coarse_tex, fine_tex, blob_tex, coarse_scale, fine_scale,
                *, cam: PinholeCamera, size):
    H, W = cam.height, cam.width
    Lx, Ly, Lz = size
    R = Twc[:3, :3]
    o = Twc[:3, 3]

    u = jnp.arange(W, dtype=jnp.float32)[None, :]
    v = jnp.arange(H, dtype=jnp.float32)[:, None]
    dx = (u - cam.cx) / cam.fx
    dy = (v - cam.cy) / cam.fy
    dx = jnp.broadcast_to(dx, (H, W))
    dy = jnp.broadcast_to(dy, (H, W))
    ones = jnp.ones((H, W), dtype=jnp.float32)
    d_cam = jnp.stack([dx, dy, ones], axis=-1)            # [H,W,3], z=1
    d_world = jnp.einsum("ij,hwj->hwi", R, d_cam)          # [H,W,3]

    L = (float(Lx), float(Ly), float(Lz))
    eps = 1e-6
    best_t = jnp.full((H, W), 1e9, dtype=jnp.float32)
    best_face = jnp.zeros((H, W), dtype=jnp.int32)

    for axis in range(3):
        d_a = d_world[..., axis]
        safe_d = jnp.where(jnp.abs(d_a) < eps, eps, d_a)
        for side, plane in ((0, 0.0), (1, L[axis])):
            t = (plane - o[axis]) / safe_d
            hit = o[None, None, :] + t[..., None] * d_world
            oth = [a for a in range(3) if a != axis]
            inside = (
                (t > 1e-3)
                & (hit[..., oth[0]] >= -1e-3) & (hit[..., oth[0]] <= L[oth[0]] + 1e-3)
                & (hit[..., oth[1]] >= -1e-3) & (hit[..., oth[1]] <= L[oth[1]] + 1e-3)
            )
            t_valid = jnp.where(inside, t, 1e9)
            face_id = axis * 2 + side
            update = t_valid < best_t
            best_t = jnp.where(update, t_valid, best_t)
            best_face = jnp.where(update, face_id, best_face)

    # depth along the optical axis = t (ray z-component in camera frame is 1)
    depth = jnp.where(best_t < 1e8, best_t, 0.0)
    hit = o[None, None, :] + best_t[..., None] * d_world

    # face-local 2D coords: the two non-normal axes
    axis_of_face = best_face // 2
    coords = []
    for a in range(3):
        oth = [b for b in range(3) if b != a]
        coords.append(jnp.stack([hit[..., oth[0]], hit[..., oth[1]]], axis=-1))
    uv_face = jnp.where(
        (axis_of_face == 0)[..., None], coords[0],
        jnp.where((axis_of_face == 1)[..., None], coords[1], coords[2]),
    )

    def sample(tex, scale, rot_per_face):
        """Bilinear texture sample with a per-face lattice rotation.

        Nearest sampling makes corner positions snap coherently with
        viewpoint (a whole-lattice sub-pixel bias no real camera has —
        lenses low-pass); bilinear keeps edges sharp at texel scale but
        sub-pixel smooth. The rotation de-correlates the corner lattices
        across faces so periodic-aliasing matches can't gang up."""
        n = tex.shape[1]
        ca = jnp.cos(rot_per_face)[best_face]
        sa = jnp.sin(rot_per_face)[best_face]
        u0 = uv_face[..., 0] * scale
        v0 = uv_face[..., 1] * scale
        ur_ = ca * u0 - sa * v0
        vr_ = sa * u0 + ca * v0
        u_f = jnp.floor(ur_)
        v_f = jnp.floor(vr_)
        wu = (ur_ - u_f)[..., None]
        wv = (vr_ - v_f)[..., None]
        iu0 = jnp.mod(u_f.astype(jnp.int32), n)
        iv0 = jnp.mod(v_f.astype(jnp.int32), n)
        iu1 = jnp.mod(iu0 + 1, n)
        iv1 = jnp.mod(iv0 + 1, n)
        t00 = tex[best_face, iu0, iv0]
        t01 = tex[best_face, iu0, iv1]
        t10 = tex[best_face, iu1, iv0]
        t11 = tex[best_face, iu1, iv1]
        return ((1 - wu) * (1 - wv) * t00 + (1 - wu) * wv * t01
                + wu * (1 - wv) * t10 + wu * wv * t11)     # [H,W,C]

    rot_c = jnp.asarray([0.17, 0.43, 0.71, 0.93, 1.19, 1.41])
    rot_f = jnp.asarray([0.29, 0.61, 0.87, 1.07, 1.33, 1.57])
    col = (0.45 * sample(coarse_tex, coarse_scale, rot_c)
           + 0.35 * sample(fine_tex, fine_scale, rot_f)
           + 0.5 * sample(blob_tex, fine_scale, rot_f))
    col = jnp.clip(col, 0.0, 1.0)
    # mild distance shading for realism (keeps texture contrast dominant)
    shade = 1.0 / (1.0 + 0.02 * best_t * best_t)
    col = col * (0.25 + 0.75 * jnp.clip(shade, 0.0, 1.0)[..., None])
    rgb = (col * 255.0).astype(jnp.uint8)
    gray = (0.299 * col[..., 0] + 0.587 * col[..., 1] + 0.114 * col[..., 2]) * 255.0
    return gray, depth, rgb


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, -1.0, 0.0)) -> np.ndarray:
    """Camera-to-world pose with +z toward target (OpenCV convention:
    x right, y down, z forward) — hence default up = -Y for a y-up world."""
    eye = np.asarray(eye, dtype=np.float64)
    z = np.asarray(target, dtype=np.float64) - eye
    z = z / (np.linalg.norm(z) + 1e-12)
    up = np.asarray(up, dtype=np.float64)
    x = np.cross(up, z)
    # guard: if view direction ~ parallel to up, pick another up
    if np.linalg.norm(x) < 1e-6:
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    Twc = np.eye(4)
    Twc[:3, 0], Twc[:3, 1], Twc[:3, 2], Twc[:3, 3] = x, y, z, eye
    return Twc


def orbit_trajectory(n_frames: int, size=(6.0, 3.0, 6.0),
                     radius_frac: float = 0.25, height_frac: float = 0.5,
                     angle_range: float = 2.0 * np.pi,
                     wobble: float = 0.05, fps: float = 30.0):
    """Smooth orbit inside the room looking outward past the center.
    angle_range=2*pi revisits the start (loop-closure sequences);
    small angle_range gives a gentle fr1/xyz-style sweep.
    Returns (Twc [N,4,4], timestamps [N])."""
    Lx, Ly, Lz = size
    c = np.array([Lx / 2, Ly * height_frac, Lz / 2])
    r = radius_frac * min(Lx, Lz)
    Twc = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        a = angle_range * i / max(n_frames - 1, 1)
        eye = c + np.array([
            r * np.sin(a),
            wobble * Ly * np.sin(3.1 * a),
            r * np.cos(a),
        ])
        # look outward: target on the far wall beyond the orbit
        tgt = c + np.array([2.5 * r * np.sin(a + 0.35), 0.0, 2.5 * r * np.cos(a + 0.35)])
        Twc[i] = look_at(eye, tgt)
    ts = np.arange(n_frames, dtype=np.float64) / fps
    return Twc, ts


def sweep_trajectory(n_frames: int, size=(6.0, 3.0, 6.0),
                     amplitude: float = 0.4, fps: float = 30.0):
    """fr1/xyz-style translation-dominant sweep facing one wall."""
    Lx, Ly, Lz = size
    base = np.array([Lx / 2, Ly / 2, Lz * 0.35])
    Twc = np.zeros((n_frames, 4, 4))
    for i in range(n_frames):
        ph = 2 * np.pi * i / max(n_frames - 1, 1)
        eye = base + amplitude * np.array(
            [np.sin(ph), 0.35 * np.sin(2 * ph), 0.25 * np.cos(ph)]
        )
        tgt = np.array([Lx / 2 + 0.6 * amplitude * np.sin(0.5 * ph), Ly / 2, Lz])
        Twc[i] = look_at(eye, tgt)
    ts = np.arange(n_frames, dtype=np.float64) / fps
    return Twc, ts


class SensorNoiseModel:
    """Realistic RGB-D sensor degradation for accuracy evaluation.

    The clean synthetic world is geometrically exact; real TUM-class
    sensors are not. This model layers the dominant effects of a
    structured-light RGB-D camera (Kinect-class, the reference's TUM
    data, reference: Examples/RGB-D/TUM1.yaml DepthMapFactor=5000):

      * depth: zero-mean Gaussian with the Khoshelham-Elberink
        quadratic law sigma(z) = a + b*z^2, random dropout (invalid
        pixels), and u16 quantization at 1/factor metres;
      * intensity: Gaussian read noise, slow sinusoidal exposure drift
        (auto-exposure hunting), and directional motion blur whose
        length follows the inter-frame pixel motion.
    """

    def __init__(self, depth_sigma_base: float = 0.0012,
                 depth_sigma_quad: float = 0.0019,
                 depth_dropout: float = 0.02,
                 depth_factor: float = 5000.0,
                 read_noise: float = 2.0,
                 exposure_drift: float = 0.15,
                 exposure_period_s: float = 4.0,
                 shutter_fraction: float = 0.35,
                 motion_blur_px: float = 5.0,
                 seed: int = 1):
        self.depth_sigma_base = depth_sigma_base
        self.depth_sigma_quad = depth_sigma_quad
        self.depth_dropout = depth_dropout
        self.depth_factor = depth_factor
        self.read_noise = read_noise
        self.exposure_drift = exposure_drift
        self.exposure_period_s = exposure_period_s
        self.shutter_fraction = shutter_fraction   # shutter-open fraction
        self.motion_blur_px = motion_blur_px       # cap on blur length
        self.rng = np.random.default_rng(seed)

    def apply(self, t: float, gray: np.ndarray, depth: np.ndarray,
              flow_px: Tuple[float, float] = (0.0, 0.0)):
        rng = self.rng
        # --- depth ---
        valid = depth > 0
        sigma = self.depth_sigma_base + self.depth_sigma_quad * depth ** 2
        depth = depth + sigma * rng.standard_normal(depth.shape).astype(
            np.float32)
        if self.depth_dropout > 0:
            drop = rng.random(depth.shape) < self.depth_dropout
            valid = valid & ~drop
        if self.depth_factor > 0:   # u16 quantization like the datasets
            q = np.round(depth * self.depth_factor)
            depth = (np.clip(q, 0, 65535) / self.depth_factor).astype(
                np.float32)
        depth = np.where(valid, depth, 0.0).astype(np.float32)

        # --- intensity ---
        if self.motion_blur_px > 0:
            # blur streak length = image motion during the open shutter
            # (flow px/frame * shutter fraction), capped; odd tap count
            # keeps the kernel symmetric so corners aren't biased
            length = min(float(np.hypot(*flow_px)) * self.shutter_fraction,
                         self.motion_blur_px)
            n = max(1, int(round(length)) | 1)
            if n > 1:
                du, dv = flow_px
                norm = max(float(np.hypot(du, dv)), 1e-6)
                du, dv = du / norm, dv / norm
                acc = np.zeros_like(gray)
                for k in range(n):   # odd tap count along the motion
                    s = (k - (n - 1) / 2.0)
                    acc += np.roll(np.roll(gray, int(round(s * dv)), 0),
                                   int(round(s * du)), 1)
                gray = acc / n
        gain = 1.0 + self.exposure_drift * np.sin(
            2.0 * np.pi * t / self.exposure_period_s)
        gray = gray * gain
        if self.read_noise > 0:
            gray = gray + self.read_noise * rng.standard_normal(
                gray.shape)
        gray = np.clip(gray, 0, 255).astype(np.float32)
        return gray, depth


class SyntheticRGBDSequence:
    """Dataset-like wrapper: iterates (timestamp, gray, depth, rgb) and keeps
    ground-truth camera-to-world poses in `.gt_Twc`. Pass `noise=` a
    SensorNoiseModel (or noise=True for TUM-like defaults) to evaluate
    under realistic sensor degradation instead of exact renders."""

    def __init__(self, world: SyntheticWorld, Twc: np.ndarray,
                 timestamps: np.ndarray,
                 depth_noise: float = 0.0, intensity_noise: float = 0.0,
                 noise=None, seed: int = 1):
        self.world = world
        self.gt_Twc = Twc
        self.timestamps = timestamps
        self.depth_noise = depth_noise
        self.intensity_noise = intensity_noise
        if noise is True:
            noise = SensorNoiseModel(seed=seed)
        self.noise = noise
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.timestamps)

    def _flow_px(self, i: int) -> Tuple[float, float]:
        """Mean image-plane motion (px) between frame i-1 and i: drives
        the directional motion-blur length."""
        if i == 0:
            return (0.0, 0.0)
        cam = self.world.cam
        # translation of the view center projected with mean depth ~2 m
        d = self.gt_Twc[i, :3, 3] - self.gt_Twc[i - 1, :3, 3]
        dc = self.gt_Twc[i, :3, :3].T @ d
        z = 2.0
        return (float(cam.fx * dc[0] / z), float(cam.fy * dc[1] / z))

    def __getitem__(self, i: int):
        gray, depth, rgb = self.world.render(self.gt_Twc[i])
        if self.noise is not None:
            gray, depth = self.noise.apply(float(self.timestamps[i]),
                                           gray, depth, self._flow_px(i))
        if self.depth_noise > 0:
            depth = depth * (
                1.0 + self.depth_noise * self.rng.standard_normal(depth.shape)
            ).astype(np.float32)
        if self.intensity_noise > 0:
            gray = np.clip(
                gray + self.intensity_noise * self.rng.standard_normal(gray.shape),
                0, 255,
            ).astype(np.float32)
        return self.timestamps[i], gray, depth, rgb
