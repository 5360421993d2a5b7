"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; the standard XLA trick
simulates a pod slice on host CPU so sharding paths execute for real.

NOTE: this environment preimports jax at interpreter start (axon
sitecustomize) with JAX_PLATFORMS=axon, so the platform must be switched
via jax.config.update — env vars are already baked in by the time
conftest runs. XLA_FLAGS is still read lazily at backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: keeps repeat test runs well under the
# first-run wall time (the ORB extractor alone costs ~2 min cold)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# the loop thread's essential-graph prewarm compiles buckets the small
# test maps never hit — skip it suite-wide (one dedicated test exercises
# prewarm explicitly with a single bucket)
os.environ.setdefault("ORB_TPU_NO_PREWARM", "1")


import pytest  # noqa: E402

from orb_slam2_map_tpu.config import (ORBConfig, SystemConfig,  # noqa: E402
                                      TrackingConfig)
from orb_slam2_map_tpu.geom.camera import PinholeCamera  # noqa: E402
from orb_slam2_map_tpu.io.synthetic import SyntheticWorld  # noqa: E402


def small_config():
    """320x240 / 4-level config so integration tests compile fast."""
    cam = PinholeCamera(fx=258.0, fy=258.0, cx=159.5, cy=119.5,
                        width=320, height=240, bf=20.0, fps=30.0,
                        th_depth=50.0)
    orb = ORBConfig(n_features=400, n_levels=4, max_keypoints=512)
    tracking = TrackingConfig(min_init_stereo_points=200)
    return SystemConfig(camera=cam, orb=orb, tracking=tracking)


@pytest.fixture(scope="module")
def small_world():
    cfg = small_config()
    return SyntheticWorld(cam=cfg.camera), cfg
