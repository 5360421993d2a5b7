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
