"""Persistent XLA compile cache shared by every entry point.

Compiles are the dominant cold-start cost on a networked TPU: a single
essential-graph size bucket costs tens of seconds of compile RPC, and
without a disk cache every process pays it again. jax keys cache
entries by backend + program fingerprint, so one directory serves the
CPU test mesh and TPU runs alike. An explicitly configured cache dir
(tests' conftest, bench.py) is respected.
"""

import os


def ensure(path: str | None = None) -> None:
    """Enable the persistent compile cache unless one is already set."""
    if os.environ.get("ORB_TPU_NO_COMPILE_CACHE") == "1":
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return
    except AttributeError:  # pragma: no cover - very old jax
        return
    path = path or os.path.join(os.path.expanduser("~/.cache"),
                                "orb_slam2_map_tpu", "xla_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass
