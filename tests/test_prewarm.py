"""Loop-thread compile prewarm + persistent compile cache plumbing.

The essential-graph optimizer's jit compile is the one that otherwise
happens inside the lock-held correction write-back (tens of seconds over
a networked TPU); LoopCloser.prewarm compiles the size buckets up front
on the loop thread.
"""

import os

import jax

from conftest import small_config
from orb_slam2_map_tpu.slam.loop_closing import LoopCloser
from orb_slam2_map_tpu.slam.mapstore import MapStore
from orb_slam2_map_tpu.utils import compile_cache


def test_prewarm_compiles_smallest_bucket():
    cfg = small_config()
    m = MapStore(max_keyframes=64, max_points=256, kp_capacity=128)
    lc = LoopCloser(cfg, m, place_db=None)
    old = os.environ.pop("ORB_TPU_NO_PREWARM", None)
    try:
        # must exercise the exact live call signature; a shape/static-arg
        # drift between prewarm and _optimize_essential_graph would make
        # the warm-up useless (and this test fail on the API change)
        lc.prewarm()
        assert (64, False) in lc._warmed_pg or (64, True) in lc._warmed_pg
    finally:
        if old is not None:
            os.environ["ORB_TPU_NO_PREWARM"] = old


def test_prewarm_env_gate():
    cfg = small_config()
    m = MapStore(max_keyframes=64, max_points=256, kp_capacity=128)
    lc = LoopCloser(cfg, m, place_db=None)
    os.environ["ORB_TPU_NO_PREWARM"] = "1"
    lc.prewarm()           # gated: must not compile anything
    lc.maybe_prewarm()
    assert not lc._warmed_pg


def test_compile_cache_respects_existing_setting():
    # conftest configured an explicit cache dir; ensure() must not
    # override it
    before = jax.config.jax_compilation_cache_dir
    compile_cache.ensure()
    assert jax.config.jax_compilation_cache_dir == before
