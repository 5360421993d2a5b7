"""Pallas TPU kernel tests (interpreter mode on the CPU test mesh).

Validates the XOR+popcount Hamming kernel and the fused gated-NN
matcher against the portable MXU implementations in ops/matching.py.
On real TPU the same kernels compile natively (opt-in via
ORB_TPU_PALLAS=1; see matching._use_pallas for the measured tradeoff).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from orb_slam2_map_tpu.ops import matching

try:
    from jax.experimental.pallas import tpu as pltpu

    from orb_slam2_map_tpu.ops import pallas_kernels
    HAVE_PALLAS = True
except ImportError:  # pragma: no cover
    HAVE_PALLAS = False

pytestmark = pytest.mark.skipif(not HAVE_PALLAS,
                                reason="pallas not available")


def _interp():
    return pltpu.force_tpu_interpret_mode()


class TestHammingKernel:
    def test_matches_mxu_path(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(0, 2 ** 32, (200, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2 ** 32, (150, 8), dtype=np.uint32))
        ref = np.asarray(matching.hamming_matrix(a, b))
        with _interp():
            out = np.asarray(pallas_kernels.hamming_matrix_pallas(a, b))
        np.testing.assert_array_equal(ref, out)

    def test_zero_distance_diagonal(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
        with _interp():
            out = np.asarray(pallas_kernels.hamming_matrix_pallas(a, a))
        np.testing.assert_array_equal(np.diag(out), 0.0)


class TestGatedNNKernel:
    def test_matches_masked_nn(self):
        rng = np.random.default_rng(2)
        N, M = 300, 257
        a = jnp.asarray(rng.integers(0, 2 ** 32, (N, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2 ** 32, (M, 8), dtype=np.uint32))
        gate = jnp.asarray(rng.uniform(0, 1, (N, M)) < 0.3)
        ref = matching.masked_nn(matching.hamming_matrix(a, b), gate,
                                 max_dist=120.0, ratio=0.9)
        with _interp():
            idx, best, second = pallas_kernels.gated_nn_pallas(a, b, gate)
        idx, best = np.asarray(idx), np.asarray(best)
        ok = best <= 120.0
        ok &= best < 0.9 * np.asarray(second)
        ref_ok = np.asarray(ref.ok)
        np.testing.assert_array_equal(ok, ref_ok)
        np.testing.assert_array_equal(idx[ref_ok],
                                      np.asarray(ref.idx)[ref_ok])

    def test_all_gated_out(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
        gate = jnp.zeros((64, 64), dtype=bool)
        with _interp():
            idx, best, second = pallas_kernels.gated_nn_pallas(a, a, gate)
        assert (np.asarray(best) >= 1e8).all()
