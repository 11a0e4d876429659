"""Pallas kernel parity tests (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from nopesac_tpu.core.sinkhorn import log_optimal_transport_masked
from nopesac_tpu.ops.sinkhorn_pallas import log_optimal_transport_masked_pallas


class TestSinkhornPallas:
    @pytest.mark.parametrize("masked", [False, True])
    def test_matches_lax_version(self, masked):
        rng = np.random.default_rng(0)
        b, m, n = 2, 50, 50
        scores = jnp.asarray(rng.normal(size=(b, m, n)).astype(np.float32))
        if masked:
            row = jnp.asarray(rng.random((b, m)) > 0.4)
            col = jnp.asarray(rng.random((b, n)) > 0.4)
        else:
            row = col = None
        ref = log_optimal_transport_masked(scores, jnp.float32(1.3), 50, row, col)
        got = log_optimal_transport_masked_pallas(
            scores, jnp.float32(1.3), 50, row, col, interpret=True)
        ref = np.asarray(ref)
        got = np.asarray(got)
        valid = np.isfinite(ref) & (np.abs(ref) < 1e4)
        np.testing.assert_allclose(got[valid], ref[valid], atol=1e-3)

    def test_small_rect(self):
        rng = np.random.default_rng(1)
        scores = jnp.asarray(rng.normal(size=(1, 5, 7)).astype(np.float32))
        ref = np.asarray(log_optimal_transport_masked(scores, jnp.float32(0.5), 80))
        got = np.asarray(log_optimal_transport_masked_pallas(
            scores, jnp.float32(0.5), 80, interpret=True))
        valid = np.abs(ref) < 1e4
        np.testing.assert_allclose(got[valid], ref[valid], atol=1e-3)
