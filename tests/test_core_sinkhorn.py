import numpy as np
import jax.numpy as jnp

from nopesac_tpu.core.sinkhorn import log_optimal_transport_masked, log_sinkhorn_iterations
from nopesac_tpu.core.assignment import mutual_max_assignment, assignment_to_sequence


def np_logsumexp(x, axis):
    m = np.max(x, axis=axis, keepdims=True)
    return np.squeeze(m, axis) + np.log(np.sum(np.exp(x - m), axis=axis))


def np_sinkhorn(z, log_mu, log_nu, iters):
    u = np.zeros_like(log_mu)
    v = np.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - np_logsumexp(z + v[:, None, :], 2)
        v = log_nu - np_logsumexp(z + u[:, :, None], 1)
    return z + u[:, :, None] + v[:, None, :]


class TestSinkhorn:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        z = rng.normal(size=(2, 5, 7)).astype(np.float32)
        log_mu = rng.normal(size=(2, 5)).astype(np.float32)
        log_nu = rng.normal(size=(2, 7)).astype(np.float32)
        out = np.asarray(log_sinkhorn_iterations(jnp.asarray(z), jnp.asarray(log_mu), jnp.asarray(log_nu), 50))
        ref = np_sinkhorn(z, log_mu, log_nu, 50)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_marginals_unmasked(self):
        """After enough iterations exp(Z) satisfies the SuperGlue marginals."""
        rng = np.random.default_rng(1)
        scores = jnp.asarray(rng.normal(size=(1, 6, 4)).astype(np.float32))
        out = log_optimal_transport_masked(scores, jnp.asarray(1.0), 200)
        p = np.exp(np.asarray(out, dtype=np.float64))
        m, n = 6, 4
        # each real row should sum to (m+n)/(m+n) = 1; dustbin row to n
        np.testing.assert_allclose(p[0, :m].sum(axis=1), np.ones(m), atol=1e-3)
        np.testing.assert_allclose(p[0, m].sum(), n, atol=1e-2)
        np.testing.assert_allclose(p[0, :, :n].sum(axis=0), np.ones(n), atol=1e-3)

    def test_masked_rows_inert(self):
        """Invalid rows/cols must stay ~0 probability and not produce NaNs."""
        rng = np.random.default_rng(2)
        scores = jnp.asarray(rng.normal(size=(1, 5, 5)).astype(np.float32))
        row_masks = jnp.asarray([[True, True, True, False, False]])
        col_masks = jnp.asarray([[True, True, False, False, False]])
        out = np.asarray(log_optimal_transport_masked(scores, jnp.asarray(1.0), 100, row_masks, col_masks))
        assert np.isfinite(out[0, :3, :2]).all()
        p = np.exp(out.astype(np.float64))
        # masked rows/cols carry no mass in the valid block
        assert p[0, 3:5, :].max() < 1e-20
        assert p[0, :, 2:5].max() < 1e-20
        # valid rows still sum to ~1
        np.testing.assert_allclose(p[0, :3, [0, 1, 5]].sum(axis=0), np.ones(3), atol=1e-2)

    def test_mask_equals_crop(self):
        """Masked OT on a padded problem == unmasked OT on the cropped problem."""
        rng = np.random.default_rng(3)
        m, n, mp, npad = 4, 3, 6, 7
        scores_small = rng.normal(size=(1, m, n)).astype(np.float32)
        scores_big = np.full((1, mp, npad), 99.0, np.float32)
        scores_big[0, :m, :n] = scores_small[0]
        row_masks = jnp.asarray(np.arange(mp)[None] < m)
        col_masks = jnp.asarray(np.arange(npad)[None] < n)
        out_big = np.asarray(
            log_optimal_transport_masked(jnp.asarray(scores_big), jnp.asarray(0.7), 150, row_masks, col_masks)
        )
        out_small = np.asarray(log_optimal_transport_masked(jnp.asarray(scores_small), jnp.asarray(0.7), 150))
        np.testing.assert_allclose(out_big[0, :m, :n], out_small[0, :m, :n], atol=1e-3)
        # dustbin row/col agree on the valid slice
        np.testing.assert_allclose(out_big[0, mp, :n], out_small[0, m, :n], atol=1e-3)
        np.testing.assert_allclose(out_big[0, :m, npad], out_small[0, :m, n], atol=1e-3)


class TestAssignment:
    def brute_force(self, s, thr):
        b, m, n = s.shape
        out = np.zeros((b, m, n), np.float32)
        for bi in range(b):
            for i in range(m):
                j = int(np.argmax(s[bi, i]))
                if int(np.argmax(s[bi, :, j])) == i and np.exp(s[bi, i, j]) > thr:
                    out[bi, i, j] = 1
        return out

    def test_matches_brute_force(self):
        rng = np.random.default_rng(4)
        s = rng.normal(size=(3, 8, 6)).astype(np.float32) - 1.0
        padded = np.pad(s, ((0, 0), (0, 1), (0, 1)), constant_values=-50.0)
        out = np.asarray(mutual_max_assignment(jnp.asarray(padded), 0.2))
        np.testing.assert_array_equal(out, self.brute_force(s, 0.2))

    def test_sequence_extraction(self):
        a = np.zeros((5, 5), np.float32)
        a[1, 3] = 1
        a[2, 0] = 1
        a[4, 4] = 1
        idx1, idx2, valid, num = assignment_to_sequence(jnp.asarray(a), 4)
        assert int(num) == 3
        np.testing.assert_array_equal(np.asarray(idx1), [1, 2, 4, 0])
        np.testing.assert_array_equal(np.asarray(idx2), [3, 0, 4, 0])
        np.testing.assert_array_equal(np.asarray(valid), [True, True, True, False])

    def test_sequence_overflow_truncates(self):
        a = np.ones((4, 1), np.float32)
        idx1, idx2, valid, num = assignment_to_sequence(jnp.asarray(a), 2)
        assert int(num) == 2
        assert np.asarray(valid).all()
