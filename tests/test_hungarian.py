import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

from nopesac_tpu.losses.hungarian import lap_jv, hungarian_device, hungarian_host


def scipy_cost(cost, col4row):
    n = cost.shape[0]
    return cost[np.arange(n), col4row].sum()


class TestLapJV:
    def test_matches_scipy_many_random(self):
        rng = np.random.default_rng(0)
        for trial in range(20):
            n = int(rng.integers(2, 30))
            cost = rng.normal(size=(n, n)).astype(np.float32) * 10
            got = np.asarray(lap_jv(jnp.asarray(cost)))
            rows, cols = linear_sum_assignment(cost)
            # optimal value must match (assignment itself may tie)
            assert abs(scipy_cost(cost, got) - cost[rows, cols].sum()) < 1e-3, trial
            # must be a permutation
            assert sorted(got.tolist()) == list(range(n))

    def test_identity(self):
        cost = np.full((4, 4), 10.0, np.float32) - 9 * np.eye(4, dtype=np.float32)
        got = np.asarray(lap_jv(jnp.asarray(cost)))
        np.testing.assert_array_equal(got, [0, 1, 2, 3])

    def test_rectangular_padding(self):
        """Square padding with constant dummy columns == rectangular LSA."""
        rng = np.random.default_rng(1)
        for trial in range(10):
            nq, ngt = 12, int(rng.integers(1, 12))
            cost = rng.normal(size=(nq, ngt)).astype(np.float32)
            padded = np.full((1, nq, nq), 1e5, np.float32)
            padded[0, :, :ngt] = cost
            match = np.asarray(hungarian_device(jnp.asarray(padded), jnp.asarray([ngt])))[0]
            rows, cols = linear_sum_assignment(cost)
            ref = np.full(nq, -1, np.int64)
            ref[rows] = cols
            got_pairs = {(i, c) for i, c in enumerate(match) if c >= 0}
            ref_cost = cost[rows, cols].sum()
            got_cost = sum(cost[i, c] for i, c in got_pairs)
            assert len(got_pairs) == len(rows)
            assert abs(got_cost - ref_cost) < 1e-3

    def test_rect_batched_varied_ngt(self):
        """Batched transposed-rectangular path: per-element ngt 0..N."""
        rng = np.random.default_rng(7)
        n = 14
        for trial in range(5):
            bsz = 6
            cost = rng.normal(size=(bsz, n, n)).astype(np.float32) * 5
            ngts = np.array([0, 1, 3, 7, n - 1, n])[rng.permutation(6)][:bsz]
            match = np.asarray(
                hungarian_device(jnp.asarray(cost), jnp.asarray(ngts, np.int32)))
            for b in range(bsz):
                ngt = int(ngts[b])
                m = match[b]
                assigned = m[m >= 0]
                # exactly the ngt real columns assigned, each once
                assert sorted(assigned.tolist()) == list(range(ngt))
                if ngt == 0:
                    continue
                sub = cost[b][:, :ngt]
                rows, cols = linear_sum_assignment(sub)
                opt = sub[rows, cols].sum()
                got = sum(sub[i, c] for i, c in enumerate(m) if c >= 0)
                assert abs(got - opt) < 1e-3, (trial, b, ngt)

    def test_host_oracle_agrees(self):
        rng = np.random.default_rng(2)
        nq, ngt = 10, 6
        cost = rng.normal(size=(2, nq, nq)).astype(np.float32)
        cost[:, :, ngt:] = 1e5
        nv = jnp.asarray([ngt, ngt])
        dev = np.asarray(hungarian_device(jnp.asarray(cost), nv))
        host = np.asarray(hungarian_host(jnp.asarray(cost), nv))
        for b in range(2):
            dev_cost = sum(cost[b, i, c] for i, c in enumerate(dev[b]) if c >= 0)
            host_cost = sum(cost[b, i, c] for i, c in enumerate(host[b]) if c >= 0)
            assert abs(dev_cost - host_cost) < 1e-3
