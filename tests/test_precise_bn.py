"""Precise-BN recomputation (engine/precise_bn.py): the momentum-probe must
recover each layer's exact per-batch statistics, so that after recompute the
eval-mode (running-average) forward of a BN tower equals its train-mode
(batch-stats) forward on the same data."""
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from nopesac_tpu.engine.precise_bn import recompute_batch_stats
from nopesac_tpu.models.layers import ConvBN


class _Tower(nn.Module):
    """Two ConvBN layers with DIFFERENT momenta (like plane-head 0.9 vs
    camera-trunk 0.99) to exercise the per-leaf momentum recovery."""

    def setup(self):
        self.a = ConvBN(8, kernel_size=3, bn_momentum=0.9)
        self.b = ConvBN(8, kernel_size=3, bn_momentum=0.99)

    def bn_stats_forward(self, images0, images1):
        x = jnp.concatenate([images0, images1], 0)
        return self.b(self.a(x, True), True).sum()

    def fwd(self, images, train):
        return self.b(self.a(images, train), train)


def test_recompute_matches_train_mode():
    rng = np.random.default_rng(0)
    i0 = rng.normal(size=(2, 8, 8, 3)).astype(np.float32) * 3 + 1
    i1 = rng.normal(size=(2, 8, 8, 3)).astype(np.float32) * 0.5 - 2
    model = _Tower()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(i0), jnp.asarray(i1),
                           method=model.bn_stats_forward)
    params, bs = variables["params"], variables["batch_stats"]

    # scramble the running stats so the test cannot pass by accident
    bad = jax.tree_util.tree_map(lambda t: t + 7.0, bs)
    new_bs = recompute_batch_stats(model, params, bad,
                                   [{"image0": i0, "image1": i1}] * 3, num_iter=3)

    imgs = jnp.concatenate([jnp.asarray(i0), jnp.asarray(i1)], 0)
    y_train, _ = model.apply({"params": params, "batch_stats": bs}, imgs, True,
                             method=model.fwd, mutable=["batch_stats"])
    y_eval = model.apply({"params": params, "batch_stats": new_bs}, imgs, False,
                         method=model.fwd)
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_train),
                               rtol=1e-4, atol=1e-4)


def test_empty_batches_keeps_old_stats():
    model = _Tower()
    i0 = np.zeros((1, 8, 8, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(i0), jnp.asarray(i0),
                           method=model.bn_stats_forward)
    bs = variables["batch_stats"]
    out = recompute_batch_stats(model, variables["params"], bs, [], num_iter=4)
    assert out is bs
