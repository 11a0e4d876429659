"""Precise BatchNorm statistics recomputation (post-training).

BatchNorm running averages trail the parameter trajectory by roughly
1/(1-momentum) optimizer steps; with the camera trunk's momentum 0.99
(reference camera_modules.py:36-48, torch momentum 0.01) that is a ~100-step
lag. Late conv layers have tiny pre-BN variances, so the lag turns into a
large train/eval divergence (observed: eval-mode pose regressions orders of
magnitude off while train-mode is converged). The standard cure is
detectron2/fvcore PreciseBN (d2 `TEST.PRECISE_BN` config keys): freeze the
parameters, stream N batches through the train-mode forward, and write the
averaged *true* batch statistics into the checkpoint.

Implementation note: flax buries the momentum inside each `nn.BatchNorm`
(and this model mixes 0.9 plane-head / 0.99 camera-trunk momenta), so
rather than reconstructing modules with momentum overrides we recover the
per-leaf momentum algebraically. One train-mode apply maps a running-stats
tree `ra` to `m * ra + (1-m) * batch_stat`, linearly in `ra`; probing with
the zero tree and the ones tree on the same batch yields
`m = apply(ones) - apply(zeros)` elementwise, and then every batch's exact
statistics are `apply(zeros) / (1-m)`. Per-batch means and variances are
averaged arithmetically across batches (fvcore semantics).
"""
from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def recompute_batch_stats(
    model,
    params,
    batch_stats,
    batches: Iterable[dict],
    num_iter: int = 200,
):
    """Returns a new batch_stats tree holding precise statistics.

    `batches` yields mapper/collate batches with "image0"/"image1" arrays
    (the train loader); at most `num_iter` batches are consumed.
    """
    tmap = jax.tree_util.tree_map

    @jax.jit
    def stats_apply(bs_tree, images0, images1):
        _, mut = model.apply(
            {"params": params, "batch_stats": bs_tree},
            images0, images1,
            method=model.bn_stats_forward,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return mut["batch_stats"]

    zeros = tmap(jnp.zeros_like, batch_stats)
    ones = tmap(jnp.ones_like, batch_stats)

    total: Optional[object] = None
    momentum = None
    n = 0
    for batch in batches:
        if n >= num_iter:
            break
        i0 = jnp.asarray(batch["image0"])
        i1 = jnp.asarray(batch["image1"])
        if momentum is None:
            f0 = stats_apply(zeros, i0, i1)
            f1 = stats_apply(ones, i0, i1)
            momentum = tmap(lambda a, b: b - a, f0, f1)
            per_batch = tmap(lambda a, m: a / (1.0 - m), f0, momentum)
        else:
            fresh = stats_apply(zeros, i0, i1)
            per_batch = tmap(lambda a, m: a / (1.0 - m), fresh, momentum)
        total = per_batch if total is None else tmap(jnp.add, total, per_batch)
        n += 1
    if n == 0:
        return batch_stats
    mean_stats = tmap(lambda t: t / n, total)
    # guard: any non-finite leaf (empty loader edge cases) keeps the old
    # stats — but LOUDLY, or a discarded recompute silently reproduces the
    # exact train/eval BN divergence this module exists to fix
    from jax.tree_util import keystr, tree_flatten_with_path

    bad = [keystr(p) for p, l in tree_flatten_with_path(mean_stats)[0]
           if not bool(np.all(np.isfinite(np.asarray(l))))]
    if bad:
        import logging

        logging.getLogger(__name__).warning(
            "precise-BN recompute produced non-finite stats in %d leaves "
            "(%s%s); KEEPING the stale running stats",
            len(bad), ", ".join(bad[:3]), "..." if len(bad) > 3 else "")
        return batch_stats
    return mean_stats
