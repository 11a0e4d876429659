"""Parity tests for the batched matcher and the seg-map Q-loss rewrite.

Both are TPU perf rewrites of exact reference semantics (criterion.py /
matcher.py); these tests pin them to the naive formulations.
"""
import numpy as np
import jax.numpy as jnp

from nopesac_tpu.losses import criterion as CR


NQ, NG, H, W = 12, 12, 48, 64

MW = {
    "cost_class": 1.0,
    "cost_mask": 20.0,
    "cost_dice": 1.0,
    "cost_center": 0.5,
    "cost_param": 0.25,
    "cost_param_offset": 0.01,
    "cost_param_normal_angle": 0.0028,
}


def make_outputs(rng, b):
    return {
        "pred_logits": jnp.asarray(rng.normal(size=(b, NQ, 2)).astype(np.float32)),
        "pred_mask_logits": jnp.asarray(
            rng.normal(size=(b, NQ, H // 4, W // 4)).astype(np.float32)),
        "pred_centers": jnp.asarray(rng.uniform(size=(b, NQ, 2)).astype(np.float32)),
        "pred_params": jnp.asarray(rng.normal(size=(b, NQ, 3)).astype(np.float32)),
    }


def make_targets(rng, b, ngt=5, disjoint=True):
    gt_valid = np.zeros((b, NG), bool)
    gt_valid[:, :ngt] = True
    gt_masks = np.zeros((b, NG, H, W), np.uint8)
    # disjoint tiling: each GT owns a distinct horizontal band
    band = H // max(ngt, 1)
    for g in range(ngt):
        gt_masks[:, g, g * band:(g + 1) * band, : W // 2] = 1
    assert not disjoint or (gt_masks.sum(1) <= 1).all()
    gt_params = rng.normal(size=(b, NG, 3)).astype(np.float32) * gt_valid[..., None]
    gt_params[..., :ngt, :] += 0.5  # keep offsets away from 0
    return {
        "gt_valid": jnp.asarray(gt_valid),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_params": jnp.asarray(gt_params),
        "gt_centers": jnp.asarray(
            rng.uniform(size=(b, NG, 2)).astype(np.float32) * gt_valid[..., None]),
        "gt_pixel_centers": jnp.asarray(rng.uniform(size=(b, H, W, 2)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(1.0, 5.0, size=(b, H, W)).astype(np.float32)),
        "k_inv_dot_xy1": jnp.asarray(rng.normal(size=(b, 3, H, W)).astype(np.float32)),
    }


class TestResizeMatrix:
    def test_resize_matrix_matches_jax_image(self):
        import jax
        import jax.image

        rng = np.random.default_rng(0)
        for (h, w, gh, gw) in [(12, 16, 48, 64), (120, 160, 480, 640)]:
            x = jnp.asarray(rng.normal(size=(2, 3, h, w)).astype(np.float32))
            ref = jax.image.resize(x, (2, 3, gh, gw), method="bilinear")
            got = CR.upsample_bilinear(x, gh, gw)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5)


class TestMatchPlanesMulti:
    def test_multi_equals_per_level(self):
        rng = np.random.default_rng(0)
        b = 3
        targets = make_targets(rng, b)
        outs = [make_outputs(rng, b) for _ in range(3)]
        multi = CR.match_planes_multi(outs, targets, MW)
        for lvl, o in enumerate(outs):
            single = CR.match_planes(o, targets, MW)
            np.testing.assert_array_equal(
                np.asarray(multi[lvl]), np.asarray(single), err_msg=f"level {lvl}")

    def test_cost_optimality_per_level(self):
        # each level's assignment must be optimal for its own cost matrix
        from scipy.optimize import linear_sum_assignment

        rng = np.random.default_rng(1)
        b, ngt = 2, 4
        targets = make_targets(rng, b, ngt=ngt)
        outs = [make_outputs(rng, b) for _ in range(2)]
        multi = CR.match_planes_multi(outs, targets, MW)
        for o, match in zip(outs, multi):
            cost = np.asarray(CR.compute_match_cost(o, targets, MW))
            for i in range(b):
                c = cost[i][:, :ngt]
                rows, cols = linear_sum_assignment(c)
                opt = c[rows, cols].sum()
                m = np.asarray(match[i])
                got = sum(c[q, m[q]] for q in range(NQ) if m[q] >= 0)
                assert abs(got - opt) < 1e-3
                # matched GT set is exactly {0..ngt-1}
                assert sorted(m[m >= 0].tolist()) == list(range(ngt))


class TestQLossSegmap:
    def _naive_inputs(self, rng, b, ngt):
        targets = make_targets(rng, b, ngt=ngt)
        src_p = jnp.asarray(rng.normal(size=(b, NQ, 3)).astype(np.float32) + 0.4)
        # a valid partial permutation: query q -> gt (q + 1) % ngt for q < ngt
        match = np.full((b, NQ), -1, np.int32)
        for q in range(ngt):
            match[:, q] = (q + 1) % ngt
        match = jnp.asarray(match)
        return targets, src_p, match

    def test_segmap_equals_naive(self):
        rng = np.random.default_rng(2)
        b, ngt = 3, 5
        targets, src_p, match = self._naive_inputs(rng, b, ngt)
        tgt_idx = jnp.maximum(match, 0)
        matched_f = (match >= 0).astype(jnp.float32)
        tgt_p = jnp.take_along_axis(targets["gt_params"], tgt_idx[..., None], axis=1)
        tgt_masks = jnp.take_along_axis(
            targets["gt_masks"], tgt_idx[:, :, None, None], axis=1
        ).astype(jnp.float32)
        naive = CR._q_loss(src_p, tgt_p, tgt_masks, matched_f, targets)
        fast = CR._q_loss_segmap(src_p, match, targets)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(naive), rtol=1e-5)

    def test_no_matches_is_zero(self):
        rng = np.random.default_rng(3)
        targets = make_targets(rng, 2, ngt=3)
        src_p = jnp.asarray(rng.normal(size=(2, NQ, 3)).astype(np.float32))
        match = jnp.full((2, NQ), -1, jnp.int32)
        assert float(CR._q_loss_segmap(src_p, match, targets)) == 0.0
