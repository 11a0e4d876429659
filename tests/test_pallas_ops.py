"""Pallas kernel parity tests (interpret mode on CPU)."""
import numpy as np
import jax
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


class TestFusedSelectMaps:
    """Pallas fused upsample/argmax/stats vs the XLA reference
    (ops/select_pallas.py; spec siamese_planeTR.py:625-803)."""

    def _run(self, seed, b=2, nq=12, h=24, w=32, out_h=96, out_w=128,
             all_invalid_batch=False):
        from nopesac_tpu.ops.select_pallas import fused_select_maps
        rng = np.random.default_rng(seed)
        # bfloat16 inputs: the pallas path stores probs as bf16 in VMEM, so
        # feed both implementations the same bf16 values
        prob = jnp.asarray(rng.random((b, nq, h, w)).astype(np.float32))
        prob = prob.astype(jnp.bfloat16)
        score = jnp.asarray(rng.random((b, nq)).astype(np.float32))
        valid = jnp.asarray(rng.random((b, nq)) > 0.3)
        if all_invalid_batch:
            valid = valid.at[0].set(False)
        thr = 0.5
        ref = fused_select_maps(prob, score, valid, thr, out_h, out_w,
                                use_pallas=False)
        got = fused_select_maps(prob, score, valid, thr, out_h, out_w,
                                use_pallas=True, interpret=True)
        return [np.asarray(x) for x in ref], [np.asarray(x) for x in got]

    @pytest.mark.parametrize("seed", [0, 1])
    def test_parity(self, seed):
        (seg_r, mx_r, st_r), (seg_g, mx_g, st_g) = self._run(seed)
        assert (seg_r == seg_g).mean() > 0.999  # ties at float noise only
        np.testing.assert_allclose(mx_g, mx_r, atol=2e-5)
        # counts are integers; centroid sums are float accumulations
        agree = seg_r == seg_g
        if agree.all():
            np.testing.assert_allclose(st_g[:, 0], st_r[:, 0], atol=0.5)
            np.testing.assert_allclose(st_g[:, 3], st_r[:, 3], atol=0.5)
            np.testing.assert_allclose(st_g[:, 1:3], st_r[:, 1:3], rtol=1e-3, atol=0.5)
            np.testing.assert_allclose(st_g[:, 4:6], st_r[:, 4:6], rtol=1e-3, atol=0.5)
        np.testing.assert_allclose(st_g[:, 6], st_r[:, 6], atol=2.0)

    def test_all_invalid_falls_back_to_query0(self):
        (seg_r, _, _), (seg_g, _, _) = self._run(3, all_invalid_batch=True)
        assert (seg_r[0] == 0).all()
        assert (seg_g[0] == 0).all()

    def test_other_integer_ratio(self):
        # 2x rows, 5x cols: generic integer phase decomposition
        (seg_r, mx_r, st_r), (seg_g, mx_g, st_g) = self._run(
            4, h=20, w=20, out_h=40, out_w=100)
        assert (seg_r == seg_g).mean() > 0.999
        np.testing.assert_allclose(mx_g, mx_r, atol=2e-5)
        np.testing.assert_allclose(st_g[:, 6], st_r[:, 6], atol=2.0)

    def test_nondivisible_rejected_by_pallas(self):
        from nopesac_tpu.ops.select_pallas import fused_select_maps
        rng = np.random.default_rng(0)
        prob = jnp.asarray(rng.random((1, 4, 20, 20)).astype(np.float32))
        score = jnp.ones((1, 4), jnp.float32)
        valid = jnp.ones((1, 4), bool)
        with pytest.raises(ValueError):
            fused_select_maps(prob, score, valid, 0.5, 150, 200,
                              use_pallas=True, interpret=True)
        # XLA path handles arbitrary ratios
        seg, mx, st = fused_select_maps(prob, score, valid, 0.5, 150, 200,
                                        use_pallas=False)
        assert seg.shape == (1, 150, 200)


class TestConv1x1BnAddRelu:
    """Fused bottleneck-tail kernel vs plain jnp (ops/bottleneck_pallas.py)."""

    @pytest.mark.parametrize("with_residual,relu", [(True, True), (False, False)])
    def test_parity(self, with_residual, relu):
        from nopesac_tpu.ops.bottleneck_pallas import conv1x1_bn_add_relu
        rng = np.random.default_rng(0)
        b, p, cin, cout = 2, 300, 64, 256  # p not a tile multiple: pad path
        x = jnp.asarray(rng.normal(size=(b, p, cin)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(cin, cout)).astype(np.float32) * 0.1)
        scale = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        shift = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
        res = jnp.asarray(rng.normal(size=(b, p, cout)).astype(np.float32)).astype(jnp.bfloat16) \
            if with_residual else None
        got = conv1x1_bn_add_relu(x, w, scale, shift, residual=res, relu=relu,
                                  tile_px=256, interpret=True)
        ref = jnp.einsum("bpc,cd->bpd", x.astype(jnp.float32),
                         w.astype(jnp.bfloat16).astype(jnp.float32))
        ref = ref * scale + shift
        if res is not None:
            ref = ref + res.astype(jnp.float32)
        if relu:
            ref = jnp.maximum(ref, 0.0)
        ref = ref.astype(jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)
        assert got.dtype == jnp.bfloat16 and got.shape == (b, p, cout)


class TestFusedMaskLoss:
    """Fused upsample+focal/dice kernel vs the naive jnp twin
    (ops/mask_loss_pallas.py; spec criterion.py:93-120)."""

    def _inputs(self, rng, b=2, nq=5, ng=4, h=12, w=16, gh=48, gw=64):
        src = jnp.asarray(rng.normal(size=(b, nq, h, w)).astype(np.float32))
        masks = np.zeros((b, ng, gh, gw), np.uint8)
        for g in range(ng):
            masks[:, g, g * 10:(g + 1) * 10, : gw // 2] = 1
        tgt_idx = jnp.asarray(rng.integers(-1, ng, size=(b, nq)), jnp.int32)
        return src, jnp.asarray(masks), tgt_idx

    def test_forward_parity(self):
        from nopesac_tpu.ops.mask_loss_pallas import (
            focal_dice_reference, fused_focal_dice)

        rng = np.random.default_rng(0)
        src, masks, tgt_idx = self._inputs(rng)
        got = fused_focal_dice(src, masks, tgt_idx, True)
        ref = focal_dice_reference(src, masks, tgt_idx)
        for g, r, name in zip(got, ref, ["focal", "inter", "psum", "tsum"]):
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(r), rtol=2e-2, atol=2e-2,
                err_msg=name)

    def test_gradient_parity(self):
        from nopesac_tpu.ops.mask_loss_pallas import (
            focal_dice_reference, fused_focal_dice)

        rng = np.random.default_rng(1)
        src, masks, tgt_idx = self._inputs(rng)
        wf, wi, wp = 0.7, -0.3, 0.11

        def loss_fused(s):
            f, i, p, t = fused_focal_dice(s, masks, tgt_idx, True)
            return jnp.sum(wf * f + wi * i + wp * p + 0.0 * t)

        def loss_ref(s):
            f, i, p, t = focal_dice_reference(s, masks, tgt_idx)
            return jnp.sum(wf * f + wi * i + wp * p + 0.0 * t)

        g_got = np.asarray(jax.grad(loss_fused)(src))
        g_ref = np.asarray(jax.grad(loss_ref)(src))
        scale = np.abs(g_ref).max() + 1e-6
        np.testing.assert_allclose(g_got / scale, g_ref / scale,
                                   rtol=3e-2, atol=3e-2)


class TestBackendGates:
    """NOPESAC_PALLAS kill switch + axon-tunnel detection (utils/backend.py)."""

    def test_pallas_env_override(self, monkeypatch):
        from nopesac_tpu.utils import backend

        monkeypatch.setenv("NOPESAC_PALLAS", "0")
        assert backend.pallas_ok() is False
        monkeypatch.setenv("NOPESAC_PALLAS", "1")
        assert backend.pallas_ok() is True
        monkeypatch.delenv("NOPESAC_PALLAS")
        assert backend.pallas_ok() == backend.on_tpu()

    def test_scan_unroll_capped_on_tunnel(self, monkeypatch):
        # unroll>1 + Mosaic custom calls never finishes remote compile on
        # the axon tunnel (bisected on hardware); the policy caps to 1 there
        from nopesac_tpu.models.transformer import _scan_unroll

        monkeypatch.delenv("NOPESAC_SCAN_UNROLL", raising=False)
        monkeypatch.setenv("PALLAS_AXON_REMOTE_COMPILE", "1")
        assert _scan_unroll() == 1
        monkeypatch.setenv("NOPESAC_SCAN_UNROLL", "4")
        assert _scan_unroll() == 4
