"""select_planes regime semantics vs the reference's _postprocess_planeHeadMask.

Three regimes (siamese_planeTR.py:625-803):
  1) normal: surviving keeps, prob-gated masks
  2) zero-detection (:656-661, 699-702): single fallback query, overlap
     filter NOT applied, prob gate KEPT, pixel (0,0) forced when the gated
     mask is empty
  3) all-filtered (:741-788): max-overlap query with the UNGATED argmax mask
"""
import jax.numpy as jnp
import numpy as np

from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

NQ = 4
H = W = 8


def _run(logits, mask_logits):
    model = PlaneTRNopeSAC()
    outputs = {
        "pred_logits": jnp.asarray(logits, jnp.float32),
        "pred_params": jnp.ones((1, NQ, 3), jnp.float32),
        "pred_mask_logits": jnp.asarray(mask_logits, jnp.float32),
        "pred_centers": jnp.zeros((1, NQ, 2), jnp.float32),
    }
    return model.bind({"params": {}}).select_planes(outputs, out_h=H, out_w=W)


def _mask(sel, q):
    return np.asarray(sel["seg_gated"][0]) == q


class TestZeroDetection:
    def test_empty_gated_mask_gets_pixel00(self):
        # no query above plane_score_threshold; fallback query 2 has an
        # all-negative mask -> reference keeps the GATED (empty) mask and
        # sets pixel (0,0), NOT a full-image mask
        logits = np.tile([-5.0, 5.0], (1, NQ, 1))
        logits[0, 2, 0] = -4.0  # best of the bad
        mask_logits = np.full((1, NQ, H, W), -8.0)
        sel = _run(logits, mask_logits)
        valid = np.asarray(sel["valid"][0])
        assert valid.tolist() == [False, False, True, False]
        m = _mask(sel, 2)
        assert m[0, 0] and m.sum() == 1, f"expected only pixel (0,0), got {m.sum()}"

    def test_nonempty_gated_mask_kept_with_gate(self):
        # fallback class prob 0.58: below plane_score_threshold (0.6), but
        # the score-scaled mask prob (reference siamese_planeTR.py:667)
        # still clears mask_prob_threshold (0.5) on the top half
        logits = np.tile([-5.0, 5.0], (1, NQ, 1))
        logits[0, 1] = [0.32, 0.0]
        mask_logits = np.full((1, NQ, H, W), -8.0)
        mask_logits[0, 1, :4, :] = 8.0  # top half confidently plane
        sel = _run(logits, mask_logits)
        valid = np.asarray(sel["valid"][0])
        assert valid.tolist() == [False, True, False, False]
        m = _mask(sel, 1)
        assert m[:4].all() and not m[4:].any(), "gate must be KEPT in the zero case"


class TestAllFiltered:
    def test_max_overlap_query_ungated(self):
        # two confident queries, each argmax-winning half the image while
        # their standalone (original) masks cover everything -> overlap 0.5
        # < 0.6 for both, nothing survives; reference keeps the max-overlap
        # query with the UNGATED argmax mask
        logits = np.tile([5.0, -5.0], (1, NQ, 1))
        logits[0, 2:] = [-5.0, 5.0]  # only queries 0, 1 are planes
        mask_logits = np.full((1, NQ, H, W), -8.0)
        mask_logits[0, 0] = 2.0
        mask_logits[0, 1] = 2.0
        mask_logits[0, 1, :, 4:] = 3.0  # q1 wins argmax on the right half
        sel = _run(logits, mask_logits)
        valid = np.asarray(sel["valid"][0])
        assert valid.sum() == 1 and valid[0], "tie broken by first index"
        # fallback mask must be UNGATED: the whole image is labelled (no
        # -1 background left by the gate)
        assert (np.asarray(sel["seg_gated"][0]) >= 0).all()
        m = _mask(sel, 0)
        assert m[:, :4].all() and not m[:, 4:].any()
