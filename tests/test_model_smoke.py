import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nopesac_tpu.models.nopesac import PlaneTRNopeSAC

H, W = 96, 128  # small but stride-32 divisible
NQ = 50
B = 1


def make_batch(rng, b=B, h=H, w=W, ngt=4, ncorr=2):
    def targets():
        gt_valid = np.zeros((b, NQ), bool)
        gt_valid[:, :ngt] = True
        # uint8 like the real pipeline (mapper.py view_targets); disjoint
        gt_masks = np.zeros((b, NQ, h, w), np.uint8)
        for g in range(ngt):
            gt_masks[:, g, g * 10:(g + 1) * 10, g * 12:(g + 1) * 12] = 1
        gt_params = rng.normal(size=(b, NQ, 3)).astype(np.float32) * gt_valid[..., None]
        gt_centers = rng.uniform(size=(b, NQ, 2)).astype(np.float32) * gt_valid[..., None]
        gt_pixel_centers = rng.uniform(size=(b, h, w, 2)).astype(np.float32)
        depth = rng.uniform(1.0, 5.0, size=(b, h, w)).astype(np.float32)
        kxy = rng.normal(size=(b, 3, h, w)).astype(np.float32)
        return {
            "gt_valid": jnp.asarray(gt_valid),
            "gt_masks": jnp.asarray(gt_masks),
            "gt_params": jnp.asarray(gt_params),
            "gt_centers": jnp.asarray(gt_centers),
            "gt_pixel_centers": jnp.asarray(gt_pixel_centers),
            "depth": jnp.asarray(depth),
            "k_inv_dot_xy1": jnp.asarray(kxy),
        }

    corr_idx1 = np.zeros((b, NQ), np.int32)
    corr_idx2 = np.zeros((b, NQ), np.int32)
    corr_valid = np.zeros((b, NQ), bool)
    for c in range(ncorr):
        corr_idx1[:, c] = c
        corr_idx2[:, c] = c
        corr_valid[:, c] = True

    q = np.array([0.9, 0.1, 0.2, 0.05])
    q = q / np.linalg.norm(q)
    gt_pose = np.concatenate([np.array([0.5, 0.1, -0.2]), q]).astype(np.float32)

    return {
        "image0": jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32)),
        "image1": jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32)),
        "targets0": targets(),
        "targets1": targets(),
        "gt_pose": jnp.asarray(np.tile(gt_pose, (b, 1))),
        "corr_idx1": jnp.asarray(corr_idx1),
        "corr_idx2": jnp.asarray(corr_idx2),
        "corr_valid": jnp.asarray(corr_valid),
    }


@pytest.fixture(scope="module")
def model_and_vars():
    # fewer sinkhorn iters / random AIM poses for test speed (single-core CPU
    # execution dominates the suite; the graph structure is unchanged)
    model = PlaneTRNopeSAC(sinkhorn_iterations=10, rand_bs=8)
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    # jit: eager (op-by-op) init costs minutes on the 1-core CPU box, the
    # jitted graph hits the persistent compile cache
    variables = jax.jit(lambda b: model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        b, jax.random.PRNGKey(2), method=model.train_forward,
    ))(batch)
    return model, variables, batch


class TestTrainForward:
    def test_losses_finite_and_complete(self, model_and_vars):
        model, variables, batch = model_and_vars
        losses, _ = jax.jit(lambda v, b: model.apply(
            v, b, jax.random.PRNGKey(3),
            method=model.train_forward,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(4)},
        ))(variables, batch)
        # detection losses (final + 2 aux levels)
        for k in ["loss_ce", "loss_mask", "loss_dice", "loss_center_ins",
                  "loss_center_pixel", "loss_param_l1", "loss_param_cos", "loss_q",
                  "loss_ce_0", "loss_ce_1"]:
            assert k in losses, k
        # matching + camera losses
        for k in ["losses_emb_0", "loss_tran_pixelReg", "loss_rot_pixelReg",
                  "loss_rot_initCamRec", "loss_trans_initCamRec",
                  "loss_rot_randCamRecLBS_N1",
                  "loss_tran_planeAvgReg_initCamRef",
                  "loss_tran_planeSoftReg_initRecCamRef",
                  "loss_rotIdx_initCamRef_Aux",
                  "loss_paramL2_dist_initRecCamRef_Aux"]:
            assert k in losses, k
        for k, v in losses.items():
            assert np.isfinite(float(v)), f"{k} = {v}"

    def test_gradients_flow(self, model_and_vars):
        model, variables, batch = model_and_vars

        def loss_fn(params):
            losses, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, jax.random.PRNGKey(3),
                method=model.train_forward,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(4)},
            )
            return sum(jnp.asarray(v) for v in losses.values())

        grads = jax.jit(jax.grad(loss_fn))(variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
        assert np.isfinite(total) and total > 0
        # spot check: backbone, matching head, and camera head all get grads
        for key in ["backbone", "matching_head", "camera_head", "plane_head"]:
            sub = grads[key]
            s = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(sub))
            assert s > 0, f"no gradient in {key}"


class TestInference:
    def test_shapes_and_cameras(self, model_and_vars):
        model, variables, batch = model_and_vars
        out = jax.jit(lambda v, a, b: model.apply(
            v, a, b, method=model.inference, out_h=H, out_w=W,
        ))(variables, batch["image0"], batch["image1"])
        v0 = out["view0"]
        assert v0["valid"].shape == (B, NQ)
        assert v0["seg_gated"].shape == (B, H, W)
        assert v0["seg_gated"].dtype == jnp.int8
        assert v0["params"].shape == (B, NQ, 3)
        assert v0["centers"].shape == (B, NQ, 2)
        assert bool(jnp.any(v0["valid"]))  # zero-detection fallback guarantees >= 1
        cams = out["cameras"]
        for key in ["camera_zero", "camera_init", "camera_initRec",
                    "camera_avgRef0", "camera_softRef0", "camera"]:
            assert key in cams, key
            assert cams[key]["tran"].shape == (B, 3)
            assert cams[key]["rot"].shape == (B, 4)
            assert np.all(np.isfinite(np.asarray(cams[key]["rot"])))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(cams["camera"]["rot"]), axis=-1), 1.0, atol=1e-4)
        assert out["assignment"].shape == (B, NQ, NQ)


class TestStemS2D:
    def test_space_to_depth_stem_is_exact(self):
        """The s2d stem rewrite must match the plain 7x7/2 conv bitwise-ish."""
        import jax
        import jax.numpy as jnp
        from nopesac_tpu.models.resnet import _StemConv
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
        ref_m = _StemConv(s2d=False)
        v = ref_m.init(jax.random.PRNGKey(0), x)
        ref = ref_m.apply(v, x)
        got = _StemConv(s2d=True).apply(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestGTMatcherInference:
    """GT-matcher pose refinement ablation (camera_head.py:520-547;
    cfg.TEST.POSE_REFINEMENT_WITH_GT_MATCHERS)."""

    def test_inference_with_gt_geo(self, model_and_vars):
        model, variables, batch = model_and_vars
        rng = np.random.default_rng(5)
        ncorr = 3
        corr_valid = np.zeros((B, NQ), bool)
        corr_valid[:, :ncorr] = True
        gt_geo = {
            "params0": jnp.asarray(rng.normal(size=(B, NQ, 3)).astype(np.float32)),
            "params1": jnp.asarray(rng.normal(size=(B, NQ, 3)).astype(np.float32)),
            "corr_idx1": jnp.asarray(np.tile(np.arange(NQ, dtype=np.int32), (B, 1))),
            "corr_idx2": jnp.asarray(np.tile(np.arange(NQ, dtype=np.int32), (B, 1))),
            "corr_valid": jnp.asarray(corr_valid),
        }
        out = jax.jit(lambda v, a, b, g: model.apply(
            v, a, b, method=model.inference, out_h=H, out_w=W, gt_geo=g,
        ))(variables, batch["image0"], batch["image1"], gt_geo)
        # refinement consumed the GT corrs, not the predicted assignment
        assert int(np.asarray(out["num_matches"])[0]) == ncorr
        for cam in ["camera", "camera_softRef0", "camera_avgRef0"]:
            c = out["cameras"][cam]
            assert np.isfinite(np.asarray(c["tran"], np.float32)).all()
            assert np.isfinite(np.asarray(c["rot"], np.float32)).all()

    def test_perturb_planes_scales(self):
        from nopesac_tpu.engine.trainer import perturb_planes

        rng = np.random.default_rng(0)
        params = rng.normal(size=(40, 3)).astype(np.float32) * 2 + 0.5
        params[35:] = 0.0  # padding rows stay zero
        noisy = perturb_planes(params, np.random.default_rng(1), 0.1, 10.0)
        assert (noisy[35:] == 0).all()
        off0 = np.linalg.norm(params[:35], axis=-1)
        off1 = np.linalg.norm(noisy[:35], axis=-1)
        d_off = np.abs(off1 - off0)
        assert 0 < d_off.mean() < 0.5  # ~N(0, 0.1)
        n0 = params[:35] / off0[:, None]
        n1 = noisy[:35] / off1[:, None]
        ang = np.rad2deg(np.arccos(np.clip((n0 * n1).sum(-1), -1, 1)))
        assert 0 < ang.mean() < 45  # ~10 deg Euler noise
