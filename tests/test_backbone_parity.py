"""Backbone import parity: flax ResNet-50 + torch_import vs an executable
d2-layout torch ResNet-50 (tests/ref_resnet.py).

The one module with no parity row until now. Validates the full released-
checkpoint import path end to end: a torch state_dict in d2 naming
(`backbone.stem.conv1.*`, `backbone.res{2..5}.{i}.*`) saved as a .pth,
pulled through `utils/torch_import.py` (OIHW->HWIO transpose, FrozenBN
scale/bias/mean/var routing), then res2..res5 feature maps compared
against the torch model executed on the same input.

Spec: /root/reference/configs/Base.yaml:1-12 (build_resnet_backbone,
DEPTH=50, STRIDE_IN_1X1=False, FrozenBN, OUT_FEATURES res2-res5).
"""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_reference_parity import DIFFS, record

from nopesac_tpu.models.resnet import ResNet
from nopesac_tpu.utils.torch_import import import_torch_weights

H, W = 64, 96


def teardown_module(module):
    import json

    out = os.path.join(os.path.dirname(__file__), "..", ".parity_diffs.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(DIFFS)
    with open(out, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    from ref_resnet import ResNet50, randomize_

    tmodel = ResNet50()
    randomize_(tmodel, seed=7)
    tmodel.eval()

    # save as a reference-shaped checkpoint ({"model": {"backbone.<k>": ...}})
    # so the exact load_torch_checkpoint -> import_torch_weights path runs
    path = str(tmp_path_factory.mktemp("ckpt") / "backbone.pth")
    sd = {f"backbone.{k}": v for k, v in tmodel.state_dict().items()}
    torch.save({"model": sd}, path)

    jmodel = ResNet(depth=50)
    x = np.random.default_rng(3).normal(
        size=(2, H, W, 3)).astype(np.float32)
    params = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    imported = import_torch_weights({"backbone": params}, path)
    return tmodel, jmodel, imported["backbone"], x


def test_every_backbone_tensor_imported(both):
    """Completeness: each torch tensor lands on a flax leaf (no silent
    name-mapping drops), leaf-for-leaf with matching element counts."""
    tmodel, jmodel, params, _ = both
    t_total = sum(v.numel() for v in tmodel.state_dict().values())
    j_total = sum(int(np.prod(v.shape))
                  for v in jax.tree_util.tree_leaves(params))
    assert t_total == j_total
    # no leaf kept its flax init: the import touched everything.
    fresh = jmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    fresh_leaves = jax.tree_util.tree_leaves_with_path(fresh)
    imp = dict(jax.tree_util.tree_leaves_with_path(params))
    untouched = [jax.tree_util.keystr(p) for p, v in fresh_leaves
                 if np.array_equal(np.asarray(imp[p]), np.asarray(v))]
    assert not untouched, f"leaves never written by the importer: {untouched}"


def test_feature_parity_res2_to_res5(both):
    tmodel, jmodel, params, x = both
    with torch.no_grad():
        tfeats = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    jfeats = jax.jit(lambda p, v: jmodel.apply({"params": p}, v))(
        params, jnp.asarray(x))
    for name in ("res2", "res3", "res4", "res5"):
        ref = np.transpose(tfeats[name].numpy(), (0, 2, 3, 1))
        ours = np.asarray(jfeats[name])
        assert ours.shape == ref.shape
        # activations are O(1); 1e-4 abs catches any conv/BN layout slip
        scale = max(1.0, float(np.abs(ref).max()))
        record(f"backbone {name} feature map (Base.yaml:4-12, d2 "
               f"build_resnet_backbone)", ours / scale, ref / scale, 1e-4)


def test_stem_s2d_variant_matches(both):
    """The space-to-depth stem rewrite must stay exact under imported
    (non-init) weights too."""
    _, _, params, x = both
    jm = ResNet(depth=50, stem_s2d=True)
    base = ResNet(depth=50)
    a = jax.jit(lambda p, v: jm.apply({"params": p}, v))(params, jnp.asarray(x))
    b = jax.jit(lambda p, v: base.apply({"params": p}, v))(params, jnp.asarray(x))
    for name in a:
        np.testing.assert_allclose(np.asarray(a[name]), np.asarray(b[name]),
                                   atol=2e-5, rtol=2e-5)


def test_mixed_precision_train_policy(both):
    """MODEL.BACKBONE_TRAIN_DTYPE=bfloat16: block interiors compute bf16 but
    the residual trunk (and the returned feature maps) stay f32 in train
    mode, tracking the homogeneous-f32 policy within bf16 rounding; the
    eval-mode graph is unaffected bit-for-bit (resnet.py policy note)."""
    _, _, params, x = both
    ref = ResNet(depth=50, remat=False)
    mix = ResNet(depth=50, remat=False, train_block_dtype=jnp.bfloat16)
    xj = jnp.asarray(x)
    a = jax.jit(lambda p, v: ref.apply({"params": p}, v, True))(params, xj)
    b = jax.jit(lambda p, v: mix.apply({"params": p}, v, True))(params, xj)
    for name in a:
        assert b[name].dtype == jnp.float32  # trunk stays f32
        sa, sb = np.asarray(a[name]), np.asarray(b[name])
        scale = max(1.0, float(np.abs(sa).max()))
        # bf16 has ~2^-8 relative ulps; block contributions accumulate f32
        np.testing.assert_allclose(sb / scale, sa / scale, atol=4e-2)
        # global-max normalisation alone under-constrains small-magnitude
        # channels (a sign flip below 4% of max would pass) — also require
        # near-unit cosine alignment and a bounded relative L2 error of the
        # whole feature map, which small-channel corruption would break.
        num = float((sa * sb).sum())
        cos = num / max(float(np.linalg.norm(sa) * np.linalg.norm(sb)), 1e-12)
        assert cos > 0.9995, (name, cos)
        rel_l2 = float(np.linalg.norm(sb - sa)) / max(
            float(np.linalg.norm(sa)), 1e-12)
        assert rel_l2 < 4e-2, (name, rel_l2)
    # eval path: identical program regardless of the train-only knob
    ea = jax.jit(lambda p, v: ref.apply({"params": p}, v, False))(params, xj)
    eb = jax.jit(lambda p, v: mix.apply({"params": p}, v, False))(params, xj)
    for name in ea:
        np.testing.assert_array_equal(np.asarray(ea[name]), np.asarray(eb[name]))
    # gradients flow through the mixed graph and land f32 (master weights)
    def loss(p):
        f = mix.apply({"params": p}, xj, True)
        return sum(jnp.sum(v ** 2) for v in f.values())
    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
