"""Torch->JAX weight importer: layout transforms and stack mappings.

These validate the pure conversion math (torch CPU is available as a dev
dependency), not a full checkpoint load: reference checkpoints are not
vendored in this environment.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nopesac_tpu.utils.torch_import import (
    _import_detr_stack,
    _resnet_mapping,
    migrate_legacy_keys,
    split_qkv,
    t_conv,
    t_linear,
    t_linear_after_flatten,
)

torch = pytest.importorskip("torch")


class TestLayoutTransforms:
    def test_linear(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(8, 5)).astype(np.float32)
        x = rng.normal(size=(3, 5)).astype(np.float32)
        y_torch = torch.nn.functional.linear(torch.from_numpy(x), torch.from_numpy(w))
        y_jax = x @ t_linear(w)
        np.testing.assert_allclose(np.asarray(y_torch), y_jax, atol=1e-5)

    def test_conv(self):
        rng = np.random.default_rng(1)
        w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)  # OIHW
        x = rng.normal(size=(2, 4, 8, 10)).astype(np.float32)  # NCHW
        y_torch = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()
        x_nhwc = np.transpose(x, (0, 2, 3, 1))
        y_jax = jax.lax.conv_general_dilated(
            jnp.asarray(x_nhwc), jnp.asarray(t_conv(w)),
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(
            np.transpose(y_torch, (0, 2, 3, 1)), np.asarray(y_jax), atol=1e-4)

    def test_linear_after_flatten(self):
        """torch: Linear(flatten(NCHW)) == flax: Dense(flatten(NHWC))."""
        rng = np.random.default_rng(2)
        c, h, wd = 5, 2, 3
        w = rng.normal(size=(7, c * h * wd)).astype(np.float32)
        x = rng.normal(size=(4, c, h, wd)).astype(np.float32)
        y_torch = torch.nn.functional.linear(
            torch.from_numpy(x).flatten(1), torch.from_numpy(w)).numpy()
        x_nhwc = np.transpose(x, (0, 2, 3, 1)).reshape(4, -1)
        y_jax = x_nhwc @ t_linear_after_flatten(w, c, h, wd)
        np.testing.assert_allclose(y_torch, y_jax, atol=1e-5)

    def test_split_qkv(self):
        """Packed torch MHA in_proj equals the three split Dense layers."""
        rng = np.random.default_rng(3)
        d = 8
        w = rng.normal(size=(3 * d, d)).astype(np.float32)
        b = rng.normal(size=(3 * d,)).astype(np.float32)
        x = rng.normal(size=(5, d)).astype(np.float32)
        packed = torch.nn.functional.linear(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)).numpy()
        outs = [x @ kw + kb for kw, kb in split_qkv(w, b)]
        np.testing.assert_allclose(packed, np.concatenate(outs, axis=-1), atol=1e-5)


class TestKeyMapping:
    def test_migrate_legacy_keys(self):
        state = {
            "sem_seg_head.adapter_1.weight": np.zeros(1),  # legacy pixel-decoder key
            "sem_seg_head.input_proj.weight": np.zeros(1),  # head key, untouched
            "backbone.stem.conv1.weight": np.zeros(1),
        }
        out = migrate_legacy_keys(state)
        assert "sem_seg_head.pixel_decoder.adapter_1.weight" in out
        assert "sem_seg_head.input_proj.weight" in out
        assert "backbone.stem.conv1.weight" in out

    def test_resnet_mapping_covers_all_blocks(self):
        m = _resnet_mapping()
        # stem + (3+4+6+3) blocks x (3 convs + 1 shortcut) x 5 tensors; the
        # mapping lists a shortcut for every block, non-existent ones are
        # skipped at load time ("if src not in state")
        assert "backbone.res2.0.shortcut.weight" in m
        assert "backbone.res5.2.conv3.norm.running_var" in m
        assert len(m) == 5 + 16 * 15 + 16 * 5


class TestDetrStack:
    def _fake_tree(self, n_layers, d, has_cross):
        def stack(shape):
            return np.zeros((n_layers,) + shape, np.float32)

        attn = {
            "q_proj": {"kernel": stack((d, d)), "bias": stack((d,))},
            "k_proj": {"kernel": stack((d, d)), "bias": stack((d,))},
            "v_proj": {"kernel": stack((d, d)), "bias": stack((d,))},
            "out_proj": {"kernel": stack((d, d)), "bias": stack((d,))},
        }
        layer = {
            "self_attn": attn,
            "linear1": {"kernel": stack((d, 2 * d)), "bias": stack((2 * d,))},
            "linear2": {"kernel": stack((2 * d, d)), "bias": stack((d,))},
            "norm1": {"scale": stack((d,)), "bias": stack((d,))},
            "norm2": {"scale": stack((d,)), "bias": stack((d,))},
        }
        if has_cross:
            layer["cross_attn"] = {
                k: {kk: vv.copy() for kk, vv in v.items()} for k, v in attn.items()
            }
            layer["norm3"] = {"scale": stack((d,)), "bias": stack((d,))}
        return {"enc": {"layers": {"layer": layer}}}

    def test_encoder_stack_import(self):
        rng = np.random.default_rng(4)
        n_layers, d = 3, 4
        state = {}
        for i in range(n_layers):
            p = f"head.enc.layers.{i}"
            state[f"{p}.self_attn.in_proj_weight"] = rng.normal(
                size=(3 * d, d)).astype(np.float32)
            state[f"{p}.self_attn.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32)
            state[f"{p}.self_attn.out_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
            state[f"{p}.self_attn.out_proj.bias"] = rng.normal(size=(d,)).astype(np.float32)
            state[f"{p}.linear1.weight"] = rng.normal(size=(2 * d, d)).astype(np.float32)
            state[f"{p}.linear1.bias"] = rng.normal(size=(2 * d,)).astype(np.float32)
            state[f"{p}.linear2.weight"] = rng.normal(size=(d, 2 * d)).astype(np.float32)
            state[f"{p}.linear2.bias"] = rng.normal(size=(d,)).astype(np.float32)
            for ni in (1, 2):
                state[f"{p}.norm{ni}.weight"] = rng.normal(size=(d,)).astype(np.float32)
                state[f"{p}.norm{ni}.bias"] = rng.normal(size=(d,)).astype(np.float32)

        tree = self._fake_tree(n_layers, d, has_cross=False)
        n = _import_detr_stack(state, tree, "head.enc", "enc/layers", n_layers,
                               has_cross=False, strict=True)
        assert n == (3 * 2 + 2) + 4 + 4  # qkv k/b + out k/b, linears, norms

        # layer i's q kernel == transposed first third of its packed in_proj
        for i in range(n_layers):
            w = state[f"head.enc.layers.{i}.self_attn.in_proj_weight"]
            np.testing.assert_allclose(
                tree["enc"]["layers"]["layer"]["self_attn"]["q_proj"]["kernel"][i],
                t_linear(np.split(w, 3, axis=0)[0]))
            np.testing.assert_allclose(
                tree["enc"]["layers"]["layer"]["linear1"]["kernel"][i],
                t_linear(state[f"head.enc.layers.{i}.linear1.weight"]))

    def test_decoder_stack_has_cross(self):
        rng = np.random.default_rng(5)
        n_layers, d = 2, 4
        state = {}
        for i in range(n_layers):
            p = f"dec.layers.{i}"
            for at in ("self_attn", "multihead_attn"):
                state[f"{p}.{at}.in_proj_weight"] = rng.normal(
                    size=(3 * d, d)).astype(np.float32)
                state[f"{p}.{at}.in_proj_bias"] = rng.normal(size=(3 * d,)).astype(np.float32)
                state[f"{p}.{at}.out_proj.weight"] = rng.normal(size=(d, d)).astype(np.float32)
                state[f"{p}.{at}.out_proj.bias"] = rng.normal(size=(d,)).astype(np.float32)
            state[f"{p}.linear1.weight"] = rng.normal(size=(2 * d, d)).astype(np.float32)
            state[f"{p}.linear1.bias"] = rng.normal(size=(2 * d,)).astype(np.float32)
            state[f"{p}.linear2.weight"] = rng.normal(size=(d, 2 * d)).astype(np.float32)
            state[f"{p}.linear2.bias"] = rng.normal(size=(d,)).astype(np.float32)
            for ni in (1, 2, 3):
                state[f"{p}.norm{ni}.weight"] = rng.normal(size=(d,)).astype(np.float32)
                state[f"{p}.norm{ni}.bias"] = rng.normal(size=(d,)).astype(np.float32)

        tree = self._fake_tree(n_layers, d, has_cross=True)
        n = _import_detr_stack(state, tree, "dec", "enc/layers", n_layers,
                               has_cross=True, strict=True)
        assert n == 2 * (3 * 2 + 2) + 4 + 6
        cross_k = tree["enc"]["layers"]["layer"]["cross_attn"]["k_proj"]["kernel"]
        w = state["dec.layers.1.multihead_attn.in_proj_weight"]
        np.testing.assert_allclose(cross_k[1], t_linear(np.split(w, 3, axis=0)[1]))
