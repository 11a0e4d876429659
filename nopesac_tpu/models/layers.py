"""Shared NN building blocks (flax.linen), NHWC layout throughout.

TPU-first notes:
  * All convs are NHWC so XLA can tile directly onto the MXU.
  * FrozenBatchNorm is an affine fold (the d2 ResNet default) - no batch stats.
  * Trainable BatchNorm syncs batch stats over the `data` mesh axis when an
    axis_name is provided (replacing torch SyncBN-less DDP semantics).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()


class FrozenBatchNorm(nn.Module):
    """BatchNorm with frozen statistics folded to a per-channel affine.

    Stores (scale, bias, mean, var) so torch checkpoints import losslessly;
    computation is y = (x - mean) * scale / sqrt(var + eps) + bias.
    Spec: detectron2 FrozenBatchNorm2d as used by the d2 ResNet (Base.yaml:4).
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * mul + add


class ConvBN(nn.Module):
    """Conv2D + (trainable) BatchNorm + activation, NHWC.

    Spec: planeTR_head.py:209-215 (conv_bn_relu) and camera_modules.py:36-48
    (conv2d with LeakyReLU, eps=1e-3, momentum=0.01).
    """

    features: int
    kernel_size: int = 1
    strides: int = 1
    activation: Callable = nn.relu
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: Dtype = jnp.float32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            kernel_init=xavier_uniform,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            axis_name=self.axis_name if train else None,
        )(x)
        return self.activation(x)


class ConvGN(nn.Module):
    """Conv2D + GroupNorm(32) + optional relu, NHWC (d2 Conv2d norm='GN')."""

    features: int
    kernel_size: int = 1
    num_groups: int = 32
    use_activation: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=xavier_uniform,
        )(x)
        x = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype)(x)
        return nn.relu(x) if self.use_activation else x


class MLP(nn.Module):
    """Simple FFN: num_layers Dense layers with ReLU between (not after last).

    Spec: camera_modules.py:226-244 / planeTR_head.py:194-206.
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, kernel_init=xavier_uniform)(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def sine_position_embedding(h: int, w: int, num_pos_feats: int = 128,
                            temperature: float = 10000.0, dtype=jnp.float32):
    """DETR sine positional embedding for an h x w map -> [h*w, 2*num_pos_feats].

    Spec: transformer/position_encoding.py:12-52 (normalize=True, scale=2*pi).
    Returned flattened row-major (y, x) to match `flatten(2)` in the reference.
    """
    import numpy as np

    y_embed = np.tile(np.arange(1, h + 1, dtype=np.float32)[:, None], (1, w))
    x_embed = np.tile(np.arange(1, w + 1, dtype=np.float32)[None, :], (h, 1))
    eps = 1e-6
    scale = 2 * np.pi
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos = np.concatenate([pos_y, pos_x], axis=2).reshape(h * w, 2 * num_pos_feats)
    return jnp.asarray(pos, dtype=dtype)


def upsample_nearest(x, factor: int = 2):
    """NHWC nearest-neighbour upsample by an integer factor."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def upsample_bilinear(x, out_h: int, out_w: int):
    """NHWC bilinear resize with align_corners=False (torch F.interpolate)."""
    return jax.image.resize(x, (x.shape[0], out_h, out_w, x.shape[-1]), method="bilinear")


def max_pool_2x2(x):
    """2x2/2 max pool, NHWC (torch nn.MaxPool2d(kernel_size=2, stride=2))."""
    return nn.max_pool(x, (2, 2), strides=(2, 2))
