"""Pallas TPU kernel: fused 1x1-conv + FrozenBN + residual-add + ReLU.

In the ResNet bottleneck (models/resnet.py, spec: d2 ResNet-50 with
FrozenBN), XLA executes the block tail as two separate HBM passes:

    conv3 (1x1)            read [P,64]  + write [P,256]
    BN + add + relu        read [P,256] x2 + write [P,256]

The second pass is pure bandwidth (measured 3.4 ms/step of
`add_maximum_fusion` at bs=16 on v5e — the residual adds over
[16,120,160,256]-sized maps). A 1x1 conv is a matmul over pixels, so the
whole tail fuses into one kernel with a single read of each operand:

    y = relu((x @ W) * scale + shift + residual)

FrozenBN folds into a per-channel (scale, shift) applied to the f32 matmul
accumulator before casting back to bf16 (same numerics as XLA's
bf16-in/f32-accumulate conv followed by elementwise BN).

The same kernel (residual=None) covers plain 1x1 conv + BN (+opt relu),
used for the block-0 projection shortcut.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w_ref, sc_ref, sh_ref, res_ref, o_ref, *, relu: bool):
    acc = jnp.dot(x_ref[0], w_ref[...],
                  preferred_element_type=jnp.float32)  # [TP, Cout] f32
    acc = acc * sc_ref[...] + sh_ref[...]
    if res_ref is not None:
        acc = acc + res_ref[0].astype(jnp.float32)
    if relu:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


def conv1x1_bn_add_relu(x, w, scale, shift, residual=None, relu=True,
                        tile_px: int = 2048, interpret: bool = False):
    """y = relu((x @ w) * scale + shift [+ residual]) over pixels.

    x: [B, P, Cin] (bf16), w: [Cin, Cout], scale/shift: [Cout] f32,
    residual: [B, P, Cout] or None. Returns [B, P, Cout] in x.dtype.
    """
    b, p, cin = x.shape
    cout = w.shape[1]
    pp = _round_up(p, tile_px) if p > tile_px else _round_up(p, 8)
    tp = min(tile_px, pp)
    if pp != p:
        x = jnp.pad(x, ((0, 0), (0, pp - p), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, pp - p), (0, 0)))
    n_tiles = pp // tp

    w = w.astype(x.dtype)
    scale = scale.astype(jnp.float32).reshape(1, cout)
    shift = shift.astype(jnp.float32).reshape(1, cout)

    in_specs = [
        pl.BlockSpec((1, tp, cin), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cin, cout), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, w, scale, shift]
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, tp, cout), lambda i, j: (i, j, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
        kernel = functools.partial(_kernel, relu=relu)
    else:
        kernel = functools.partial(
            lambda xr, wr, scr, shr, orf, relu: _kernel(
                xr, wr, scr, shr, None, orf, relu=relu), relu=relu)

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, cout), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, pp, cout), x.dtype),
        interpret=interpret,
    )(*args)
    return out[:, :p]
