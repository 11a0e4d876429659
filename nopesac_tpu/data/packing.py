"""Wire format for fixed-shape training targets: pack on host, unpack on device.

The collated training batch at 480x640/bs=8 used to weigh ~423 MB, and the
end-to-end train step was host-bound on exactly that weight: collate memcpy
plus the host->device transfer dominated wall clock (the measured on-device
step is ~160 ms while the e2e iteration was ~580 ms). Almost all of those
bytes are redundant:

  * gt_masks [NQ, H, W] uint8 carries one BIT of information per byte
    -> bit-packed along W on the host (np.packbits), unpacked on device
    (one cheap shift-and-mask); 8x smaller.
  * gt_pixel_centers [H, W, 2] f32 is a deterministic function of
    (gt_masks, gt_centers) -> one einsum on device (masks are disjoint,
    data/mapper.py overlap resolution), never shipped.
  * k_inv_dot_xy1 [3, H, W] f32 is a deterministic function of K
    -> ship k_inv [3, 3] (inverted on host in f64 for parity with
    _np_coordinate_map) and rebuild the ray map on device
    (core/geometry.get_coordinate_map semantics, siamese_planeTR.py:815-839).

Wire keys (emitted by PairMapper.view_targets): gt_valid, gt_masks_packed,
gt_params, gt_centers, depth, k_inv. `unpack_targets` restores the classic
keys (gt_masks, gt_pixel_centers, k_inv_dot_xy1) and is a PASSTHROUGH when
they are already present, so hand-built target dicts (tests, external
callers) keep working unchanged.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def pack_mask_bits_np(masks: np.ndarray) -> np.ndarray:
    """[..., H, W] 0/1 uint8 -> [..., H, W//8] uint8 (MSB-first, W % 8 == 0)."""
    if masks.shape[-1] % 8:
        raise ValueError(f"width {masks.shape[-1]} not divisible by 8")
    return np.packbits(masks, axis=-1)


def unpack_mask_bits_np(packed: np.ndarray) -> np.ndarray:
    """Host twin of the device unpack: [..., H, W//8] -> [..., H, W] uint8."""
    return np.unpackbits(packed, axis=-1)


def unpack_mask_bits(packed: jnp.ndarray) -> jnp.ndarray:
    """Device unpack: [..., H, W//8] uint8 -> [..., H, W] uint8 (MSB-first,
    matching np.packbits' default big bit order)."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))


def coordinate_map_from_kinv(k_inv: jnp.ndarray, h: int, w: int,
                             dtype=jnp.float32) -> jnp.ndarray:
    """k_inv [..., 3, 3] -> ray map [..., 3, h, w].

    Same pixel->canonical-640x480 rescale as _np_coordinate_map /
    core.geometry.get_coordinate_map (siamese_planeTR.py:815-839); the 3x3
    inverse itself happens on the host in f64, so this is just the matmul.
    """
    x = (jnp.arange(w, dtype=dtype) / w * 640.0)[None, :].repeat(h, axis=0)
    y = (jnp.arange(h, dtype=dtype) / h * 480.0)[:, None].repeat(w, axis=1)
    xy1 = jnp.stack([x, y, jnp.ones((h, w), dtype=dtype)], axis=0).reshape(3, -1)
    out = jnp.matmul(k_inv.astype(dtype), xy1)
    return out.reshape(k_inv.shape[:-2] + (3, h, w))


def unpack_targets(t: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Restore the classic per-view target keys from the wire format.

    Passthrough when the dict already carries unpacked keys. Shapes are
    static, so under jit this is resolved at trace time.
    """
    if "gt_masks" in t:
        return t
    out = dict(t)
    packed = out.pop("gt_masks_packed")
    masks = unpack_mask_bits(packed)  # [B, NQ, H, W] uint8
    out["gt_masks"] = masks
    h, w = masks.shape[-2:]
    # disjoint masks (mapper overlap resolution) -> scatter == einsum;
    # ellipsis handles both batched [B, NQ, H, W] and per-sample [NQ, H, W]
    out["gt_pixel_centers"] = jnp.einsum(
        "...nhw,...nc->...hwc", masks.astype(jnp.float32), t["gt_centers"])
    k_inv = out.pop("k_inv")
    out["k_inv_dot_xy1"] = coordinate_map_from_kinv(k_inv, h, w)
    return out


def unpack_targets_np(t: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Host twin of unpack_targets (numpy; for host-side consumers/tests)."""
    if "gt_masks" in t:
        return dict(t)
    out = dict(t)
    packed = out.pop("gt_masks_packed")
    masks = unpack_mask_bits_np(packed)
    out["gt_masks"] = masks
    h, w = masks.shape[-2:]
    centers = np.asarray(t["gt_centers"], np.float32)
    flat = masks.reshape(masks.shape[:-3] + (masks.shape[-3], h * w))
    out["gt_pixel_centers"] = np.einsum(
        "...np,...nc->...pc", flat.astype(np.float32), centers
    ).reshape(masks.shape[:-3] + (h, w, 2))
    k_inv = np.asarray(out.pop("k_inv"), np.float32)
    x = (np.arange(w, dtype=np.float32) / w * 640.0)[None, :].repeat(h, 0)
    y = (np.arange(h, dtype=np.float32) / h * 480.0)[:, None].repeat(w, 1)
    xy1 = np.stack([x, y, np.ones((h, w), np.float32)]).reshape(3, -1)
    kmap = np.matmul(k_inv, xy1)
    out["k_inv_dot_xy1"] = kmap.reshape(k_inv.shape[:-2] + (3, h, w))
    return out
