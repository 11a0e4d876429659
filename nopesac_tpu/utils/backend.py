"""Backend detection that survives the axon TPU tunnel.

The axon PJRT plugin registers its platform as "axon" (canonicalized to
"tpu" only for MLIR lowering rules), so `jax.default_backend() == "tpu"`
can be False on a real TPU chip. Every TPU-only fast path in the repo
(Pallas kernels, layer-scan unrolling, the s2d stem) must gate on this
helper instead — a string-equality check against "tpu" silently downgrades
the whole model to the portable slow path when running through the tunnel.
"""
from __future__ import annotations


def on_tpu() -> bool:
    """True when the default JAX backend executes on TPU hardware."""
    import jax

    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        return True
    if backend != "cpu":
        # unknown plugin name: fall back to the device kind string
        try:
            return "tpu" in jax.devices()[0].device_kind.lower()
        except Exception:
            return False
    return False
