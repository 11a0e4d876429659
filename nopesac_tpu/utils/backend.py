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


def on_axon_tunnel() -> bool:
    """True when TPU access goes through the axon remote-execution tunnel.

    The tunnel remote-compiles every program server-side; very large HLO
    graphs (e.g. the 6x-unrolled layer scans COMBINED with Mosaic custom
    calls) have been observed to never finish compiling there (>540 s vs
    157 s for either alone), so unroll policies cap themselves under it.
    """
    import os

    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") or \
            os.environ.get("AXON_LOOPBACK_RELAY"):
        return True
    # JAX_PLATFORMS is a comma-separated priority list; "axon,cpu" or
    # case variants must still trip the gate (the whole point of this
    # helper is to avoid the >540s remote-compile hang)
    platforms = [p.strip().lower()
                 for p in os.environ.get("JAX_PLATFORMS", "").split(",")]
    return "axon" in platforms


def pallas_ok() -> bool:
    """True when Pallas (Mosaic) kernels should be used.

    Same as :func:`on_tpu`, with an emergency override: NOPESAC_PALLAS=0
    forces every Pallas gate to the portable XLA path (e.g. when a remote-
    compile tunnel mis-executes a kernel), NOPESAC_PALLAS=1 forces it on.
    """
    import os

    v = os.environ.get("NOPESAC_PALLAS")
    if v is not None and v.strip() != "":
        # normalise so 'False', 'OFF', 'no' all disable (operator intent)
        return v.strip().lower() not in ("0", "false", "off", "no")
    return on_tpu()
