"""Device mesh + sharding helpers (data parallelism over ICI).

The reference's only parallelism is DDP via torch.distributed/NCCL
(SURVEY.md section 2.2). TPU-native equivalent: a 1-D `data` mesh with the
batch sharded over it; gradient all-reduce is inserted by XLA under jit with
sharding constraints (riding ICI), replacing the NCCL ring.

Multi-host: call `initialize_distributed()` first (jax.distributed), then the
mesh spans all processes' devices.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def _multihost_cpu_determinism_flags() -> None:
    """Pin the deterministic HLO scheduler for multi-host XLA:CPU runs.

    The concurrency-optimized CPU scheduler orders independent collectives
    nondeterministically across compiles, so two processes each compiling
    the same train-step HLO can disagree on collective ORDER and gloo
    aborts with "Received data size doesn't match expected size" (observed;
    diagnosed in tests/two_process_worker.py). The default scheduler is
    deterministic. The flag is CPU-only — harmless on a TPU backend, where
    the compiler is shared across hosts and schedules deterministically.
    Must run BEFORE the first backend/compiler initialization.
    """
    import os

    tok = "--xla_cpu_enable_concurrency_optimized_scheduler=false"
    flags = os.environ.get("XLA_FLAGS", "")
    if tok not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + tok).strip()


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper (no-op for single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    _multihost_cpu_determinism_flags()
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


_BARRIER_SEQ = [0]


def coordination_barrier(name: str, timeout_ms: int = 1_200_000) -> None:
    """Rendezvous all processes via the coordination service (pure gRPC — no
    gloo/ICI collective, so no device-clique init behind it).

    Use immediately before a program's FIRST device collective: gloo context
    init has a hard ~30s KV-store timeout, while inter-host skew at that
    point can be minutes (one host hits the persistent compile cache, the
    other compiles — observed killing the 2-process mid-train-eval test at
    Trainer._init_state's device_put onto the global mesh). The sequence
    counter keeps barrier ids unique per call site visit; host code is SPMD
    so every process sees the same sequence.
    """
    if jax.process_count() <= 1:
        return
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        _BARRIER_SEQ[0] += 1
        client.wait_at_barrier(f"nopesac_{name}_{_BARRIER_SEQ[0]}", timeout_ms)
    except Exception:  # pragma: no cover - older jax layouts
        from .host_gather import all_gather_objects

        all_gather_objects(name)


def staggered_compile(jitted, *args):
    """Compile `jitted(*args)` on every host, rank 0 first, with barriers.

    Multi-host programs deadlock-prone pattern: host compiles can finish
    minutes apart (cold persistent caches, shared cores), and the first
    global collective's clique init has a hard ~30s KV-store timeout — so
    the skew entering it must be bounded by ONE compile, not N. Rank 0
    compiles, releases a coordination-service barrier (pure RPC, no device
    collective, 20-min timeout), then the rest compile, then a final
    object-gather re-synchronises everyone before the first real step.
    Single-process: returns `jitted` unchanged.
    """
    if jax.process_count() == 1:
        return jitted
    from .host_gather import all_gather_objects

    lowered = jitted.lower(*args)
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        barrier = lambda name: client.wait_at_barrier(name, 1200 * 1000)
    except Exception:  # pragma: no cover - older jax layouts
        barrier = lambda name: all_gather_objects(name)
    if jax.process_index() == 0:
        compiled = lowered.compile()
        barrier("nopesac_staggered_compile_rank0")
    else:
        barrier("nopesac_staggered_compile_rank0")
        compiled = lowered.compile()
    all_gather_objects("compiled")
    return compiled


def make_mesh(n_devices: Optional[int] = None, local: bool = False) -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all).

    local=True builds the mesh from this process's addressable devices only
    (the per-host eval case: each host runs an independent unsharded program
    over its own dataset shard, then host_gather merges). A cross-process
    mesh would make jit fail on every host whose devices it omits.
    """
    devices = jax.local_devices() if local else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process: the array IS the global batch — plain device_put.
    Multi-process: each host passes only its LOCAL slice (global_batch /
    process_count rows, produced by its sharded PairLoader) and the global
    array is assembled from the per-process slices — the TPU-native
    equivalent of DDP's per-rank batches.
    """
    sh = batch_sharding(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        if multiproc:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
