"""Persistent-compile-cache directories keyed by host CPU fingerprint.

XLA:CPU persists AOT executables specialised to the *compiling* machine's
LLVM feature set; loading them on a host with different features is allowed
but "could lead to execution errors such as SIGILL" (cpu_aot_loader.cc) —
observed here as a silent worker death inside a Gloo collective when a
round's workspace moved between heterogeneous build hosts. TPU executables
are device-side and don't care about host features, so only the CPU cache
is namespaced.
"""
from __future__ import annotations

import hashlib
import os
import platform

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _machine_fingerprint() -> str:
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{feats}"
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def cpu_cache_dir(repo_root: str | None = None) -> str:
    """Per-machine CPU compile cache (safe across heterogeneous hosts)."""
    root = repo_root or _REPO
    return os.path.join(root, ".jax_cache_cpu", _machine_fingerprint())


def tpu_cache_dir(repo_root: str | None = None) -> str:
    root = repo_root or _REPO
    return os.path.join(root, ".jax_cache")
