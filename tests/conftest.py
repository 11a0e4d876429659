"""Test config: force CPU backend with 8 virtual devices.

Multi-chip sharding logic is validated on a fake 8-device CPU mesh
(the standard JAX trick; see SURVEY.md section 4).

NOTE: this environment's sitecustomize registers an `axon` TPU backend and
overrides JAX_PLATFORMS, so we must force CPU via jax.config after import.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the first full-suite run pays the (single
# core) XLA compile cost; reruns start in seconds
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
from nopesac_tpu.utils.jax_cache import cpu_cache_dir  # noqa: E402

# per-machine subdir: stale AOT executables from a different build host can
# SIGILL (see utils/jax_cache.py)
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir(_REPO))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
