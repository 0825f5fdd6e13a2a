"""
Test session configuration.

- CPU backend with 8 virtual devices: sharding/mesh tests run on a simulated
  multi-chip topology (the driver separately dry-runs the real multi-chip
  path via __graft_entry__.dryrun_multichip).
- float64 enabled: the CPU regression suite is the bit-accuracy oracle vs the
  reference's float64 scipy trajectories; the TPU path runs float32.
- Persistent compilation cache: this host has a single CPU core, so XLA
  compiles dominate wall time — the cache makes repeat test runs fast.

Backend-selection note: the container pre-sets JAX_PLATFORMS=axon (a tunneled
TPU PJRT plugin) and a sitecustomize imports jax at interpreter startup, so
env vars set here are too late — the selection must go through jax.config.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
if not os.environ.get("WT_NO_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

# The reference implementation (read-only mount) doubles as the regression
# oracle where available.
REFERENCE_SRC = "/root/reference/src"
if os.path.isdir(REFERENCE_SRC) and REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)


# The jaxlib CPU client has segfaulted (SIGSEGV inside
# compilation_cache.get_executable_and_time -> cpu_aot_loader) when a
# long suite run accumulates hundreds of live compiled executables and
# then deserializes another persistent-cache entry — reproduced at 3
# different tests (always in whichever fused-kernel module ran after
# ~60 modules), never in the same modules run solo or in small groups.
# Dropping the in-process executable registry between modules keeps the
# live count low; re-JITs hit the persistent cache, so the cost is
# file reads, not recompiles.
import pytest as _pytest


@_pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
