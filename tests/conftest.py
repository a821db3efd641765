"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding paths are validated on a simulated 8-device CPU mesh
(the driver separately dry-runs the multi-chip path; benches use the real
TPU).  Must run before jax is imported anywhere.
"""

import os
import sys

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunneled
# TPU), which makes every distinct-shape compile a 20-40s remote round trip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if "jax" in sys.modules:
    # the axon sitecustomize eagerly imports jax at interpreter startup,
    # making the env pins above too late — reconfigure and reset
    import jax
    import jax.extend

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.extend.backend.clear_backends()

# No persistent compilation cache for the CPU test profile: the cache
# WRITE (compilation_cache.put_executable_and_time) segfaults the
# process on some CPU executables under jax 0.9.0 — observed
# deterministically on the alc3 sparse phase-2 program.  Benches keep
# their own cache (bench.py main); the TPU backend serializes fine.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import pytest  # noqa: E402

_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _bounded_executable_accumulation():
    """Clear jit caches every few tests: jax 0.9.0's CPU backend
    segfaults inside backend_compile_and_load once a process has
    accumulated ~20 compile-heavy tests' worth of live executables
    (reproduced twice at the same point of tests/test_alc3.py, different
    tests each time, cache on or off).  Dropping executable references
    periodically keeps the arena bounded; each test file's shapes are
    mostly unique, so the recompile cost is small."""
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % 8 == 0:
        import jax

        jax.clear_caches()
