import os
import sys

# Tests run on CPU with a virtual 8-device mesh so sharding/collective code
# paths are exercised without TPU hardware (standard JAX testing practice).
# The axon sitecustomize registers a TPU backend unconditionally, so the
# platform must be forced through jax.config, not just the environment.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Full-tier runs (-m "") accumulate thousands of in-process XLA CPU
    compilations (the fuzz campaigns drive cli.main in-process); past
    ~380 tests the next backend compile segfaults inside XLA's JIT —
    reproducibly at the same test, while any module subset passes.
    Dropping executable references at module boundaries keeps the
    process-wide live-compilation count bounded; within-module caching
    (where reuse actually happens) is untouched."""
    yield
    jax.clear_caches()
