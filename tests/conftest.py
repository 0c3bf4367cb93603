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
