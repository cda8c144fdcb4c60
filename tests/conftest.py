"""Test configuration: force a virtual 8-device CPU mesh for sharding tests.

Real TPU runs happen through bench.py / the driver; unit tests must be
hermetic and run anywhere, so we pin JAX to CPU with 8 virtual devices
before jax initializes.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU in-process so unit
# tests are hermetic and never depend on the (occasionally flaky) tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)
