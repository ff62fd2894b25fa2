import os
import sys

# CPU backend with 8 virtual devices: multi-chip sharding tests run without
# TPU hardware (SURVEY.md §4).
#
# NOTE: a sitecustomize may import jax at interpreter startup with
# JAX_PLATFORMS pinned to a hardware tunnel, so mutating os.environ here is
# too late — update jax.config directly (backends initialize lazily, at the
# first operation, which is after conftest import).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
