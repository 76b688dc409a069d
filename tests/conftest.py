"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Must set the environment before the first jax import so sharding tests can
exercise multi-device paths without TPU hardware (SURVEY.md §4).
"""

import os
import sys

# Force CPU (the ambient env pins JAX_PLATFORMS to the TPU plugin) unless the
# caller explicitly asks for TPU with MMPDE_TEST_TPU=1.
if not os.environ.get("MMPDE_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
