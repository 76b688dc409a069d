"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The ambient environment pins JAX to the remote TPU ('axon' plugin) via a
sitecustomize in PYTHONPATH that imports jax BEFORE any user code runs; with
it every XLA compile round-trips a network tunnel (~3 s each), making the
suite orders of magnitude slower.  If jax is already imported with that
plugin, re-exec pytest with a clean environment so tests run on local CPU
with 8 virtual devices (SURVEY.md §4's multi-device test strategy).

Opt into real-TPU testing with MMPDE_TEST_TPU=1.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if (not os.environ.get("MMPDE_TEST_TPU")
        and os.environ.get("_MMPDE_REEXEC") != "1"
        and "jax" in sys.modules):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO_ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["_MMPDE_REEXEC"] = "1"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

if not os.environ.get("MMPDE_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
