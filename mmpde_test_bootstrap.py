"""Early pytest bootstrap (loaded via ``-p`` in pytest.ini, BEFORE output
capture starts).

The ambient environment preloads jax with the remote-TPU 'axon' plugin via a
sitecustomize on PYTHONPATH; every XLA compilation then round-trips a
network tunnel (~3 s), making the CPU test suite ~10x slower.  Re-exec
pytest with a clean environment (local CPU backend, 8 virtual devices) when
that contamination is detected.  Opt into TPU testing with MMPDE_TEST_TPU=1.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))

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
