"""Runtime environment setup.

Enables the persistent XLA compilation cache so the heavy fused training
programs compile once per machine instead of once per process — on this
environment the TPU backend compiles through a remote tunnel where a large
program can take many minutes.
"""

from __future__ import annotations

import os


def enable_fast_paths():
    """Default-on validated fast paths (opt out with =0):

    MMPDE_BF16       bfloat16 GNN edge-tensor compute (f32 accumulation)
    MMPDE_GRID_KNN   analytic window kNN for uniform-grid queries
    MMPDE_LOCAL_KNN  locality-restricted kNN for moved-mesh queries
                     (exact up to equidistant ties; DIVERGENCES.md §20)

    Numerics covered by tests/test_models.py, tests/test_ops.py and
    tests/test_local_knn.py; throughput history in RESULTS.md.
    """
    os.environ.setdefault("MMPDE_BF16", "1")
    os.environ.setdefault("MMPDE_GRID_KNN", "1")
    os.environ.setdefault("MMPDE_LOCAL_KNN", "1")


def on_axon_runtime() -> bool:
    """True when jax runs through the experimental 'axon' remote-TPU plugin.

    The plugin registers platform name 'axon' but its devices (and
    ``jax.default_backend()``) report plain 'tpu', so backend-name checks
    do NOT identify it — probe the env pin and the registered-backends
    table instead.  Used to gate workarounds for axon-runtime faults
    (DIVERGENCES.md #41)."""
    if "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return True
    # RuntimeError is in both nets: backends() INITIALIZES backends and
    # raises it when no platform comes up — a probe, not a crash site
    try:  # public registry surface (jax>=0.4 jax.extend)
        from jax.extend.backend import backends
        return "axon" in backends()
    except (ImportError, AttributeError, RuntimeError):
        pass
    try:  # private fallback for older jax
        from jax._src import xla_bridge
        return "axon" in xla_bridge.backends()
    except (ImportError, AttributeError, RuntimeError):
        # Both probes broke (jax upgrade).  Failing open silently would
        # re-create the round-4 dead-guard bug (RESULTS.md round-4 tail),
        # so say so once and let JAX_PLATFORMS be the manual override.
        print("[mmpde] WARNING: axon-runtime probe failed (jax backend "
              "registry moved); assuming NOT axon. Set JAX_PLATFORMS=axon "
              "to force the DIVERGENCES-41 fallback.")
        return False


def setup_compilation_cache(cache_dir: str | None = None):
    import jax

    enable_fast_paths()

    try:
        if jax.default_backend() != "tpu":
            # CPU artifacts cached from the remote-compile service carry
            # different host CPU features (SIGILL risk) — TPU only.
            return
    except Exception:
        return
    cache_dir = cache_dir or os.environ.get(
        "MMPDE_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
    _seed_from_committed(cache_dir)


def _seed_from_committed(cache_dir: str):
    """Copy committed compile-cache entries (.jax_cache_seed/, populated at
    the end of a round from the big training programs) into the active
    persistent cache, so a freshly-wiped VM skips the 25-60 min cold remote
    compile of the fused training step.  Same mechanism bench.py uses with
    its own .jax_cache_bench seed."""
    import shutil
    seed = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache_seed")
    if not os.path.isdir(seed):
        return
    os.makedirs(cache_dir, exist_ok=True)
    for name in os.listdir(seed):
        dst = os.path.join(cache_dir, name)
        if not os.path.exists(dst):
            try:
                shutil.copy2(os.path.join(seed, name), dst)
            except OSError:
                pass
