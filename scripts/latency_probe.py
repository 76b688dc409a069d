"""Dispatch/round-trip latency probe for the remote-attached TPU.

Separates the three fixed costs that bound any per-batch training loop on
this chip (ROADMAP #8: name where the ~95 ms the component table does not
account for goes):
  1. blocking round-trip of a trivial jitted op (pure dispatch+sync),
  2. pipelined dispatch throughput of the same op (queue depth without
     host sync),
  3. host->device transfer of one training batch's index rows.

If (1) is tens of ms, the per-batch path has a latency floor no kernel
fusion can cross and the scan-epoch path (one dispatch per epoch) is the
structural fix.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from mmpde_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 8))
    jax.block_until_ready(f(x))

    # 1. blocking round trip
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(f(x))
    rt = (time.perf_counter() - t0) / n

    # 2. pipelined dispatch (block once)
    t0 = time.perf_counter()
    y = x
    for _ in range(n):
        y = f(y)
    jax.block_until_ready(y)
    pipelined = (time.perf_counter() - t0) / n

    # 3. one batch worth of host->device index rows (the per-step transfer
    # of the per-batch training loop: [B] trajectory ids + [B] start steps)
    idx = np.arange(6, dtype=np.int32)
    t0 = time.perf_counter()
    for _ in range(n):
        jax.block_until_ready(jnp.asarray(idx))
    h2d_small = (time.perf_counter() - t0) / n

    # 4. one full-batch trajectory tensor [6, 31, 48, 48] f32 (what the
    # per-batch loop actually ships when not device-resident)
    u = np.zeros((6, 31, 48, 48), np.float32)
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jnp.asarray(u))
    h2d_batch = (time.perf_counter() - t0) / 5

    out = {"metric": "tpu_dispatch_latency",
           "blocking_roundtrip_ms": round(rt * 1e3, 2),
           "pipelined_dispatch_ms": round(pipelined * 1e3, 2),
           "h2d_index_rows_ms": round(h2d_small * 1e3, 2),
           "h2d_batch_4mb_ms": round(h2d_batch * 1e3, 2)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
