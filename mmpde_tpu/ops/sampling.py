"""Collocation-point sampling for the DMM physics loss.

The reference draws 40*nx uniform candidates per snapshot, interpolates the
monitor onto them, and samples nx points *without replacement* with
probability proportional to the monitor via np.random.choice on host
(reference: mesh/dmm_utils.py:29-54).  There is no jit-able equivalent of
weighted sampling without replacement in jax.random, but Gumbel-top-k is
mathematically identical: the indices of the k largest ``log p + Gumbel``
values are a draw from successive renormalised categoricals.

Everything stays on device and inside jit — no host round-trip per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_topk_choice(key: jax.Array, logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """k indices sampled without replacement, P(i) ∝ softmax(logits).

    logits: [n] unnormalised log-probabilities -> int32 [k].
    """
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    _, idx = jax.lax.top_k(logits + g, k)
    return idx.astype(jnp.int32)


def weighted_choice(key: jax.Array, probs: jnp.ndarray, k: int) -> jnp.ndarray:
    """Like gumbel_topk_choice but with (unnormalised) probabilities."""
    return gumbel_topk_choice(key, jnp.log(jnp.maximum(probs, 1e-30)), k)


def boundary_points(nx: int, dtype=jnp.float32):
    """Equispaced collocation points on the 4 edges of the unit square.

    Returns (left, right, bottom, top), each [nx//4, 2]
    (reference: sample_train_data_bound, mesh/dmm_utils.py:56-103 —
    left/right edges fix x, bottom/top fix y).
    """
    n = nx // 4
    t = jnp.linspace(0.0, 1.0, n, dtype=dtype)
    zeros = jnp.zeros_like(t)
    ones = jnp.ones_like(t)
    left = jnp.stack([zeros, t], axis=-1)    # x = 0
    right = jnp.stack([ones, t], axis=-1)    # x = 1
    bottom = jnp.stack([t, zeros], axis=-1)  # y = 0
    top = jnp.stack([t, ones], axis=-1)      # y = 1
    return left, right, bottom, top
