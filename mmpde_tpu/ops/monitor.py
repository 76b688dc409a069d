"""Monitor function and finite-difference gradients.

The monitor ``m(u) = 1 + |grad u| / (0.01 * alpha)`` with
``alpha = mean |grad u|`` concentrates mesh density where the solution
varies fastest (reference: mesh/dmm_utils.py:209-225).

Pure jnp — XLA fuses the whole block into a handful of elementwise kernels;
nothing here warrants a Pallas kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def diff_x(u: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along axis -2 with last-row replication.

    Matches reference mesh/dmm_utils.py:215-219 (``diff_x``).
    u: [..., nx, ny]
    """
    d = jnp.diff(u, axis=-2)
    return jnp.concatenate([d, d[..., -1:, :]], axis=-2)


def diff_y(u: jnp.ndarray) -> jnp.ndarray:
    """Forward difference along axis -1 with last-column replication.

    Matches reference mesh/dmm_utils.py:221-225 (``diff_y``).
    """
    d = jnp.diff(u, axis=-1)
    return jnp.concatenate([d, d[..., :, -1:]], axis=-1)


_NORM_EPS = 1e-24  # keeps sqrt/norm differentiable at exactly-zero gradients


def monitor(alpha: jnp.ndarray, ux: jnp.ndarray, uy: jnp.ndarray) -> jnp.ndarray:
    """m = 1 + sqrt(ux^2 + uy^2) / (0.01 * alpha).

    (reference: mesh/dmm_utils.py:209-210). ``alpha`` broadcasts against
    ``ux``/``uy``.  The norm is epsilon-guarded: d/dx sqrt(x) at 0 is inf and
    poisons the backward pass wherever the field is exactly flat.
    """
    return 1.0 + jnp.sqrt(ux ** 2 + uy ** 2 + _NORM_EPS) / (0.01 * alpha)


def monitor_stats(u: jnp.ndarray):
    """Common DMM sampling block: gradients, alpha, monitor, RHS.

    u: [b, s, s] solution snapshots on a uniform grid over [0,1]^2.
    Returns (ux, uy, alpha[b], m[b,s,s], RHS[b]) where
      ux, uy   — finite differences scaled to unit-domain derivatives
      alpha    — mean |grad u| over the grid
      RHS      — integral of the monitor (trapezoid-free mean, as reference)
    (reference: mesh/dmm_utils.py:33-37).
    """
    s = u.shape[-1]
    ux = diff_x(u) * (s - 1)
    uy = diff_y(u) * (s - 1)
    gnorm = jnp.sqrt(ux ** 2 + uy ** 2 + _NORM_EPS)
    alpha = jnp.sum(gnorm, axis=(-2, -1)) / (s - 1) ** 2
    m = monitor(alpha[..., None, None], ux, uy)
    rhs = jnp.sum(m, axis=(-2, -1)) / (s - 1) ** 2
    return ux, uy, alpha, m, rhs
