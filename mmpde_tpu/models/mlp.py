"""Tanh MLP that also exposes its penultimate activations.

Equivalent of the reference ``DenseNet`` (mesh/dmm_model.py:9-45): a stack of
Linear layers with tanh between them; ``__call__`` returns
``(out, penultimate)`` where ``penultimate`` is the post-tanh activation of
the last hidden layer — the random-feature refit treats those as the fixed
feature map (reference: mesh/dmm_utils.py:884-905).

The reference class also carries unused ``center``/``B`` buffers hard-coded
to CUDA (mesh/dmm_model.py:27-28); they never enter the forward pass and are
deliberately not replicated.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class DenseNet(nn.Module):
    """layers = [in, h1, ..., out]; tanh between layers, linear head."""

    layers: Sequence[int]

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        n_layers = len(self.layers) - 1
        assert n_layers >= 1
        for j in range(n_layers - 1):
            x = jnp.tanh(nn.Dense(self.layers[j + 1], name=f"dense_{j}")(x))
        out = nn.Dense(self.layers[-1], name=f"dense_{n_layers - 1}")(x)
        return out, x
