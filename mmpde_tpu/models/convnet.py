"""Convolutional branch encoder for the array-mode DMM.

Equivalent of the reference ``ConvNet`` with ``layers == 7``
(mesh/dmm_model.py:48-81): four 5x5 convs (stride 2, 1, 1, 2) with a
residual connection from after conv1 into conv3, flatten, then
FC -> fc_hidden -> latent with tanh activations (final layer linear).

Convs run in NHWC (TPU-native layout) via flax; channel counts
1 -> 8 -> 16 -> 8 -> 1.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ConvBranchNet(nn.Module):
    """u [b, s, s] -> latent [b, latent_dim]."""

    fc_hidden: int = 1024
    latent_dim: int = 512

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        x = u[..., None]  # NHWC, 1 channel
        conv = lambda c, s, name: nn.Conv(  # noqa: E731
            c, kernel_size=(5, 5), strides=(s, s), padding=((2, 2), (2, 2)),
            name=name)
        x = jnp.tanh(conv(8, 2, "conv0")(x))
        skip = x                                  # residual source (post-act)
        x = jnp.tanh(conv(16, 1, "conv1")(x))
        x = jnp.tanh(skip + conv(8, 1, "conv2")(x))  # residual into conv3
        x = jnp.tanh(conv(1, 2, "conv3")(x))
        x = x.reshape(x.shape[0], -1)
        x = jnp.tanh(nn.Dense(self.fc_hidden, name="fc2")(x))
        return nn.Dense(self.latent_dim, name="fc3")(x)
