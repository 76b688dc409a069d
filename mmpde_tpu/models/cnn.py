"""Residual CNN baseline (reference models_cnn.py:8-83, ``BaseCNN``).

8 Conv2d layers with circular padding and growing kernels, ELU activations
and skip connections; predicts ``u_last + cumsum(dt) * delta``.  Runs NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class BaseCNN(nn.Module):
    time_window: int = 25
    hidden_channels: int = 40
    dt: float = 1.0

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        """u [B, tw, nx, ny] -> [B, tw, nx, ny] (squeezed like reference)."""
        x = jnp.moveaxis(u, 1, -1)  # NHWC with tw channels

        def conv(c, k, name):
            return nn.Conv(c, kernel_size=(k, k), padding="CIRCULAR", name=name)

        h = nn.elu(conv(self.hidden_channels, 3, "conv1")(x))
        h = h + nn.elu(conv(self.hidden_channels, 5, "conv2")(h))
        h = h + nn.elu(conv(self.hidden_channels, 5, "conv3")(h))
        h = h + nn.elu(conv(self.hidden_channels, 5, "conv4")(h))
        h = h + nn.elu(conv(self.hidden_channels, 7, "conv5")(h))
        h = h + nn.elu(conv(self.hidden_channels, 7, "conv6")(h))
        h = h + nn.elu(conv(self.hidden_channels, 7, "conv7")(h))
        h = conv(self.time_window, 9, "conv8")(h)
        delta = jnp.moveaxis(h, -1, 1)  # [B, tw, nx, ny]

        dt = jnp.cumsum(jnp.full((self.time_window,), self.dt,
                                 dtype=delta.dtype))
        u_last = u[:, -1:, :, :]
        out = u_last + dt[None, :, None, None] * delta
        return jnp.squeeze(out)


class BaseCNN3d(nn.Module):
    """3-D variant (reference models_cnn.py:86-163, ``BaseCNN3d``) — kept for
    API parity; unused by the reference CLIs.  u [B, tw, nx, ny, nz]."""

    time_window: int = 25
    hidden_channels: int = 40
    dt: float = 1.0

    @nn.compact
    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        x = jnp.moveaxis(u, 1, -1)  # NDHWC with tw channels

        def conv(c, k, name):
            return nn.Conv(c, kernel_size=(k, k, k), padding="CIRCULAR",
                           name=name)

        h = nn.elu(conv(self.hidden_channels, 3, "conv1")(x))
        h = h + nn.elu(conv(self.hidden_channels, 3, "conv2")(h))
        h = h + nn.elu(conv(self.hidden_channels, 3, "conv3")(h))
        h = h + nn.elu(conv(self.hidden_channels, 3, "conv4")(h))
        h = h + nn.elu(conv(self.hidden_channels, 3, "conv5")(h))
        h = conv(self.time_window, 3, "conv6")(h)
        delta = jnp.moveaxis(h, -1, 1)

        dt = jnp.cumsum(jnp.full((self.time_window,), self.dt,
                                 dtype=delta.dtype))
        u_last = u[:, -1:]
        out = u_last + dt[None, :, None, None, None] * delta
        return jnp.squeeze(out)
