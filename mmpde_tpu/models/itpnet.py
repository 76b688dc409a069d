"""Learnable mesh-to-mesh interpolation network (+ residual-cut correction).

Equivalent of the reference ``ItpNet`` (interpolate.py:5-99).  Three
sub-networks selected by ``mode``:

  '1'       weights for uniform -> moved-mesh interpolation over 30 kNN
            neighbors: MLP([30*2+2, *layers1, 30]) on the flattened
            (neighbor coords, query coord) stack; weights are NOT normalised.
  '2'       same shape for moved -> uniform interpolation.
  'res_cut' additive correction on the full field: for grid experiments a
            4x Conv2d(k5) stack over channels res_cut_node=[1,4,16,4,1]
            with tanh after every conv (including the last); for mesh
            experiments a Linear n->2048->512->2048->n autoencoder.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class ItpNet(nn.Module):
    ori_nx: int
    ori_ny: Optional[int]          # None => mesh (cylinder) experiment
    layers1: Sequence[int] = (128, 64)
    layers2: Sequence[int] = (128, 64)
    res_cut_node: Sequence[int] = (1, 4, 16, 4, 1)
    n_neighbors: int = 30

    def _weight_mlp(self, x, widths, prefix):
        dims = list(widths) + [self.n_neighbors]
        for j, w in enumerate(dims):
            x = nn.Dense(w, name=f"{prefix}_{j}")(x)
            if j != len(dims) - 1:
                x = jnp.tanh(x)
        return x

    @nn.compact
    def __call__(self, neighbors=None, query_points=None, mode: str = "1",
                 data=None):
        if mode in ("1", "2"):
            # neighbors [B, Q, n, 2], query_points [B, Q, 1, 2]
            x = jnp.concatenate([neighbors, query_points], axis=-2)
            x = x.reshape(x.shape[0], x.shape[1], -1)  # [B, Q, 2n+2]
            widths = self.layers1 if mode == "1" else self.layers2
            return self._weight_mlp(x, widths, f"w{mode}")

        if mode == "res_cut":
            if self.ori_ny is not None:
                # data [B, C, nx, ny] -> NHWC conv stack, tanh after each conv
                x = jnp.moveaxis(data, 1, -1)
                for j in range(len(self.res_cut_node) - 1):
                    x = jnp.tanh(nn.Conv(
                        self.res_cut_node[j + 1], kernel_size=(5, 5),
                        padding=((2, 2), (2, 2)), name=f"res_{j}")(x))
                return jnp.moveaxis(x, -1, 1)
            # mesh experiment: data [B, n] -> autoencoder MLP
            x = data
            for j, w in enumerate((2048, 512, 2048, self.ori_nx)):
                x = nn.Dense(w, name=f"res_{j}")(x)
                if j != 3:
                    x = jnp.tanh(x)
            return x

        raise ValueError(f"unknown ItpNet mode {mode!r}")
