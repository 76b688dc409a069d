"""Message-passing PDE solver over fixed-degree neighbor lists.

Equivalent of the reference ``MP_PDE_Solver_2D``/``GNN_Layer_FS_2D``
(gnn_2d.py:19-141) re-designed for TPU: instead of an edge list +
torch_scatter scatter-mean, every node carries a dense ``[k]`` neighbor
index row (kNN graphs have exactly k in-neighbors), so message passing is

    gather [B, N, k, H]  ->  message MLP (batched matmul, MXU)
                         ->  mean over k (VPU reduction)

with no scatter at all and fully static shapes.  BatchNorm statistics run
over the flattened (B*N) node set, matching the reference's one-big-graph
batching (data_creator_2d.py:242-254).

Radius graphs use the same layout with a validity mask (masked mean).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def gather_nodes(x: jnp.ndarray, nbr: jnp.ndarray) -> jnp.ndarray:
    """x [B, N, F], nbr [B, N, k] or [N, k] -> neighbor features [B, N, k, F]."""
    if nbr.ndim == 2:
        return x[:, nbr, :]
    return jax.vmap(lambda xb, nb: xb[nb])(x, nbr)


class _NodeNorm(nn.Module):
    """BatchNorm over the flattened node axis of [B, N, F] tensors."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        shape = x.shape
        x = x.reshape(-1, shape[-1])
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return x.reshape(shape)


class GNNLayer(nn.Module):
    """One message-passing layer (reference gnn_2d.py:19-69).

    message  = ReLU(W2 ReLU(W1 [h_i, h_j, u_i-u_j, dpos_x, dpos_y, vars_i]))
    update   = ReLU(W4 ReLU(W3 [h_i, mean_j message, vars_i]))
    out      = BatchNorm(h_i + update)

    node_mesh: optional jax.sharding.Mesh with a 'node' axis — the neighbor
    gather goes through the explicit shard_map halo path
    (parallel/node_parallel.py::sharded_gather_nodes): each shard holds N/D
    nodes, all-gathers only the H-wide feature table over ICI, and every
    [*, N/D, k, H] edge tensor stays strictly shard-local.  For meshes too
    large for one chip's HBM this bounds per-device residency by N/D
    (the message-passing analog of sequence parallelism, SURVEY.md §5).
    """

    hidden: int
    node_mesh: Optional[object] = None

    def _gather(self, s_node, nbr):
        if self.node_mesh is None:
            return gather_nodes(s_node, nbr)
        from mmpde_tpu.parallel.node_parallel import sharded_gather_nodes
        if nbr.ndim == 2:
            nbr = jnp.broadcast_to(nbr[None], s_node.shape[:1] + nbr.shape)
        return sharded_gather_nodes(self.node_mesh, s_node, nbr)

    @nn.compact
    def __call__(self, h, u, pos_x, pos_y, variables, nbr, train: bool,
                 mask: Optional[jnp.ndarray] = None, act=nn.relu):
        k = nbr.shape[-1]
        dense1 = nn.Dense(self.hidden, name="message_net_1")

        # message_net_1 is linear over the concat
        # [h_i, h_j, u_i-u_j, dpos_x, dpos_y, var_i]; split it into a
        # target-side per-NODE projection A and a source-side per-NODE
        # projection S, so the [B, N, k, 2H+...] edge tensor (0.5 GB at the
        # reference config) never materialises — only a 128-wide gather does.
        # Exactly equivalent math with the identical parameter tree.
        zh = jnp.zeros_like(h)
        zv = jnp.zeros_like(variables)
        bias = dense1(jnp.zeros((1, 2 * h.shape[-1] + u.shape[-1] + 2
                                 + variables.shape[-1]), h.dtype))
        a_node = dense1(jnp.concatenate(
            [h, zh, u, pos_x, pos_y, variables], axis=-1))       # i-terms + b
        s_node = dense1(jnp.concatenate(
            [zh, h, -u, -pos_x, -pos_y, zv], axis=-1)) - bias    # j-terms
        # MMPDE_BF16=1: edge tensors ([B,N,k,H] — the step's dominant HBM
        # traffic) compute in bfloat16; per-node projections, the k-mean
        # accumulation, updates and BatchNorm stay f32.
        edge_dtype = (jnp.bfloat16
                      if os.environ.get("MMPDE_BF16") == "1" else None)
        if edge_dtype is not None:
            a_node = a_node.astype(edge_dtype)
            s_node = s_node.astype(edge_dtype)
        dense2 = nn.Dense(self.hidden, name="message_net_2")
        # MMPDE_PALLAS_MP=1: fused Pallas edge MLP (relu -> matmul -> relu
        # -> k-mean in one VMEM-resident kernel; see ops/pallas_edge.py).
        # kNN graphs with the relu activation only; identical math.
        use_pallas = (mask is None and act is nn.relu
                      and self.node_mesh is None
                      and os.environ.get("MMPDE_PALLAS_MP") == "1")
        if use_pallas:
            from mmpde_tpu.ops.pallas_edge import edge_mlp
            # materialise message_net_2's kernel/bias through the module so
            # the parameter tree is unchanged
            b2 = dense2(jnp.zeros((1, self.hidden), a_node.dtype))[0]
            w2 = dense2(jnp.eye(self.hidden, dtype=a_node.dtype)) - b2[None]
            m = edge_mlp(a_node, gather_nodes(s_node, nbr), w2, b2)
        else:
            m = act(a_node[:, :, None, :] + self._gather(s_node, nbr))
            m = act(dense2(m))
            if edge_dtype is not None:
                m = m.astype(jnp.float32)
            if mask is None:
                m = jnp.mean(m, axis=2)
            else:
                if mask.ndim == 2:  # shared [N, k] mask -> broadcast
                    mask = mask[None]
                w = mask[..., None].astype(m.dtype)
                m = jnp.sum(m * w, axis=2) / jnp.maximum(
                    jnp.sum(w, axis=2), 1.0)

        upd_in = jnp.concatenate([h, m, variables], axis=-1)
        upd = act(nn.Dense(self.hidden, name="update_net_1")(upd_in))
        upd = act(nn.Dense(self.hidden, name="update_net_2")(upd))
        h = h + upd
        return _NodeNorm(name="norm")(h, train)


class _GNNScanCell(nn.Module):
    """nn.scan cell: carry = h, broadcast inputs, per-layer stacked params."""

    hidden: int
    node_mesh: Optional[object] = None

    @nn.compact
    def __call__(self, h, u, pos_x, pos_y, variables, nbr, train, mask, act):
        h = GNNLayer(self.hidden, node_mesh=self.node_mesh, name="layer")(
            h, u, pos_x, pos_y, variables, nbr, train, mask, act)
        return h, None


def gnn_stack(n_layers: int, hidden: int, name: str, node_mesh=None):
    """Stack of message-passing layers as ONE scanned program.

    The six unrolled layers of the reference (gnn_2d.py:91-97) would appear
    six times in the XLA program (x2 models, x forward+backward); scanning
    keeps one copy with parameters stacked along a leading layer axis —
    compile time drops by roughly the layer count at identical runtime.

    Layer-scan unrolling (DEFAULT ON since round 4; opt out with
    MMPDE_UNROLL_LAYERS=0): the scan executes unrolled in the COMPILED
    program (same stacked parameter tree, same math, checkpoint-
    compatible — `lax.scan(unroll=L)`), letting XLA schedule/fuse across
    layer boundaries.  The r4 profile showed the scan `while` ops at
    ~133 of 192 ms/step; unrolling measured **162.6 vs 193.0 ms/step**
    (-16%, logs/r4b_ab_unroll_layers.log).  Cost: longer compiles
    (one-time, persistent-cached).
    """
    unroll = (1 if os.environ.get("MMPDE_UNROLL_LAYERS") == "0"
              else n_layers)
    cell = _GNNScanCell
    if os.environ.get("MMPDE_REMAT_LAYERS") == "1":
        # remat each layer: the backward recomputes the layer forward
        # instead of carrying the saved [L, B, N, 260] activation stacks
        # through the while loop (the r4 profile shows two such bf16
        # stacks dominating the 3.2 GB/step the scanned backward reads) —
        # the classic trade-FLOPs-for-HBM move; the layer matmuls are
        # ~free on the MXU
        cell = nn.remat(_GNNScanCell, static_argnums=(7, 9))
    return nn.scan(
        cell,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast,) * 8,
        length=n_layers,
        unroll=unroll,
        metadata_params={nn.meta.PARTITION_NAME: None},
    )(hidden, node_mesh, name=name)


class MPSolver2D(nn.Module):
    """MP-PDE solver (reference gnn_2d.py:72-141).

    Inputs per graph batch:
      u        [B, N, tw]   node history window
      pos      [B, N, 3]    (t, x, y) — already normalised by tmax/Lx/Ly here
      nbr      [N, k] or [B, N, k] neighbor indices
    Output: [B, N, tw] prediction (the reference predicts the labels directly
    as ``cumsum(dt * 0.1) * decoder(h)``, gnn_2d.py:136-139).
    """

    time_window: int = 1
    hidden_features: int = 128
    hidden_layer: int = 6
    dt: float = 1.0
    lx: float = 1.0
    ly: float = 1.0
    tmax: float = 1.0
    # optional Mesh with a 'node' axis: explicit shard_map halo gather, see
    # GNNLayer.node_mesh (large-mesh node-axis sharding)
    node_mesh: Optional[object] = None

    @nn.compact
    def __call__(self, u, pos, nbr, train: bool = False,
                 mask: Optional[jnp.ndarray] = None):
        b, n, tw = u.shape
        pos_x = pos[..., 1:2] / self.lx
        pos_y = pos[..., 2:3] / self.ly
        variables = pos[..., 0:1] / self.tmax  # time as the equation variable

        node_input = jnp.concatenate([u, pos_x, pos_y, variables], axis=-1)
        h = nn.Dense(self.hidden_features, name="embed_0")(node_input)
        h = _NodeNorm(name="embed_norm_0")(h, train)
        h = nn.relu(h)
        h = nn.Dense(self.hidden_features, name="embed_1")(h)
        h = _NodeNorm(name="embed_norm_1")(h, train)

        h, _ = gnn_stack(self.hidden_layer, self.hidden_features,
                         name="gnn_layers", node_mesh=self.node_mesh)(
            h, u, pos_x, pos_y, variables, nbr, train, mask, nn.relu)

        # Conv1d decoder over the feature axis (gnn_2d.py:108-114):
        # (1,4,k16,s3) -> (4,8,k12,s3) -> (8,1,k8,s2), 128 features -> 1.
        # The reference stack only has positive output lengths for
        # hidden_features == 128; smaller widths fall back to a Dense head.
        l1 = (self.hidden_features - 16) // 3 + 1
        l2 = (l1 - 12) // 3 + 1 if l1 >= 12 else 0
        l3 = (l2 - 8) // 2 + 1 if l2 >= 8 else 0
        if l3 >= 1:
            x = h.reshape(b * n, self.hidden_features, 1)
            x = nn.relu(nn.Conv(4, kernel_size=(16,), strides=(3,),
                                padding="VALID", name="dec_0")(x))
            x = nn.relu(nn.Conv(8, kernel_size=(12,), strides=(3,),
                                padding="VALID", name="dec_1")(x))
            x = nn.Conv(1, kernel_size=(8,), strides=(2,),
                        padding="VALID", name="dec_2")(x)
            diff = x.reshape(b, n, -1)[..., :1]  # [B, N, 1]
        else:
            diff = nn.Dense(1, name="dec_dense")(h)  # [B, N, 1]

        dt = jnp.cumsum(jnp.full((self.time_window,), self.dt * 0.1,
                                 dtype=diff.dtype))
        return dt[None, None, :] * diff  # broadcast [B, N, tw]
