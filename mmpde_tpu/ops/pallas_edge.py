"""Fused edge-MLP Pallas kernel for GNN message passing.

The hot inner op of the MP-PDE solver layer (reference gnn_2d.py:19-69,
re-expressed in models/gnn.py as a dense [B, N, k, H] edge computation) is

    out[b, i] = mean_j  relu( relu(a[b, i] + gs[b, i, j]) @ W2 + b2 )

where ``a`` is the target-node projection, ``gs`` the gathered source-node
projections, and W2/b2 the message_net_2 parameters.  XLA materialises the
[B, N, k, H] edge tensor in HBM several times per layer (relu temp, matmul
operand, matmul result, mean input) — at the reference config that tensor
is 124 MB (bf16), so each extra pass costs ~0.3 ms of HBM bandwidth and the
58 ms GNN fwd+bwd share of the step is traffic-bound, not compute-bound
(the matmuls are ~16 GFLOP/layer, <0.1 ms of MXU time).

This kernel reads the gathered edge input ONCE per direction and keeps all
intermediates in VMEM:

  forward:  (a, gs, W2, b2) -> out            1 read of gs, 1 write of out
  backward: (a, gs, W2, g)  -> (da, dgs, dW2, db2)   recompute-based,
            1 read of gs + 1 write of dgs (the scatter back to the source
            nodes stays in XLA — Mosaic has no scatter, and XLA already
            pays that pass today).

The gather itself also stays in XLA: Mosaic's dynamic_gather only handles
single-vreg tables ("Multiple source vregs along gather dimension"), so an
in-kernel row gather from a [2304, 128] table cannot lower on this
toolchain.

Opt-in via MMPDE_PALLAS_MP=1 (kNN graphs; masked/radius graphs fall back
to the XLA path).  Tested against the XLA reference implementation for
forward values and all four gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tile(n: int) -> int:
    for t in (128, 64, 32, 16, 8):
        if n % t == 0:
            return t
    return n


# ------------------------------------------------------------------ forward


def _fwd_kernel(a_ref, gs_ref, w_ref, b_ref, out_ref, *, k: int):
    a = a_ref[0]                                    # [TN, H]
    gs = gs_ref[0]                                  # [TN, k, H]
    w = w_ref[:].astype(jnp.float32)                # [H, H]
    b = b_ref[:].astype(jnp.float32)                # [1, H]
    tn, h = a.shape
    e = jnp.maximum(a[:, None, :] + gs, 0.0)        # [TN, k, H]
    z = jnp.dot(e.reshape(tn * k, h).astype(jnp.float32), w,
                preferred_element_type=jnp.float32) + b
    m = jnp.maximum(z, 0.0).reshape(tn, k, h)
    out_ref[0] = jnp.mean(m, axis=1)


def _edge_mlp_fwd_impl(a, gs, w, b):
    bsz, n, k, h = gs.shape
    tn = _tile(n)
    grid = (bsz, n // tn)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((bsz, n, h), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tn, k, h), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((h, h), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tn, h), lambda i, j: (i, j, 0)),
        interpret=_interpret(),
    )(a, gs, w, b)


# ----------------------------------------------------------------- backward


def _bwd_kernel(a_ref, gs_ref, w_ref, b_ref, g_ref,
                da_ref, dgs_ref, dw_ref, db_ref, *, k: int):
    a = a_ref[0]                                    # [TN, H]
    gs = gs_ref[0]                                  # [TN, k, H]
    w = w_ref[:].astype(jnp.float32)                # [H, H]
    b = b_ref[:].astype(jnp.float32)                # [1, H]
    g = g_ref[0].astype(jnp.float32)                # [TN, H]
    tn, h = a.shape

    pre = (a[:, None, :] + gs).reshape(tn * k, h).astype(jnp.float32)
    e = jnp.maximum(pre, 0.0)
    z = jnp.dot(e, w, preferred_element_type=jnp.float32) + b
    gm = jnp.broadcast_to((g / k)[:, None, :], (tn, k, h)).reshape(tn * k, h)
    dz = jnp.where(z > 0.0, gm, 0.0)                # [TN*k, H]
    de = jnp.dot(dz, w.T, preferred_element_type=jnp.float32)
    de = jnp.where(pre > 0.0, de, 0.0)

    da_ref[0] = jnp.sum(de.reshape(tn, k, h), axis=1).astype(da_ref.dtype)
    dgs_ref[0] = de.reshape(tn, k, h).astype(dgs_ref.dtype)

    dw_tile = jnp.dot(e.T, dz, preferred_element_type=jnp.float32)
    db_tile = jnp.sum(dz, axis=0, keepdims=True)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        dw_ref[:] = dw_tile
        db_ref[:] = db_tile

    @pl.when(jnp.logical_not(first))
    def _():
        dw_ref[:] = dw_ref[:] + dw_tile
        db_ref[:] = db_ref[:] + db_tile


def _edge_mlp_bwd_impl(a, gs, w, b, g):
    bsz, n, k, h = gs.shape
    tn = _tile(n)
    grid = (bsz, n // tn)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, h), a.dtype),
            jax.ShapeDtypeStruct((bsz, n, k, h), gs.dtype),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tn, k, h), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((h, h), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h), lambda i, j: (0, 0)),
            pl.BlockSpec((1, tn, h), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tn, h), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, tn, k, h), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((h, h), lambda i, j: (0, 0)),
            pl.BlockSpec((1, h), lambda i, j: (0, 0)),
        ),
        interpret=_interpret(),
    )(a, gs, w, b, g)


# ------------------------------------------------------------- public op


def _maybe_upcast(a, gs, w, b):
    # Mosaic cannot relayout sub-lane-width (H % 128 != 0) bf16 tiles on
    # this toolchain (verified: H=128 bf16 lowers, H=16 bf16 fails compile);
    # f32 lowers at any H.  Upcast narrow feature dims — production GNN
    # hidden is 128, so the bf16 bandwidth win is kept where it matters.
    if a.dtype != jnp.float32 and a.shape[-1] % 128 != 0:
        return (a.astype(jnp.float32), gs.astype(jnp.float32),
                w.astype(jnp.float32), b.astype(jnp.float32))
    return a, gs, w, b


@jax.custom_vjp
def edge_mlp(a, gs, w, b):
    """mean_j relu(relu(a[:, :, None] + gs) @ w + b) -> [B, N, H] (f32).

    a [B, N, H], gs [B, N, k, H] (gathered source projections), w [H, H],
    b [H].  Equivalent math to models/gnn.py's message_net_2 block; fused
    so the [B, N, k, H] intermediates never round-trip HBM.
    """
    a, gs, w, b = _maybe_upcast(a, gs, w, b)
    return _edge_mlp_fwd_impl(a, gs, w, b.reshape(1, -1))


def _edge_mlp_fwd(a, gs, w, b):
    ac, gsc, wc, bc = _maybe_upcast(a, gs, w, b)
    out = _edge_mlp_fwd_impl(ac, gsc, wc, bc.reshape(1, -1))
    return out, (a, gs, w, b)


def _edge_mlp_bwd(res, g):
    a, gs, w, b = res
    ac, gsc, wc, bc = _maybe_upcast(a, gs, w, b)
    da, dgs, dw, db = _edge_mlp_bwd_impl(ac, gsc, wc, bc.reshape(1, -1), g)
    return (da.astype(a.dtype), dgs.astype(gs.dtype), dw.astype(w.dtype),
            db.reshape(-1).astype(b.dtype))


edge_mlp.defvjp(_edge_mlp_fwd, _edge_mlp_bwd)


def edge_mlp_reference(a, gs, w, b):
    """Pure-XLA reference used by the fallback path and tests."""
    e = jnp.maximum(a[:, :, None, :].astype(jnp.float32) +
                    gs.astype(jnp.float32), 0.0)
    z = jnp.einsum("bnkh,hH->bnkH", e, w.astype(jnp.float32),
                   preferred_element_type=jnp.float32) + b
    return jnp.mean(jnp.maximum(z, 0.0), axis=2)
