"""Pallas TPU kernel: blocked softmax-IDW interpolation.

Computes out[q] = sum_p softmax_p(-scale * ||src_p - query_q||) * val_p
with a flash-attention-style streaming softmax over SOURCE TILES: the
[Q, N_src] weight matrix is never materialised in HBM — each (query tile,
source tile) block lives in VMEM with online max/sum renormalisation.

The jnp reference implementation (ops/interpolate.py) materialises [Q, N]
weights; fine for reference-sized meshes (N ~ 2.3k), quadratic-memory-bound
for large ones.  This kernel keeps HBM traffic at O(Q + N) per batch
element.

Backward: custom VJP recomputes weights through the jnp path (the op is a
softmax-matmul; recompute is cheaper than stashing [Q, N]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 256    # query tile
TS = 512    # source tile


def _idw_kernel(src_ref, val_ref, q_ref, out_ref, *, scale, n_src_tiles):
    """src [NS, 2], val [NS, C], q [TQ, 2] block -> out [TQ, C] block."""
    q = q_ref[:, :]                               # [TQ, 2]
    c = val_ref.shape[-1]

    def body(i, carry):
        m, l, acc = carry
        s = src_ref[pl.ds(i * TS, TS), :]         # [TS, 2]
        v = val_ref[pl.ds(i * TS, TS), :]         # [TS, C]
        dx = q[:, 0:1] - s[:, 0][None, :]         # [TQ, TS]
        dy = q[:, 1:2] - s[:, 1][None, :]
        logits = -scale * jnp.sqrt(dx * dx + dy * dy + 1e-24)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)               # [TQ, TS]
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((q.shape[0], 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), dtype=jnp.float32)
    a0 = jnp.zeros((q.shape[0], c), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_src_tiles, body, (m0, l0, a0))
    out_ref[:, :] = acc / l


def _round_up(x, m):
    return (x + m - 1) // m * m


def _idw_pallas_single(val, src, query, scale, interpret=False):
    """val [N, C], src [N, 2], query [Q, 2] -> [Q, C] (one batch element)."""
    n, c = val.shape
    qn = query.shape[0]
    n_pad = _round_up(n, TS)
    q_pad = _round_up(qn, TQ)
    # pad sources far away: exp(logit - max) underflows to 0 exactly
    src_p = jnp.pad(src, ((0, n_pad - n), (0, 0)), constant_values=1e9)
    val_p = jnp.pad(val, ((0, n_pad - n), (0, 0)))
    query_p = jnp.pad(query, ((0, q_pad - qn), (0, 0)))

    kernel = functools.partial(_idw_kernel, scale=float(scale),
                               n_src_tiles=n_pad // TS)
    out = pl.pallas_call(
        kernel,
        grid=(q_pad // TQ,),
        in_specs=[
            pl.BlockSpec((n_pad, 2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TQ, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, c), jnp.float32),
        interpret=interpret,
    )(src_p, val_p, query_p)
    return out[:qn]


def _idw_ref(val, src, query, scale):
    """Differentiable jnp reference (same math as ops.interpolate)."""
    diff = src[None, :, :] - query[:, None, :]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-24)
    w = jax.nn.softmax(-d * scale, axis=-1)
    return w @ val


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def idw_points_pallas(val, src, query, scale, interpret=False):
    """Batched Pallas softmax-IDW: val [B, N, C], src [B, N, 2],
    query [B, Q, 2] -> [B, Q, C]."""
    return jax.vmap(lambda v, s, q: _idw_pallas_single(
        v, s, q, scale, interpret))(val, src, query)


def _fwd(val, src, query, scale, interpret):
    return idw_points_pallas(val, src, query, scale, interpret), \
        (val, src, query)


def _bwd(scale, interpret, res, g):
    val, src, query = res
    _, vjp = jax.vjp(
        lambda v, s, q: jax.vmap(
            lambda vv, ss, qq: _idw_ref(vv, ss, qq, scale))(v, s, q),
        val, src, query)
    return vjp(g)


idw_points_pallas.defvjp(_fwd, _bwd)
