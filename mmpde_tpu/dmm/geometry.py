"""Mesh movement geometry: phi, grad phi, Hessian phi.

The moved mesh is ``x = xi + grad_xi phi(u, xi)`` and the Monge-Ampere loss
consumes the full coordinate Hessian of phi (reference:
data_creator_2d.py:104-107 and mesh/dmm_utils.py:520-532, which chain six
``torch.autograd.grad`` calls).  Here each query point evaluates

    phi        scalar
    grad       jax.grad                (reverse, width-1)
    hessian    jax.jacfwd(jax.grad)    (forward-over-reverse, width-2 input)

vmapped over queries and snapshots — the branch features are computed once
per snapshot outside the derivative path (see models/dmm.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mmpde_tpu.models.dmm import DMM


def branch_features(model: DMM, variables, u, grid=None, nbr=None,
                    train: bool = False, mutable=False):
    """Snapshot encoder: u [b, ...] -> features [b, latent].

    Graph mode uses BatchNorm; pass mutable=['batch_stats'] while training
    the DMM branch to collect statistics (returns (feat, new_state) then).
    """
    kwargs = dict(method=DMM.branch_features)
    if mutable:
        return model.apply(variables, u, grid, nbr, train,
                           mutable=mutable, **kwargs)
    return model.apply(variables, u, grid, nbr, train, **kwargs)


def _phi_scalar(model: DMM, variables, feat: jnp.ndarray, xi: jnp.ndarray):
    """feat [latent], xi [2] -> scalar phi."""
    return model.apply(variables, feat, xi, method=DMM.phi_given_branch)


def phi_derivatives(model: DMM, variables, feat, xi,
                    order: int = 2):
    """Per-query potential and coordinate derivatives.

    feat [b, latent], xi [b, q, 2]
    order=1 -> (phi [b, q], grad [b, q, 2])
    order=2 -> (phi, grad, hess [b, q, 2, 2])
    """
    f = lambda ft, x: _phi_scalar(model, variables, ft, x)  # noqa: E731
    g = jax.grad(f, argnums=1)

    def per_query(ft, x):
        if order == 1:
            return f(ft, x), g(ft, x)
        return f(ft, x), g(ft, x), jax.jacfwd(g, argnums=1)(ft, x)

    inner = jax.vmap(per_query, in_axes=(None, 0))   # over queries
    outer = jax.vmap(inner, in_axes=(0, 0))          # over snapshots
    return outer(feat, xi)


def moved_mesh(model: DMM, variables, u, xi, grid=None, nbr=None):
    """x = xi + grad_xi phi(u, xi).

    u [b, ...], xi [b, q, 2] -> moved coordinates [b, q, 2].
    (reference: GraphCreator_FS_2D.moving_mesh, data_creator_2d.py:88-113.)
    """
    feat = branch_features(model, variables, u, grid, nbr, train=False)
    _, grad = phi_derivatives(model, variables, feat, xi, order=1)
    return xi + grad


def rf_feature_derivatives(model: DMM, variables, feat, xi,
                           order: int = 2):
    """Derivatives of the penultimate head features for the RF refit.

    The random-feature method freezes everything except the last linear
    layer of out_nn and needs the coordinate derivatives of the penultimate
    features s(xi): so_x, so_y (and second derivatives so_xx, so_xy, so_yy)
    since phi = s(xi) @ W^T (reference: mesh/dmm_utils.py:884-945).

    feat [b, latent], xi [b, q, 2] ->
      order=1: (s [b,q,F], ds [b,q,F,2])
      order=2: (s, ds, d2s [b,q,F,2,2])
    """
    def s_fn(ft, x):
        _, second = model.apply(variables, ft, x, rf=True,
                                method=DMM.phi_given_branch)
        return second

    js = jax.jacrev(s_fn, argnums=1)

    def per_query(ft, x):
        if order == 1:
            return s_fn(ft, x), js(ft, x)
        return s_fn(ft, x), js(ft, x), jax.jacfwd(js, argnums=1)(ft, x)

    inner = jax.vmap(per_query, in_axes=(None, 0))
    outer = jax.vmap(inner, in_axes=(0, 0))
    return outer(feat, xi)
