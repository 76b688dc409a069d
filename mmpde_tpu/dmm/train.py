"""DMM training: Adam phase, optional L-BFGS phase, random-feature refit.

Equivalent of the reference ``train_MA_res`` (mesh/dmm_utils.py:391-1095),
restructured so every inner iteration — sampling, MA loss with nested
coordinate derivatives, optimizer update — is one jitted step.

Phases (mirroring the reference defaults):
  1. Adam, ``epochs_adam`` epochs of ``max(1, train_sample_grid * M /
     (bx * bu))`` inner steps each, lr 2e-4, MultiStep decay at epochs
     [100, 150] (gamma 0.2), Adam-style weight decay 1e-5.
  2. L-BFGS (``epochs_lbfgs``, default 0): optax.lbfgs on a freshly sampled
     batch per inner iteration.  Divergence from reference: torch LBFGS
     re-samples data inside every closure evaluation
     (mesh/dmm_utils.py:567-573); here the batch is fixed during each
     line-search for a well-defined objective.
  3. Random-feature refit (``epochs_rf``): freeze everything except the
     final linear layer of out_nn; extract penultimate features and their
     coordinate derivatives; solve for the last-layer weights with
     full-batch L-BFGS (stands in for torchmin BFGS/Newton-CG,
     mesh/dmm_utils.py:922-945).
"""

from __future__ import annotations

import time
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mmpde_tpu import ops
from mmpde_tpu.dmm import sampler as S
from mmpde_tpu.dmm.geometry import branch_features, rf_feature_derivatives
from mmpde_tpu.dmm.loss import MALossConfig, MALossTerms, ma_loss
from mmpde_tpu.models.dmm import DMM


class DMMTrainConfig(NamedTuple):
    experiment: str = "burgers"
    train_sample_grid: int = 5000
    batch_size_x_adam: int = 120
    batch_size_u_adam: int = 160
    batch_size_x_lbfgs: int = 100
    batch_size_u_lbfgs: int = 120
    batch_size_x_rf: int = 16
    batch_size_u_rf: int = 20
    epochs_adam: int = 150
    epochs_lbfgs: int = 0
    epochs_rf: int = 5
    lr_adam: float = 2e-4
    lr_lbfgs: float = 1e-3
    weight_decay: float = 1e-5
    gamma_adam: float = 0.2
    gamma_lbfgs: float = 0.2
    max_iter: int = 300          # RF L-BFGS iterations
    lbfgs_inner: int = 20        # L-BFGS iterations per sampled batch
    rf: bool = True
    convex_rel: float = 0.0
    seed: int = 0


def _sample(cfg: DMMTrainConfig, key, all_u, mesh, bx, bu):
    if cfg.experiment == "burgers":
        k1, k2 = jax.random.split(key)
        return (S.sample_interior(k1, all_u, bx, bu),
                S.sample_boundary(k2, all_u, bx, bu))
    k1, k2 = jax.random.split(key)
    return (S.sample_interior_tri(k1, all_u, mesh, bx, bu),
            S.sample_boundary_tri(k2, all_u, bx, bu))


def make_adam_step(model: DMM, cfg: DMMTrainConfig, loss_cfg: MALossConfig,
                   optimizer, all_u, mesh=None, grid=None, nbr=None):
    """One fused sample + MA-loss + Adam update step."""

    def loss_fn(params, extra_vars, interior, boundary):
        variables = dict(extra_vars, params=params)
        terms = ma_loss(model, variables, interior, boundary, loss_cfg,
                        grid, nbr)
        return terms.total, terms

    @jax.jit
    def step(params, extra_vars, opt_state, key):
        interior, boundary = _sample(cfg, key, all_u, mesh,
                                     cfg.batch_size_x_adam,
                                     cfg.batch_size_u_adam)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, extra_vars, interior, boundary)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, terms

    return step


def make_lbfgs_runner(model: DMM, cfg: DMMTrainConfig, loss_cfg: MALossConfig,
                      all_u, mesh=None, grid=None, nbr=None):
    """Run ``lbfgs_inner`` optax.lbfgs iterations on one sampled batch."""
    opt = optax.lbfgs(learning_rate=None)

    def loss_on(params, extra_vars, interior, boundary):
        variables = dict(extra_vars, params=params)
        return ma_loss(model, variables, interior, boundary, loss_cfg,
                       grid, nbr).total

    @jax.jit
    def run(params, extra_vars, key):
        interior, boundary = _sample(cfg, key, all_u, mesh,
                                     cfg.batch_size_x_lbfgs,
                                     cfg.batch_size_u_lbfgs)
        fn = lambda p: loss_on(p, extra_vars, interior, boundary)  # noqa: E731
        value_and_grad = optax.value_and_grad_from_state(fn)
        opt_state = opt.init(params)

        def body(carry, _):
            params, opt_state = carry
            value, grad = value_and_grad(params, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, params, value=value, grad=grad,
                value_fn=fn)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), value

        (params, _), values = jax.lax.scan(body, (params, opt_state), None,
                                           length=cfg.lbfgs_inner)
        return params, values[-1]

    return run


# --------------------------------------------------------------- RF refit


def _rf_batch_features(model: DMM, variables, cfg: DMMTrainConfig,
                       loss_cfg: MALossConfig, interior: S.InteriorBatch,
                       boundary: S.BoundaryBatch, grid=None, nbr=None):
    """Penultimate features + coordinate derivatives on a sampled batch.

    Only supported for the soft boundary constraint (like the reference RF
    path, which never applies the hard wrap, mesh/dmm_utils.py:798-921).
    """
    feat_in = branch_features(model, variables, interior.u, grid, nbr)
    s_in, ds_in, d2s_in = rf_feature_derivatives(model, variables, feat_in,
                                                 interior.x, order=2)
    edge = []
    for e in range(4):
        feat_e = branch_features(model, variables, boundary.u[e], grid, nbr)
        pts = jnp.broadcast_to(boundary.points[e][None],
                               (feat_e.shape[0],) + boundary.points[e].shape)
        s_e, ds_e = rf_feature_derivatives(model, variables, feat_e, pts,
                                           order=1)
        edge.append((s_e, ds_e))
    return (s_in, ds_in, d2s_in), edge


def rf_loss(w, rf_feats, interior: S.InteriorBatch, cfg: DMMTrainConfig,
            loss_cfg: MALossConfig, include_bound: bool = True):
    """Reference random_feature_torch2 (mesh/dmm_utils.py:351-388): the MA
    objective expressed linearly in the final-layer weight w [F].

    ``include_bound`` mirrors the reference's ``loss_bound_rf`` flag: when
    False the boundary normal-derivative term is dropped from the RF
    objective (mesh/dmm.py --loss_bound_rf)."""
    (s_in, ds_in, d2s_in), edge = rf_feats

    def project(t):  # contract feature axis with w
        return jnp.tensordot(t, w, axes=([2], [0]))

    # boundary: normal derivative of phi = (ds @ w)[normal]
    lbs = []
    for e, comp in zip(range(4), (0, 0, 1, 1)):
        _, ds_e = edge[e]
        phin = jnp.tensordot(ds_e[..., comp], w, axes=([2], [0]))
        lbs.append(jnp.mean(phin ** 2))
    loss_bound = sum(lbs) / 4.0

    dphi = project(ds_in)    # [nu, nx, F, 2] . w[F] -> [nu, nx, 2]
    hphi = project(d2s_in)   # [nu, nx, F, 2, 2] . w[F] -> [nu, nx, 2, 2]
    moved = interior.x + dphi
    ux_m = ops.idw_grid(interior.ux, moved)
    uy_m = ops.idw_grid(interior.uy, moved)
    pxx, pxy = hphi[..., 0, 0], hphi[..., 0, 1]
    pyx, pyy = hphi[..., 1, 0], hphi[..., 1, 1]
    u_xi_x = ux_m * (1 + pxx) + uy_m * pyx
    u_xi_y = ux_m * pxy + uy_m * (1 + pyy)
    m_xi = ops.monitor(interior.alpha[:, None], u_xi_x, u_xi_y)
    lhs = m_xi * ((1 + pxx) * (1 + pyy) - pxy * pyx)
    loss_in = jnp.mean((lhs / interior.rhs[:, None] - 1.0) ** 2)
    loss_convex = jnp.mean(jnp.minimum(0.0, 1 + pxx) ** 2 +
                           jnp.minimum(0.0, 1 + pyy) ** 2)
    reg = cfg.convex_rel * jnp.sum(w ** 2) ** 2
    total = (reg + loss_cfg.loss_weight0 * loss_in +
             loss_cfg.loss_weight2 * loss_convex)
    if include_bound:
        total = total + loss_cfg.loss_weight1 * loss_bound
    return total


def _make_newton_cg_solver(fn, n_newton: int, cg_iters: int = 32):
    """Scan-based Newton-CG on a small dense problem (the RF last-layer
    weight, <= 512 params) — the equivalent of torchmin's 'newton-cg'
    option (reference mesh/dmm_utils.py:935-944).

    Each Newton iteration CG-solves H p = g with Hessian-vector products
    (jvp of grad — H never materializes), then Armijo-backtracks on
    f(w - t p); non-positive curvature freezes the CG iterate and a
    non-descent direction falls back to the gradient.
    """
    grad_fn = jax.grad(fn)

    def hvp(w, v):
        return jax.jvp(grad_fn, (w,), (v,))[1]

    def newton_step(w, _):
        g = grad_fn(w)

        def cg_body(carry, _):
            p, r, d, rs = carry
            hd = hvp(w, d)
            denom = jnp.vdot(d, hd)
            ok = denom > 1e-16
            alpha = jnp.where(ok, rs / jnp.where(ok, denom, 1.0), 0.0)
            p2 = jnp.where(ok, p + alpha * d, p)
            r2 = jnp.where(ok, r - alpha * hd, r)
            rs2 = jnp.where(ok, jnp.vdot(r2, r2), rs)
            beta = jnp.where(ok, rs2 / jnp.maximum(rs, 1e-30), 0.0)
            d2 = jnp.where(ok, r2 + beta * d, d)
            return (p2, r2, d2, rs2), None

        init = (jnp.zeros_like(g), g, g, jnp.vdot(g, g))
        (p, _, _, _), _ = jax.lax.scan(cg_body, init, None, length=cg_iters)
        # descent check: p ~ H^-1 g must positively correlate with g
        gp = jnp.vdot(g, p)
        p = jnp.where(gp > 0, p, g)
        gp = jnp.where(gp > 0, gp, jnp.vdot(g, g))

        f0 = fn(w)
        ts = 0.5 ** jnp.arange(25, dtype=w.dtype)
        fs = jax.vmap(lambda t: fn(w - t * p))(ts)
        armijo = fs <= f0 - 1e-4 * ts * gp
        # first step length satisfying Armijo, else the best trial
        first = jnp.argmax(armijo)
        best = jnp.argmin(fs)
        idx = jnp.where(jnp.any(armijo), first, best)
        w_new = w - ts[idx] * p
        improved = fs[idx] < f0
        w = jnp.where(improved, w_new, w)
        return w, jnp.where(improved, fs[idx], f0)

    @jax.jit
    def solve(w):
        w, values = jax.lax.scan(newton_step, w, None, length=n_newton)
        return w, values[-1]

    return solve


def rf_refit(model: DMM, variables, cfg: DMMTrainConfig,
             loss_cfg: MALossConfig, key, all_u, mesh=None,
             grid=None, nbr=None, alg: str = "BFGS",
             include_bound: bool = True):
    """One RF epoch: sample, extract features, solve for the final weight
    with L-BFGS (alg='BFGS') or Newton-CG (alg='Newton'), mirroring the
    reference's torchmin BFGS/Newton-CG choice (mesh/dmm_utils.py:935-944).

    Returns updated params (out_nn final kernel replaced).
    """
    interior, boundary = _sample(cfg, key, all_u, mesh,
                                 cfg.batch_size_x_rf, cfg.batch_size_u_rf)
    rf_feats = _rf_batch_features(model, variables, cfg, loss_cfg,
                                  interior, boundary, grid, nbr)

    params = variables["params"]
    out_layers = params["out_nn"]
    last = sorted(k for k in out_layers if k.startswith("dense_"))[-1]
    w0 = out_layers[last]["kernel"][:, 0]            # [F]

    fn = lambda w: rf_loss(w, rf_feats, interior, cfg, loss_cfg,  # noqa: E731
                           include_bound=include_bound)

    if alg.lower().startswith("newton"):
        # each Newton iteration costs ~cg_iters HVPs; scale the outer count
        # down from the L-BFGS iteration budget accordingly
        solve = _make_newton_cg_solver(fn, n_newton=max(1, cfg.max_iter // 6))
    else:
        opt = optax.lbfgs(learning_rate=None)

        @jax.jit
        def solve(w):
            opt_state = opt.init(w)
            value_and_grad = optax.value_and_grad_from_state(fn)

            def body(carry, _):
                w, opt_state = carry
                value, grad = value_and_grad(w, state=opt_state)
                updates, opt_state = opt.update(grad, opt_state, w,
                                                value=value, grad=grad,
                                                value_fn=fn)
                w = optax.apply_updates(w, updates)
                return (w, opt_state), value

            (w, _), values = jax.lax.scan(body, (w, opt_state), None,
                                          length=cfg.max_iter)
            return w, values[-1]

    w_new, final_loss = solve(w0)
    new_params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    new_params["out_nn"] = dict(params["out_nn"])
    new_params["out_nn"][last] = dict(params["out_nn"][last])
    new_params["out_nn"][last]["kernel"] = w_new[:, None]
    return new_params, float(final_loss)


def adam_optimizer(cfg: DMMTrainConfig, n_inner: int):
    """Adam + L2 (torch-style weight_decay) with MultiStep decay by step."""
    boundaries = {100 * n_inner: cfg.gamma_adam,
                  150 * n_inner: cfg.gamma_adam}
    sched = optax.piecewise_constant_schedule(cfg.lr_adam, boundaries)
    return optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                       optax.scale_by_adam(),
                       optax.scale_by_learning_rate(sched))


def n_inner_steps(cfg: DMMTrainConfig, n_snapshots: int) -> int:
    return max(1, int(cfg.train_sample_grid * n_snapshots /
                      (cfg.batch_size_x_adam * cfg.batch_size_u_adam)))
