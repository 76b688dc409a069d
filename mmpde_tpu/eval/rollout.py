"""Autoregressive rollout + relative-L2 metric.

The reference describes MM-PDE as an autoregressive solver but only ever
evaluates one-step MSE (train_helper_2d.py:137-200; the docstring mentions
unrolled losses that were never implemented).  The BASELINE north-star is
rollout relative-L2, so the rollout is implemented here as a lax.scan over
time: each step runs the full two-branch forward (frozen-DMM mesh movement,
kNN interpolation, both GNNs, residual-cut) and feeds its prediction back as
the next history window.  One jitted program for the whole trajectory.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from mmpde_tpu.solver.data import GraphPipeline


def make_rollout(pipe: GraphPipeline, model, model_b=None, itp=None,
                 dmm=None, dmm_vars=None, dmm_grid=None, dmm_nbr=None,
                 residual_head: bool = False, mesh_damp: float = 0.0,
                 branch_damp: float = 0.0):
    """Returns rollout(state, u_init [B, tw, ...spatial], n_steps) ->
    predictions [B, n_steps, tw, ...spatial] on the uniform mesh.

    residual_head must match the flag the model was trained with
    (make_gnn_step(residual_head=...)).

    mesh_damp in [0, 1]: eval-time mesh damping (DIVERGENCES.md) — the
    DMM displacement is scaled by (1 - mesh_damp), interpolating the moved
    mesh toward the uniform one.  Attenuates the autoregressive
    mesh-feedback loop (worse field -> worse monitor -> worse mesh ->
    worse interpolation); 0 is the reference-faithful forward.  The damp
    value enters the jitted program as a traced operand, so every nonzero
    damp shares ONE compiled program (a damp ladder costs one compile);
    mesh_damp=0 keeps the original no-damp program (warm-cache hit).

    branch_damp in [0, 1]: scales the moved-branch correction by
    (1 - branch_damp) — at 1 the two-branch model degenerates to its
    uniform branch alone.  Separates "the mesh is wrong" from "the
    correction branch amplifies its own errors" in rollout divergence;
    traced like mesh_damp (a (mesh, branch) ladder costs one compile)."""
    moving = model_b is not None
    tw = pipe.tw
    use_damp = bool(mesh_damp) or bool(branch_damp)

    def one_step(params, batch_stats, data, step_idx, damp, bdamp):
        steps = jnp.full((data.shape[0],), step_idx, dtype=jnp.int32)
        labels = data  # placeholder; labels unused in the forward
        u_u, _, _, pos_u = pipe.uniform_graph(data, labels, steps)
        pred_u = model.apply(
            {"params": params["model"], "batch_stats": batch_stats["model"]},
            u_u, pos_u, pipe.uniform_nbr, False, pipe.uniform_mask)
        if moving:
            itp_vars = {"params": params["itp"]}
            mesh = pipe.moved_mesh(dmm, dmm_vars, data, dmm_grid, dmm_nbr)
            if use_damp:
                uni = jnp.broadcast_to(pipe.grid[None],
                                       mesh.shape).astype(mesh.dtype)
                mesh = uni + (1.0 - damp) * (mesh - uni)
            u_m, _, pos_m, nbr_m, mask_m = pipe.moved_graph_from_mesh(
                itp, itp_vars, data, labels, steps, mesh)
            pred_b = model_b.apply(
                {"params": params["model_b"],
                 "batch_stats": batch_stats["model_b"]},
                u_m, pos_m, nbr_m, False, mask_m)
            corr = pipe.interpolate_pred(itp, itp_vars, pred_b, mesh, data)
            if use_damp:
                corr = (1.0 - bdamp) * corr
            pred_u = pred_u + corr
        if residual_head:
            pred_u = pred_u + u_u[..., -1:]
        # [B, N, tw] -> window layout [B, tw, ...spatial]
        b = pred_u.shape[0]
        return jnp.swapaxes(pred_u, 1, 2).reshape(data.shape)

    import functools

    def _rollout_body(state, u_init, n_steps: int, start, damp, bdamp):
        start_idx = tw if start is None else int(start)

        def body(carry, step_idx):
            data = carry
            pred = one_step(state.params, state.batch_stats, data, step_idx,
                            damp, bdamp)
            return pred, pred

        # time indices fed to the pos-t channel: the i-th prediction is for
        # the window starting at start + i*tw; clip to the pde range
        idxs = jnp.clip(jnp.arange(n_steps) * tw + start_idx, 0,
                        pipe.pde.grid_size[0] - 1)
        _, preds = jax.lax.scan(body, u_init, idxs)
        return jnp.moveaxis(preds, 0, 1)  # [B, n_steps, tw, ...]

    if use_damp:
        # damps as TRACED operands: one compiled program serves every
        # nonzero (mesh_damp, branch_damp) pair (the persistent compile
        # cache hashes the HLO, which is damp-value-independent here)
        @functools.partial(jax.jit, static_argnums=(2, 3))
        def rollout_impl(state, u_init, n_steps: int, start, damp, bdamp):
            return _rollout_body(state, u_init, n_steps, start, damp, bdamp)

        damp_val = jnp.float32(mesh_damp)
        bdamp_val = jnp.float32(branch_damp)

        def rollout(state, u_init, n_steps: int, start: int = None):
            return rollout_impl(state, u_init, n_steps, start, damp_val,
                                bdamp_val)
        return rollout

    # no-damp: keep the exact original program signature (warm-cache hit)
    @functools.partial(jax.jit, static_argnums=(2, 3))
    def rollout(state, u_init, n_steps: int, start: int = None):
        return _rollout_body(state, u_init, n_steps, start, None, None)

    return rollout


def rollout_relative_l2(pred, truth):
    """||pred - truth|| / ||truth|| over the full rollout (per batch mean).

    pred, truth: [B, T, ...].
    """
    diff = jnp.sqrt(jnp.sum((pred - truth) ** 2, axis=tuple(
        range(1, pred.ndim))))
    norm = jnp.sqrt(jnp.sum(truth ** 2, axis=tuple(range(1, truth.ndim))))
    return float(jnp.mean(diff / jnp.maximum(norm, 1e-12)))


def evaluate_rollout(pipe: GraphPipeline, rollout_fn, state, u_test,
                     start: Optional[int] = None):
    """Roll out from the first window of each test trajectory and compare
    against the ground truth; returns mean relative L2."""
    tw = pipe.tw
    start = tw if start is None else start
    n_steps = (pipe.t_res - start) // tw
    u_init = u_test[:, start - tw:start]
    preds = rollout_fn(state, jnp.asarray(u_init), n_steps, start)
    b = preds.shape[0]
    truth = jnp.stack([
        jnp.asarray(u_test[:, start + i * tw: start + (i + 1) * tw])
        for i in range(n_steps)], axis=1)
    return rollout_relative_l2(preds, truth)
