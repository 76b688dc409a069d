"""Minimal repro for the axon-TPU runtime fault in scan+pushforward programs.

Round 3/4 observed (DIVERGENCES.md #41) that jit programs of the class

    lax.scan( body = [ lax.cond(i < unrolled, no-grad two-model apply, id)
                       -> value_and_grad(two-model forward) -> optax update ] )

crash the remote TPU worker on the axon backend at the FIRST execution
(the process dies, not a Python exception), while

  * the identical body WITHOUT the scan (per-batch dispatch) runs fine
    (the 80-epoch burgers pushforward leg), and
  * the scan WITHOUT the cond-guarded own-prediction push runs fine
    (scan-epoch non-pushforward training, the bench path).

This script is the smallest program we could construct with the same
structure: two tiny MLPs (stand-ins for the two GNN branches), a masked
cond push step that feeds the models their own stop_gradient prediction,
value_and_grad over the sum of both model losses, an adam update, all
scanned over the batch axis of one epoch.

Usage:
    python scripts/repro_scan_push_fault.py

RESULT (2026-08-21, axon TPU v5e): this minimal program PASSES — the
scan(cond(two-model apply + grad + update)) structure alone does NOT
trigger the fault at toy sizes.  The crash therefore needs more of the
real step (candidates: the kNN sort/gather graph build inside the cond,
the [B,N,k,128] edge tensors, program size).  Bisection plan: run the
REAL make_gnn_step scan-epoch pushforward program with (a) moved branch
replaced by a uniform copy (no kNN in the cond), (b) k=4/h=16 shrunken
config, in a dedicated chip window (the fault kills the worker process,
so never bisect while another job shares the chip).
"""
import sys

import jax
import jax.numpy as jnp
import optax

D = 32          # feature dim (stand-in for h=128)
N = 64          # nodes
B = 4           # batch
S = 8           # scan length (batches per epoch)
MAX_UNROLL = 1


def init_mlp(key, d_in, d_hidden, d_out):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (d_in, d_hidden)) * 0.05,
        "w2": jax.random.normal(k2, (d_hidden, d_out)) * 0.05,
    }


def mlp(p, x):
    return jnp.tanh(x @ p["w1"]) @ p["w2"]


def main():
    key = jax.random.PRNGKey(0)
    ka, kb, kd = jax.random.split(key, 3)
    params = {"model": init_mlp(ka, D, 64, D), "model_b": init_mlp(kb, D, 64, D)}
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)

    # one "epoch" of data: S batches of [B, N, D] windows + label windows
    data = jax.random.normal(kd, (S, B, N, D)) * 0.1
    labels = data * 0.9  # arbitrary target

    def predict(params, d):
        # two-branch forward: moved branch + uniform branch (train.py:181-238)
        return mlp(params["model_b"], d) + mlp(params["model"], d)

    def forward(params, d, y):
        return jnp.mean((predict(params, d) - y) ** 2)

    def body(carry, batch):
        params, opt_state = carry
        d, y, unrolled = batch

        def one_push(c):
            # no-grad own-prediction step (train.py:271-281)
            return jax.lax.stop_gradient(predict(params, c))

        for i in range(MAX_UNROLL):
            # masked cond unroll (train.py:322-326) — the round-3 fix that
            # removed the dynamic-trip-count fori_loop; the fault survives it
            d = jax.lax.cond(i < unrolled, one_push, lambda c: c, d)
        loss, grads = jax.value_and_grad(forward)(params, d, y)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def epoch(params, opt_state, data, labels, unrolls):
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (data, labels, unrolls))
        return params, opt_state, losses

    unrolls = jnp.arange(S) % (MAX_UNROLL + 1)  # draw unrolled in [0, max]
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    print("compiling + executing scan(cond(push)+grad+update) ...", flush=True)
    params, opt_state, losses = epoch(params, opt_state, data, labels, unrolls)
    losses = jax.device_get(losses)
    print(f"OK: epoch ran, losses[0]={losses[0]:.5f} "
          f"losses[-1]={losses[-1]:.5f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
