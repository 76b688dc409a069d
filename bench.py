"""Benchmark: full MM-PDE two-branch training-step throughput.

Config matches the reference's flagship Burgers run (mmpde.py defaults:
31 x 48 x 48 resolution, batch 6, k=35 kNN edges, h=128, 6 MP layers,
tw=1, moving mesh on): per step this covers window slicing, frozen-DMM mesh
movement (autodiff through the trunk), device kNN interpolation (ItpNet),
dynamic kNN graph construction, both GNN branches, the residual-cut
correction, loss, backward, and the AdamW update — all one jitted XLA
program.

Baseline: the same step re-implemented the reference's way in pure torch on
CPU (bench_baseline_torch.py) — sklearn kNN round-trips and per-step edge
rebuilds included, torch_geometric dispatch overhead excluded (conservative).
A fresh measurement is taken unless a cached one exists in
.bench_baseline.json.

Prints ONE JSON line:
  {"metric": ..., "value": steps/s, "unit": "steps/s", "vs_baseline": x}
"""

import json
import os
import sys
import time

import numpy as np

NX = 48
NT = 31
BATCH = 6
K = 35
HIDDEN = 128
LAYERS = 6
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")


def measure_ours(n_steps=20):
    import jax
    import jax.numpy as jnp

    from mmpde_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    from mmpde_tpu.models import DMM, MPSolver2D, ItpNet
    from mmpde_tpu.pdes import burgers
    from mmpde_tpu.solver.data import GraphPipeline
    from mmpde_tpu.solver import train as T

    pde = burgers(grid_size=(NT, NX, NX))
    pde.movingmesh_grid_size = (NT, NX, NX)
    pde.ori_grid_size = (NT, NX, NX)
    pipe = GraphPipeline(pde, neighbors=K, time_window=1, t_resolution=NT)
    key = jax.random.PRNGKey(0)

    dmm = DMM(mode="array", branch_layer=7, trunk_layer=(2, 32, 512),
              out_layer=(1024, 512, 1))
    dmm_vars = dmm.init(key, jnp.ones((2, NX, NX)), jnp.zeros((2, 3, 2)))

    itp = ItpNet(ori_nx=NX, ori_ny=NX)
    nbq, qq = jnp.ones((1, 2, 30, 2)), jnp.ones((1, 2, 1, 2))
    itp_params = {**itp.init(key, nbq, qq, "1")["params"],
                  **itp.init(key, nbq, qq, "2")["params"],
                  **itp.init(key, None, None, "res_cut",
                             jnp.ones((1, 1, NX, NX)))["params"]}

    kw = dict(time_window=1, hidden_features=HIDDEN, hidden_layer=LAYERS,
              dt=pde.dt, tmax=pde.tmax)
    model, model_b = MPSolver2D(**kw), MPSolver2D(**kw)
    us = jnp.ones((BATCH, pipe.n_nodes, 1))
    ps = jnp.ones((BATCH, pipe.n_nodes, 3))
    v = model.init(jax.random.PRNGKey(1), us, ps, pipe.uniform_nbr)
    vb = model_b.init(jax.random.PRNGKey(2), us, ps, pipe.uniform_nbr)
    params = {"model": v["params"], "model_b": vb["params"],
              "itp": itp_params}
    stats = {"model": v["batch_stats"], "model_b": vb["batch_stats"]}

    optimizer = T.make_optimizer(2e-3)
    state = T.TrainState(params=params, batch_stats=stats,
                         opt_state=optimizer.init(params),
                         step=jnp.zeros((), jnp.int32))
    step_fn = T.make_gnn_step(pipe, model, optimizer, model_b, itp,
                              dmm, dmm_vars, train=True)

    rng = np.random.default_rng(0)
    u_traj = jnp.asarray(rng.normal(size=(BATCH, NT, NX, NX)).astype(np.float32))
    steps = jnp.asarray(rng.integers(1, NT - 1, size=BATCH))

    # XLA's model-FLOP estimate for the whole fused step (fwd + bwd + opt),
    # for an MFU estimate against the chip's peak.  Advisory only — failure
    # (e.g. a backend without cost_analysis) must not break the bench.
    flops = None
    try:
        ca = step_fn.lower(state, u_traj, steps).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # The default training path (mmpde.py --scan_epoch, on by default) is
    # device-resident: the train set lives on device and an epoch runs as
    # ONE lax.scan execution, so per-execute dispatch latency is amortised.
    # Measure exactly that: S fused steps per execution, fresh trajectory
    # indices + start steps every call.
    S = 32
    n_traj = 24
    u_all = jnp.asarray(rng.normal(size=(n_traj, NT, NX, NX))
                        .astype(np.float32))
    epoch_fn = T.make_scan_epoch(step_fn, u_all)

    def schedule(seed):
        r = np.random.default_rng(seed)
        idx = np.stack([r.permutation(n_traj)[:BATCH] for _ in range(S)])
        stp = r.integers(1, NT - 1, size=(S, BATCH))
        return (jnp.asarray(idx, jnp.int32), jnp.asarray(stp, jnp.int32),
                jnp.zeros((S,), jnp.int32))

    state, losses = epoch_fn(state, *schedule(0))   # compile + warmup
    jax.block_until_ready(losses)
    reps = max(1, n_steps // S) * 2
    scheds = [schedule(1 + r) for r in range(reps)]
    t0 = time.perf_counter()
    for sch in scheds:
        state, losses = epoch_fn(state, *sch)
    jax.block_until_ready(losses)
    sec = (time.perf_counter() - t0) / (reps * S)
    return sec, float(losses[-1]), flops


def measure_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["sec_per_step"]
    from bench_baseline_torch import benchmark_reference_step
    sec = benchmark_reference_step(nx=NX, batch=BATCH, k=K, n_steps=2)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"sec_per_step": sec, "config":
                   {"nx": NX, "batch": BATCH, "k": K}}, f)
    return sec


# TPU v5e peak: 197 TFLOP/s (bf16 MXU).  The step mixes f32 and bf16
# matmuls, so MFU against the bf16 peak is a lower bound on hardware use.
V5E_PEAK_FLOPS = 197e12


def main():
    ours_sec, loss, flops = measure_ours()
    base_sec = measure_baseline()
    value = 1.0 / ours_sec
    out = {
        "metric": "mmpde_burgers48_full_train_steps_per_sec",
        "value": round(value, 3),
        "unit": "steps/s",
        "vs_baseline": round(base_sec / ours_sec, 1),
    }
    if flops:
        out["ms_per_step"] = round(ours_sec * 1e3, 1)
        out["model_tflops_per_step"] = round(flops / 1e12, 4)
        out["achieved_tflops_per_sec"] = round(flops / ours_sec / 1e12, 2)
        out["mfu_pct_vs_bf16_peak"] = round(
            100.0 * flops / ours_sec / V5E_PEAK_FLOPS, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
