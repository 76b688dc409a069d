"""Benchmark: full MM-PDE two-branch training-step throughput.

Config matches the reference's flagship Burgers run (mmpde.py defaults:
31 x 48 x 48 resolution, batch 6, k=35 kNN edges, h=128, 6 MP layers,
tw=1, moving mesh on): per step this covers window slicing, frozen-DMM mesh
movement (autodiff through the trunk), device kNN interpolation (ItpNet),
dynamic kNN graph construction, both GNN branches, the residual-cut
correction, loss, backward, and the AdamW update — all one jitted XLA
program.  That is everything the reference does per batch in
train_helper_2d.py:95-131 + data_creator_2d.py:256-260.

Baseline: the same step re-implemented the reference's way in pure torch on
CPU (bench_baseline_torch.py) — sklearn kNN round-trips and per-step edge
rebuilds included, torch_geometric dispatch overhead excluded (conservative).
A fresh measurement is taken unless a cached one exists in
.bench_baseline.json.

Driver-proofing (the round-2 bench timed out compiling the scan-epoch
program cold, leaving the round with no recorded number):
  1. The per-step path is measured FIRST — its fused-step program is the
     smallest thing that still covers the full metric definition.
  2. The device-resident scan-epoch path (the default training path, lower
     dispatch overhead) is then attempted only in a time-bounded SUBPROCESS
     (``python bench.py --scan``); if it finishes within the remaining
     budget its (usually slightly better) number wins, otherwise the
     per-step result is printed.  A hung compile can no longer eat the
     whole bench.
  3. If a committed seed cache ``.jax_cache_bench/`` exists, its entries
     are copied into the active persistent compile cache before anything
     compiles, so a wiped VM still warm-starts.
Budget: MMPDE_BENCH_BUDGET_S (default 2400 s total wall clock).

Prints ONE JSON line (last line of stdout):
  {"metric": ..., "value": steps/s, "unit": "steps/s", "vs_baseline": x, ...}
"""

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

# flagship config; the MMPDE_BENCH_* overrides exist for cheap smoke tests
# of the bench harness itself (CPU), NOT for reported numbers
NX = int(os.environ.get("MMPDE_BENCH_NX", 48))
NT = int(os.environ.get("MMPDE_BENCH_NT", 31))
BATCH = int(os.environ.get("MMPDE_BENCH_BATCH", 6))  # throughput mode: >6
# amortizes HBM traffic over more samples (the headline metric stays the
# reference's batch-6 training step; see RESULTS round 5)
K = int(os.environ.get("MMPDE_BENCH_K", 35))
HIDDEN = 128
LAYERS = 6
REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, ".bench_baseline.json")
SEED_CACHE = os.path.join(REPO, ".jax_cache_bench")
T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("MMPDE_BENCH_BUDGET_S", 2400))


def _remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def _seed_compile_cache():
    """Copy committed bench cache entries into the active persistent cache
    so a freshly-wiped VM does not pay the cold remote compile."""
    active = os.environ.get("MMPDE_JAX_CACHE",
                            os.path.join(REPO, ".jax_cache"))
    if not os.path.isdir(SEED_CACHE):
        return
    os.makedirs(active, exist_ok=True)
    for name in os.listdir(SEED_CACHE):
        dst = os.path.join(active, name)
        if not os.path.exists(dst):
            try:
                shutil.copy2(os.path.join(SEED_CACHE, name), dst)
            except OSError:
                pass


def _build():
    """Model/pipeline/state/step construction shared by both paths."""
    import jax
    import jax.numpy as jnp

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
    return T, state, step_fn


def _flops_of(lowerable, *args):
    """XLA's model-FLOP estimate for the fused step (fwd + bwd + opt), for
    an MFU estimate.  Advisory only — failure must not break the bench."""
    try:
        ca = lowerable.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def measure_step(n_steps=None):
    """Per-step path: one dispatch per fused train step (round-1 bench)."""
    n_steps = n_steps or int(os.environ.get("MMPDE_BENCH_STEPS", 30))
    import jax
    import jax.numpy as jnp
    _, state, step_fn = _build()

    rng = np.random.default_rng(0)
    u_traj = jnp.asarray(rng.normal(size=(BATCH, NT, NX, NX))
                         .astype(np.float32))
    steps_list = [jnp.asarray(rng.integers(1, NT - 1, size=BATCH))
                  for _ in range(n_steps)]

    flops = _flops_of(step_fn, state, u_traj, steps_list[0])
    from mmpde_tpu.utils.profiling import StepTimer
    timer = StepTimer()
    with timer:   # StepTimer isolates the first call as compile+warmup
        state, loss = step_fn(state, u_traj, steps_list[0])
        jax.block_until_ready(loss)
    # --profile: capture a jax.profiler trace of the steady-state loop —
    # the exact program behind the headline ms/step number (ROADMAP #8:
    # find the time the component table does not account for)
    prof_dir = None
    if "--profile" in sys.argv:
        prof_dir = os.path.join(REPO, "logs", "profile_bench")
        jax.profiler.start_trace(prof_dir)
    # steady state: pipelined dispatch (block once), the training-loop shape
    with timer:
        for st in steps_list:
            state, loss = step_fn(state, u_traj, st)
        jax.block_until_ready(loss)
    if prof_dir is not None:
        jax.profiler.stop_trace()
        print(f"[bench] profile trace in {prof_dir}", file=sys.stderr)
    sec = timer.steps_s[0] / n_steps
    print(f"[bench] per-step: compile+warmup {timer.compile_s:.1f}s, "
          f"{sec * 1e3:.1f} ms/step", file=sys.stderr)
    return sec, flops


def measure_scan(n_steps=64):
    """Scan-epoch path: the default training path (mmpde.py --scan_epoch)
    is device-resident — the train set lives on device and an epoch runs as
    ONE lax.scan execution, amortising dispatch latency.  Measures S fused
    steps per execution with fresh indices each call."""
    import jax
    import jax.numpy as jnp
    T, state, step_fn = _build()

    S = 32
    n_traj = 24
    rng = np.random.default_rng(0)
    u_all = jnp.asarray(rng.normal(size=(n_traj, NT, NX, NX))
                        .astype(np.float32))
    epoch_fn = T.make_scan_epoch(step_fn, u_all)

    def schedule(seed):
        r = np.random.default_rng(seed)
        idx = np.stack([r.permutation(n_traj)[:BATCH] for _ in range(S)])
        stp = r.integers(1, NT - 1, size=(S, BATCH))
        return (jnp.asarray(idx, jnp.int32), jnp.asarray(stp, jnp.int32),
                jnp.zeros((S,), jnp.int32))

    # XLA's cost_analysis counts a lax.scan body ONCE (not x trip count), so
    # the epoch program's FLOP estimate already approximates ONE step's
    # FLOPs — do not divide by S (BENCH_r03 was 32x under from doing so).
    flops = _flops_of(epoch_fn, state, *schedule(0))
    state, losses = epoch_fn(state, *schedule(0))   # compile + warmup
    jax.block_until_ready(losses)
    reps = max(1, n_steps // S) * 2
    scheds = [schedule(1 + r) for r in range(reps)]
    t0 = time.perf_counter()
    for sch in scheds:
        state, losses = epoch_fn(state, *sch)
    jax.block_until_ready(losses)
    sec = (time.perf_counter() - t0) / (reps * S)
    return sec, flops


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


def _try_scan_subprocess():
    """Run the scan-path measurement bounded by the remaining budget."""
    remaining = _remaining() - 60
    if remaining < 180:
        return None
    try:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--scan"], timeout=remaining,
                           capture_output=True, text=True, cwd=REPO)
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                d = json.loads(line)
                if "sec_per_step" in d:
                    return d["sec_per_step"], d.get("flops")
            except (json.JSONDecodeError, TypeError):
                continue
    except (subprocess.TimeoutExpired, OSError):
        pass
    return None


def main():
    _seed_compile_cache()
    from mmpde_tpu.utils.env import setup_compilation_cache
    setup_compilation_cache()

    if "--scan" in sys.argv:
        sec, flops = measure_scan()
        print(json.dumps({"sec_per_step": sec, "flops": flops}))
        return
    if "--step-only" in sys.argv:
        sec, flops = measure_step()
        print(json.dumps({"sec_per_step": sec, "flops": flops}))
        return

    sec, flops = measure_step()
    print(f"[bench] per-step path: {1.0 / sec:.3f} steps/s "
          f"({_remaining():.0f}s budget left)", file=sys.stderr)
    scan = _try_scan_subprocess()
    path = "per-step"
    if scan is not None and scan[0] < sec:
        # keep the per-step program's FLOPs: it is the authoritative
        # one-step estimate (the scan program's is the same body, but the
        # per-step one was measured on the definitive program)
        sec = scan[0]
        flops = flops or scan[1]
        path = "scan-epoch"
    print(f"[bench] best path: {path}", file=sys.stderr)

    base_sec = measure_baseline()
    out = {
        "metric": "mmpde_burgers48_full_train_steps_per_sec",
        "value": round(1.0 / sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(base_sec / sec, 1),
        "ms_per_step": round(sec * 1e3, 1),
        "path": path,
    }
    if flops:
        out["model_tflops_per_step"] = round(flops / 1e12, 4)
        out["achieved_tflops_per_sec"] = round(flops / sec / 1e12, 2)
        out["mfu_pct_vs_bf16_peak"] = round(
            100.0 * flops / sec / V5E_PEAK_FLOPS, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
