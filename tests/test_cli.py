"""CLI smoke tests (subprocess — the real user surface).

The default suite runs TINY configs against a pre-generated miniature
dataset (24x24, 9 frames) so `pytest -q` exercises the full
dmm.py -> mmpde.py chain end-to-end on CPU.  The slower reference-shaped
variants (full 192^2 generation, larger batches) stay opt-in behind
MMPDE_RUN_CLI_TESTS=1.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

slow = pytest.mark.skipif(
    not os.environ.get("MMPDE_RUN_CLI_TESTS"),
    reason="slow CLI subprocess tests; set MMPDE_RUN_CLI_TESTS=1")


def _run(args, cwd, timeout=900):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="session")
def tiny_data_root(tmp_path_factory):
    """Miniature Burgers dataset the CLIs pick up instead of generating the
    full 192^2 set (ensure_burgers keeps a cached file whose trajectory
    count covers the request)."""
    from mmpde_tpu.data.generate import generate_burgers

    root = tmp_path_factory.mktemp("cli_data")
    arr = generate_burgers(n_traj=6, nt=9, s=24, sub_steps=10, seed=0,
                           batch=6)
    # the CFL floor in generate_burgers must keep even this under-resolved
    # config finite (it used to go NaN and the CLI tests trained on it)
    assert np.isfinite(arr).all()
    np.save(root / "burgers_192.npy", arr)
    return str(root)


@pytest.mark.fast  # the per-commit lane includes one real CLI main() drive
def test_mmpde_plain_gnn_cli_tiny(tiny_data_root, tmp_path):
    r = _run([os.path.join(REPO, "mmpde.py"),
              "--moving_mesh", "False", "--base_resolution", "9,12,12",
              "--num_epochs", "1", "--inner_loops", "1", "--batch_size", "3",
              "--n_traj", "6", "--neighbors", "4",
              "--data_root", tiny_data_root], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mean Timestep Test Error" in r.stdout

    # rollout eval on the checkpoint the run printed (the r2d chain failure
    # mode: a chain resolving the wrong/missing checkpoint went unnoticed)
    ckpt = next(line for line in r.stdout.splitlines()
                if line.startswith("models/"))
    r2 = _run([os.path.join(REPO, "scripts/eval_rollout.py"), ckpt,
               "--base_resolution", "9,12,12",
               "--data_root", tiny_data_root], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    import json
    result = json.loads(r2.stdout.strip().splitlines()[-1])
    assert result["metric"] == "rollout_relative_l2"
    assert np.isfinite(result["value"])

    # missing-checkpoint path fails FAST with a usable message, not a bare
    # FileNotFoundError minutes in
    r3 = _run([os.path.join(REPO, "scripts/eval_rollout.py"),
               "models/does_not_exist"], cwd=str(tmp_path), timeout=60)
    assert r3.returncode != 0
    assert "does not exist" in (r3.stdout + r3.stderr)


def test_dmm_cli_then_mmpde_full_tiny(tiny_data_root, tmp_path):
    """The full user chain: train a DMM, then train MM-PDE against it."""
    r = _run([os.path.join(REPO, "dmm.py"),
              "--epochs_adam", "1", "--epochs_rf", "1",
              "--train_sample_grid", "1", "--batch_size_x_adam", "8",
              "--batch_size_u_adam", "4", "--batch_size_x_rf", "8",
              "--batch_size_u_rf", "4", "--max_iter", "10",
              "--sub_u", "8", "--n_traj", "6", "--eval_every", "0",
              "--plot", "False", "--data_root", tiny_data_root,
              "--checkpoint", str(tmp_path / "burgers_checkpoint")],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(str(tmp_path / "burgers_checkpoint"))

    # resume: epoch 1 is already in the checkpoint, so --epochs_adam 2
    # must continue at epoch 2 with params + optimizer state restored
    rr = _run([os.path.join(REPO, "dmm.py"),
               "--epochs_adam", "2", "--epochs_rf", "0", "--rf", "False",
               "--resume", "True",
               "--train_sample_grid", "1", "--batch_size_x_adam", "8",
               "--batch_size_u_adam", "4", "--sub_u", "8", "--n_traj", "6",
               "--eval_every", "0", "--plot", "False",
               "--data_root", tiny_data_root,
               "--checkpoint", str(tmp_path / "burgers_checkpoint")],
              cwd=str(tmp_path))
    assert rr.returncode == 0, rr.stderr[-2000:]
    assert "Resumed" in rr.stdout and "epoch 2" in rr.stdout
    assert "Epoch: 1 |" not in rr.stdout  # epoch 1 is not re-run

    r2 = _run([os.path.join(REPO, "mmpde.py"),
               "--base_resolution", "9,12,12", "--num_epochs", "1",
               "--inner_loops", "1", "--batch_size", "3", "--n_traj", "6",
               "--neighbors", "4", "--residual_head", "True",
               "--dmm_checkpoint", str(tmp_path / "burgers_checkpoint"),
               "--data_root", tiny_data_root], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Mean Timestep Test Error" in r2.stdout


@pytest.fixture(scope="session")
def tiny_cy_root(tmp_path_factory):
    """Miniature cylinder dataset (120-node tri mesh, 16 frames)."""
    from mmpde_tpu.data.generate import generate_cylinder

    root = tmp_path_factory.mktemp("cli_cy_data")
    arr = generate_cylinder(n_traj=6, nt=16, n_nodes=120, seed=0)
    np.save(root / "cylinder_rot_tri.npy", arr)
    return str(root)


def test_dmm_cy_then_mmpde_cy_pushforward_tiny(tiny_cy_root, tmp_path):
    """The cylinder user chain at miniature scale, including the round-2
    stability recipe (pushforward + residual head + scan epochs) used by
    the full-budget cy runs."""
    r = _run([os.path.join(REPO, "dmm.py"), "--experiment", "cy",
              "--epochs_adam", "1", "--epochs_rf", "1",
              "--branch_layers", "2,2", "--trunk_layers", "4,8",
              "--out_layers", "8,8,1",
              "--train_sample_grid", "1", "--batch_size_x_adam", "8",
              "--batch_size_u_adam", "4", "--batch_size_x_rf", "8",
              "--batch_size_u_rf", "4", "--max_iter", "10",
              "--sub_u", "1", "--n_traj", "6", "--eval_every", "0",
              "--plot", "False", "--data_root", tiny_cy_root,
              "--checkpoint", str(tmp_path / "cy_checkpoint")],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(str(tmp_path / "cy_checkpoint"))

    r2 = _run([os.path.join(REPO, "mmpde.py"), "--experiment", "cy",
               "--base_resolution", "6,120", "--num_epochs", "1",
               "--inner_loops", "1", "--batch_size", "3", "--n_traj", "6",
               "--neighbors", "4", "--unrolling", "1",
               "--pushforward", "True", "--residual_head", "True",
               "--dmm_checkpoint", str(tmp_path / "cy_checkpoint"),
               "--data_root", tiny_cy_root], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Mean Timestep Test Error" in r2.stdout


@slow
def test_mmpde_plain_gnn_cli(tmp_path):
    r = _run([os.path.join(REPO, "mmpde.py"),
              "--moving_mesh", "False", "--base_resolution", "9,12,12",
              "--num_epochs", "1", "--inner_loops", "1", "--batch_size", "3",
              "--n_traj", "6", "--neighbors", "4",
              "--data_root", str(tmp_path / "data")], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mean Timestep Test Error" in r.stdout


@slow
def test_dmm_cli_then_mmpde_full(tmp_path):
    r = _run([os.path.join(REPO, "dmm.py"),
              "--epochs_adam", "1", "--epochs_rf", "0",
              "--train_sample_grid", "1", "--batch_size_x_adam", "8",
              "--batch_size_u_adam", "4", "--sub_u", "16",
              "--n_traj", "6", "--eval_every", "0", "--plot", "False",
              "--data_root", str(tmp_path / "data"),
              "--checkpoint", str(tmp_path / "burgers_checkpoint")],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(str(tmp_path / "burgers_checkpoint"))

    r2 = _run([os.path.join(REPO, "mmpde.py"),
               "--base_resolution", "9,12,12", "--num_epochs", "1",
               "--inner_loops", "1", "--batch_size", "3", "--n_traj", "6",
               "--neighbors", "4",
               "--dmm_checkpoint", str(tmp_path / "burgers_checkpoint"),
               "--data_root", str(tmp_path / "data")], cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Mean Timestep Test Error" in r2.stdout
