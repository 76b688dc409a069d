"""CLI smoke tests (tiny configs, subprocess — the real user surface)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ~9 min of subprocess compiles; the same flows are covered by in-process
# integration tests.  Opt in with MMPDE_RUN_CLI_TESTS=1.
pytestmark = pytest.mark.skipif(
    not os.environ.get("MMPDE_RUN_CLI_TESTS"),
    reason="slow CLI subprocess tests; set MMPDE_RUN_CLI_TESTS=1")


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


def test_mmpde_plain_gnn_cli(tmp_path):
    r = _run(["mmpde.py".replace("mmpde.py", os.path.join(REPO, "mmpde.py")),
              "--moving_mesh", "False", "--base_resolution", "9,12,12",
              "--num_epochs", "1", "--inner_loops", "1", "--batch_size", "3",
              "--n_traj", "6", "--neighbors", "4",
              "--data_root", str(tmp_path / "data")], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Mean Timestep Test Error" in r.stdout


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
