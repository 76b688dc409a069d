"""Chain stall-watchdog rehearsal (VERDICT r4 next-step 6).

Two TPU-side hangs in two rounds (r3f epoch 40, r4c cy epoch 25) motivated
scripts/watchdog_run.sh; this test injects a mid-training hang via
scripts/_fake_trainer.py and asserts detection + PID-targeted kill +
checkpoint resume to completion.  Pure subprocess/bash — no jax."""

import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_survives_injected_hang():
    r = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "test_watchdog_rehearsal.sh")],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "PASS: watchdog rehearsal" in r.stdout
