"""Async native checkpoint writer: round-trip, latest-wins, atomicity."""

import glob
import os

import numpy as np
import pytest

pytest.importorskip("ctypes")

from mmpde_tpu.utils.checkpoint import load_checkpoint
from mmpde_tpu.utils.native_writer import AsyncCheckpointWriter


def _state(i):
    return {"w": np.full((64, 64), float(i), np.float32),
            "step": np.int32(i)}


def test_roundtrip_matches_sync_format(tmp_path):
    d = str(tmp_path / "ckpt")
    with AsyncCheckpointWriter(d) as w:
        w.save(_state(3), config={"args": {"lr": 0.1}, "epoch": 3})
        w.flush()
    state, cfg = load_checkpoint(d, template=_state(0))
    assert float(state["w"][0, 0]) == 3.0
    assert int(state["step"]) == 3
    assert cfg["epoch"] == 3 and cfg["args"]["lr"] == 0.1


def test_latest_wins_under_rapid_saves(tmp_path):
    d = str(tmp_path / "ckpt")
    w = AsyncCheckpointWriter(d)
    last = 0
    for i in range(20):
        last = i
        w.save(_state(i), config={"epoch": i})
    w.flush()
    # every snapshot was either written or dropped in favor of a newer one;
    # the on-disk state must be some prefix-maximal one ending at `last`
    assert w.written + w.dropped == 20
    state, cfg = load_checkpoint(d, template=_state(0))
    assert int(state["step"]) == last
    assert cfg["epoch"] == last
    w.close()


def test_no_tmp_files_after_flush(tmp_path):
    d = str(tmp_path / "ckpt")
    with AsyncCheckpointWriter(d) as w:
        for i in range(5):
            w.save(_state(i))
        w.flush()
        assert glob.glob(os.path.join(d, "*.tmp")) == []
        assert glob.glob(os.path.join(d, ".*.tmp")) == []


def test_save_does_not_block_on_io(tmp_path):
    """save() returns before the bytes hit disk (queued, not written)."""
    d = str(tmp_path / "ckpt")
    big = {"w": np.zeros((512, 512, 8), np.float32)}  # 8 MB
    with AsyncCheckpointWriter(d) as w:
        seqs = [w.save(big) for _ in range(3)]
        assert seqs == [0, 1, 2]          # all queued immediately
        w.flush()
        assert w.written >= 1
    state, _ = load_checkpoint(d, template=big)
    assert state["w"].shape == (512, 512, 8)
