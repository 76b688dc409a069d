"""Self-describing checkpoints with resume support.

The reference torch.saves dicts with the argparse Namespace pickled in, and
rebuilds model architectures from ``checkpoint['args']`` at load time
(mmpde.py:191-200, mesh/dmm_utils.py:772-782) — but has no resume logic.
Here a checkpoint is a directory:

    config.json        architecture + trainer config (JSON, human-readable)
    state.msgpack      flax-serialised pytree (params, batch_stats,
                       opt_state, step, ... whatever the caller passes)

``load_checkpoint`` restores into a matching pytree template, or returns the
raw nested-dict state when no template is given (enough to rebuild params).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import flax.serialization


def save_checkpoint(path: str, state: Any, config: Optional[dict] = None):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "state.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    if config is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(config, f, indent=2, default=str)


def load_checkpoint(path: str, template: Any = None):
    """Returns (state, config). ``template`` shapes the restored pytree."""
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = f.read()
    if template is not None:
        state = flax.serialization.from_bytes(template, raw)
    else:
        state = flax.serialization.msgpack_restore(raw)
    cfg_path = os.path.join(path, "config.json")
    config = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config = json.load(f)
    return state, config
