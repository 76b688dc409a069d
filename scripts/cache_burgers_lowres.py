"""Write the committed low-res Burgers cache (data/burgers_48.npy).

All in-repo consumers subsample the 192^2 spectral-solver output to <= 48^2
(solver: mmpde.py base_resolution 31,48,48; DMM: mesh/dmm.py sub_u=4), so a
48^2 cache reproduces every training input exactly while being git-sized
(~28 MB vs 457 MB).  After an environment wipe the loaders fall back to it
(mmpde_tpu/data/loading.py::_burgers_raw) instead of re-paying the
~15-minute CPU generation.

    PYTHONPATH=. python scripts/cache_burgers_lowres.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mmpde_tpu.data.generate import ensure_burgers


def main():
    full = ensure_burgers("data/burgers_192.npy", n_traj=100)
    raw = np.load(full, mmap_mode="r")
    sub = np.ascontiguousarray(raw[:, :, ::4, ::4]).astype(np.float32)
    out = "data/burgers_48.npy"
    np.save(out, sub)
    print(f"{out}: {sub.shape} {sub.dtype} "
          f"{os.path.getsize(out) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
