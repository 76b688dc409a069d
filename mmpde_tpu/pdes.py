"""PDE metadata registry.

Mirrors the reference's PDE containers (reference: PDEs.py:20-67) as plain
dataclasses — no framework module needed, these only carry grid/time
metadata consumed by the data pipeline and models.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class PDE:
    """Generic PDE metadata container."""

    tmin: float = 0.0
    tmax: float = 1.0
    Lx: float = 1.0
    Ly: float = 1.0
    # (nt, nx, ny) for grid experiments, (nt, n_nodes) for mesh experiments
    grid_size: Tuple[int, ...] = (2, 2, 2)
    movingmesh_grid_size: Tuple[int, ...] = (2, 2, 2)
    ori_grid_size: Tuple[int, ...] = (2, 2, 2)
    # fixed node coordinates for mesh experiments, shape [n_nodes, 2]
    ori_grid: Optional[np.ndarray] = None

    @property
    def dt(self) -> float:
        return (self.tmax - self.tmin) / (self.grid_size[0] - 1)

    @property
    def n_nodes(self) -> int:
        if len(self.grid_size) == 3:
            return self.grid_size[1] * self.grid_size[2]
        return self.grid_size[1]

    def __repr__(self) -> str:  # matches reference checkpoint naming
        return "PDE"


def burgers(grid_size: Optional[Sequence[int]] = None,
            tmin: float = 0.0, tmax: float = 30.0, L: float = 1.0) -> PDE:
    """2-D Burgers on a regular grid (reference: PDEs.py:20-42)."""
    gs = tuple(grid_size) if grid_size is not None else (31, 96, 96)
    return PDE(tmin=tmin, tmax=tmax, Lx=L, Ly=L, grid_size=gs,
               movingmesh_grid_size=(31, 96, 96), ori_grid_size=(31, 96, 96))


def cy(ori_grid: Optional[np.ndarray] = None,
       grid_size: Optional[Sequence[int]] = None,
       tmin: float = 0.0, tmax: float = 2.9, L: float = 1.0) -> PDE:
    """Flow around a cylinder on a fixed triangular mesh (reference: PDEs.py:44-67)."""
    gs = tuple(grid_size) if grid_size is not None else (30, 2521)
    return PDE(tmin=tmin, tmax=tmax, Lx=L, Ly=L, grid_size=gs,
               movingmesh_grid_size=gs, ori_grid_size=gs, ori_grid=ori_grid)
