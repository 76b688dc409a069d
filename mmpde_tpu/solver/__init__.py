from mmpde_tpu.solver.data import GraphPipeline
from mmpde_tpu.solver import train

__all__ = ["GraphPipeline", "train"]
