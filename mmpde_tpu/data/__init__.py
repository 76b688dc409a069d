from mmpde_tpu.data.generate import ensure_burgers, ensure_cylinder
from mmpde_tpu.data.loading import load_experiment

__all__ = ["ensure_burgers", "ensure_cylinder", "load_experiment"]
