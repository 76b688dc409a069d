from mmpde_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from mmpde_tpu.utils.logging import MetricLogger

__all__ = ["save_checkpoint", "load_checkpoint", "MetricLogger"]
