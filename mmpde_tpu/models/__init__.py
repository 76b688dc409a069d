from mmpde_tpu.models.mlp import DenseNet
from mmpde_tpu.models.convnet import ConvBranchNet
from mmpde_tpu.models.dmm import DMM
from mmpde_tpu.models.gnn import MPSolver2D
from mmpde_tpu.models.itpnet import ItpNet
from mmpde_tpu.models.cnn import BaseCNN, BaseCNN3d

__all__ = ["DenseNet", "ConvBranchNet", "DMM", "MPSolver2D", "ItpNet",
           "BaseCNN", "BaseCNN3d"]
