"""mmpde_tpu — a TPU-native JAX framework with the capabilities of MM-PDE.

Re-implements, TPU-first (jit/pjit/scan/Pallas), the feature set of
Peiyannn/MM-PDE ("Better Neural PDE Solvers Through Data-Free Mesh Movers",
ICLR 2024):

* DMM — a DeepONet-style branch/trunk operator network producing a mesh
  potential ``phi(u, xi)``; the moved mesh is ``x = xi + grad_xi phi``.
  Trained label-free with a Monge-Ampere residual loss
  (reference: mesh/dmm_utils.py:441-552).
* MM-PDE — a two-branch autoregressive message-passing PDE solver (moved
  mesh + uniform mesh) with a learnable interpolation network (ItpNet) and
  residual-cut correction (reference: train_helper_2d.py:114-121).

Layout:
  ops/       device-native numerics: monitor/finite differences, softmax-IDW
             interpolation, kNN neighbor search, weighted sampling
  models/    DenseNet, ConvNet branch, DMM, MP-PDE GNN, ItpNet, BaseCNN
  dmm/       Monge-Ampere loss + DMM training loops
  solver/    graph/data pipeline + solver training loops
  data/      dataset generation (Burgers 2-D, cylinder) and loading
  parallel/  jax.sharding mesh helpers (data parallel, node sharding)
  eval/      mesh-quality evaluation and plotting
  utils/     checkpointing, logging, profiling
"""

__version__ = "0.1.0"
