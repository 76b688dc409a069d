from mmpde_tpu.dmm.geometry import (
    branch_features, phi_derivatives, moved_mesh, rf_feature_derivatives,
)

__all__ = ["branch_features", "phi_derivatives", "moved_mesh",
           "rf_feature_derivatives"]
