from gaussian_transformer_tpu.ops.losses import l1_loss, l2_loss, ssim
from gaussian_transformer_tpu.ops.knn import mean_sq_dist_to_3nn
from gaussian_transformer_tpu.ops.chamfer import chamfer_distance

__all__ = [
    "l1_loss",
    "l2_loss",
    "ssim",
    "mean_sq_dist_to_3nn",
    "chamfer_distance",
]
