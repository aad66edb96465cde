from tpudepth.losses.losses import (
    DepthLoss,
    depth_norm_minmax,
    gradient_loss,
    l1_loss,
    silog_loss_variance,
    ssim,
    ssim_avgpool_loss,
    ssim_gaussian,
)

__all__ = [
    "DepthLoss",
    "depth_norm_minmax",
    "gradient_loss",
    "l1_loss",
    "silog_loss_variance",
    "ssim",
    "ssim_avgpool_loss",
    "ssim_gaussian",
]
