"""Depth losses, NHWC, pure jnp — numerics match the reference bit-for-bit
(modulo fp order) so training curves are comparable.

- monodepth2-style 3x3 avg-pool SSIM loss (``src/loss.py:57-88``)
- 11x11 Gaussian SSIM (``src/GuideDepth/losses.py:41-79``, also the
  commented-out root variant ``src/loss.py:17-55``)
- P3Depth SILog with variance focus 0.85 (``src/loss.py:116-129``)
- Alhashim combined Depth_Loss(alpha*L1 + beta*SSIM + gamma*grad)
  (``src/GuideDepth/losses.py:15-38``)
- per-batch min-max DepthNorm (``src/utils.py:7-8``)

Masked selections (``prediction[mask]``) become where()-reductions so shapes
stay static under jit.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpudepth.ops.image import avg_pool, image_gradients, reflection_pad2d


def depth_norm_minmax(depth: jax.Array) -> jax.Array:
    """Per-batch min-max normalization (``src/utils.py:7-8``): the min/max are
    *global* over the whole batch tensor, making the target depend on batch
    composition — replicated exactly (under a sharded batch the min/max become
    cross-device reductions, inserted by XLA)."""
    dmin = jnp.min(depth)
    dmax = jnp.max(depth)
    return (depth - dmin) / (dmax - dmin)


def l1_loss(pred: jax.Array, target: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if mask is None:
        return jnp.mean(diff)
    mask = mask.astype(jnp.float32)
    return jnp.sum(diff * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """monodepth2 SSIM *loss*: clamp((1 - SSIM)/2, 0, 1).mean().

    ReflectionPad(1) + 3x3 AvgPool statistics, C1=0.01^2, C2=0.03^2
    (``src/loss.py:57-88``). NHWC inputs.
    """
    c1, c2 = 0.01**2, 0.03**2
    x = reflection_pad2d(x.astype(jnp.float32), 1)
    y = reflection_pad2d(y.astype(jnp.float32), 1)
    mu_x = avg_pool(x, 3)
    mu_y = avg_pool(y, 3)
    sigma_x = avg_pool(x * x, 3) - mu_x**2
    sigma_y = avg_pool(y * y, 3) - mu_y**2
    sigma_xy = avg_pool(x * y, 3) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(jnp.clip((1 - ssim_n / ssim_d) / 2, 0, 1))


ssim_avgpool_loss = ssim


@functools.lru_cache(maxsize=None)
def _gaussian_1d(window_size: int, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [math.exp(-((i - window_size // 2) ** 2) / (2.0 * sigma**2)) for i in range(window_size)],
        dtype=np.float32,
    )
    return (g / g.sum()).astype(np.float32)


def ssim_gaussian(
    img1: jax.Array,
    img2: jax.Array,
    val_range: float,
    window_size: int = 11,
) -> jax.Array:
    """Gaussian-window SSIM *similarity* (not loss), Alhashim/GuideDepth
    variant (``src/GuideDepth/losses.py:41-79``): depthwise conv with an 11x11
    gaussian, padding ws//2, returns mean of the SSIM map.

    TPU note: the 2-D gaussian is separable, so the depthwise conv runs as
    two 1-D convs — same numerics (the reference builds its 2-D window as an
    outer product, ``src/GuideDepth/losses.py:118-122``), far cheaper to
    compile and run than the 11x11 grouped conv."""
    l = val_range
    _, h, w, c = img1.shape
    real_size = min(window_size, h, w)
    g1d = jnp.asarray(_gaussian_1d(real_size))
    padd = window_size // 2

    def gconv(x):
        x = x.astype(jnp.float32)
        kh = jnp.tile(g1d[:, None, None, None], (1, 1, 1, c))  # [ws,1,1,c]
        kw = jnp.tile(g1d[None, :, None, None], (1, 1, 1, c))  # [1,ws,1,c]
        x = jax.lax.conv_general_dilated(
            x, kh, (1, 1), [(padd, padd), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )
        return jax.lax.conv_general_dilated(
            x, kw, (1, 1), [(0, 0), (padd, padd)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu1 = gconv(img1)
    mu2 = gconv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = gconv(img1 * img1) - mu1_sq
    sigma2_sq = gconv(img2 * img2) - mu2_sq
    sigma12 = gconv(img1 * img2) - mu1_mu2
    c1 = (0.01 * l) ** 2
    c2 = (0.03 * l) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    ssim_map = ((2 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    return jnp.mean(ssim_map)


def silog_loss_variance(
    prediction: jax.Array, gt: jax.Array, variance_focus: float = 0.85
) -> jax.Array:
    """P3Depth-style scale-invariant log loss (``src/loss.py:116-129``):
    mask gt > 1e-3, clamp pred >= 1e-6, d = log(pred) - log(gt),
    sqrt(mean(d^2) - 0.85 * mean(d)^2) * 10."""
    mask = (gt > 1e-3).astype(jnp.float32)
    pred = jnp.maximum(prediction.astype(jnp.float32), 1e-6)
    # log only where valid to avoid nan grads through masked lanes
    safe_gt = jnp.where(mask > 0, gt.astype(jnp.float32), 1.0)
    safe_pred = jnp.where(mask > 0, pred, 1.0)
    d = jnp.log(safe_pred) - jnp.log(safe_gt)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    mean_d = jnp.sum(d * mask) / n
    mean_d2 = jnp.sum(d * d * mask) / n
    return jnp.sqrt(mean_d2 - variance_focus * mean_d**2) * 10.0


def gradient_loss(pred: jax.Array, gt: jax.Array, alpha: float = 1.0) -> jax.Array:
    """tf.image_gradients-style forward-difference edge loss
    (``src/GuideDepth/losses.py:82-92``)."""
    pred_dx, pred_dy = image_gradients(pred.astype(jnp.float32))
    gt_dx, gt_dy = image_gradients(gt.astype(jnp.float32))
    diff_x = jnp.abs(gt_dx - pred_dx)
    diff_y = jnp.abs(gt_dy - pred_dy)
    if alpha != 1.0:
        diff_x = diff_x**alpha
        diff_y = diff_y**alpha
    return jnp.mean(diff_x + diff_y)


class DepthLoss:
    """Alhashim combined loss (``src/GuideDepth/losses.py:15-38``).

    loss = alpha * L1 + beta * clamp((1 - SSIM_gauss) * 0.5, 0, 1)
         + gamma * gradient_loss.
    With beta == gamma == 0 it reduces to validity-masked L1 (depth > 0).
    """

    def __init__(self, alpha: float, beta: float, gamma: float, max_depth: float = 10.0):
        self.alpha = alpha
        self.beta = beta
        self.gamma = gamma
        self.max_depth = max_depth

    def __call__(self, output: jax.Array, depth: jax.Array) -> jax.Array:
        if self.beta == 0 and self.gamma == 0:
            return l1_loss(output, depth, mask=depth > 0.0)
        l_depth = l1_loss(output, depth)
        l_ssim = jnp.clip((1 - ssim_gaussian(output, depth, self.max_depth)) * 0.5, 0, 1)
        l_grad = gradient_loss(output, depth)
        return self.alpha * l_depth + self.beta * l_ssim + self.gamma * l_grad
