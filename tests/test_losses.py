"""Golden parity of losses vs torch compositions of the reference formulas."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpudepth.losses import (
    DepthLoss,
    depth_norm_minmax,
    gradient_loss,
    silog_loss_variance,
    ssim,
    ssim_gaussian,
)


def nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).contiguous()


def torch_ssim_avgpool(x, y):
    """The monodepth2 SSIM loss exactly as src/loss.py:57-88 computes it."""
    c1, c2 = 0.01**2, 0.03**2
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sigma_x = F.avg_pool2d(x**2, 3, 1) - mu_x**2
    sigma_y = F.avg_pool2d(y**2, 3, 1) - mu_y**2
    sigma_xy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return torch.clamp((1 - n / d) / 2, 0, 1).mean()


def torch_ssim_gaussian(img1, img2, val_range, window_size=11):
    """Gaussian SSIM exactly as src/GuideDepth/losses.py:41-79."""
    g = torch.tensor(
        [math.exp(-((i - window_size // 2) ** 2) / (2 * 1.5**2)) for i in range(window_size)]
    )
    g = (g / g.sum()).unsqueeze(1)
    window_2d = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    channel = img1.shape[1]
    window = window_2d.expand(channel, 1, window_size, window_size).contiguous()
    padd = window_size // 2
    mu1 = F.conv2d(img1, window, padding=padd, groups=channel)
    mu2 = F.conv2d(img2, window, padding=padd, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=padd, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=padd, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=padd, groups=channel) - mu1_mu2
    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    v1 = 2.0 * s12 + c2
    v2 = s1 + s2 + c2
    ssim_map = ((2 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    return ssim_map.mean()


def test_ssim_avgpool_matches_torch(rng):
    x = rng.random((2, 24, 32, 1), dtype=np.float32)
    y = rng.random((2, 24, 32, 1), dtype=np.float32)
    want = float(torch_ssim_avgpool(nchw(x), nchw(y)))
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert abs(got - want) < 1e-5


def test_ssim_gaussian_matches_torch(rng):
    x = rng.random((2, 32, 40, 1), dtype=np.float32) * 10
    y = rng.random((2, 32, 40, 1), dtype=np.float32) * 10
    want = float(torch_ssim_gaussian(nchw(x), nchw(y), val_range=10.0))
    got = float(ssim_gaussian(jnp.asarray(x), jnp.asarray(y), 10.0))
    assert abs(got - want) < 1e-4


def test_silog_matches_torch(rng):
    pred = rng.random((2, 16, 20, 1), dtype=np.float32)
    gt = rng.random((2, 16, 20, 1), dtype=np.float32)
    gt[0, :4] = 0.0  # invalid region exercises the mask

    tp, tg = nchw(pred), nchw(gt)
    mask = tg > 1e-3
    tpc = torch.clamp(tp, min=1e-6)
    d = torch.log(tpc[mask]) - torch.log(tg[mask])
    want = float(torch.sqrt((d**2).mean() - 0.85 * d.mean() ** 2) * 10.0)

    got = float(silog_loss_variance(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - want) < 1e-4


def test_silog_has_finite_grad_with_invalid_pixels(rng):
    pred = jnp.asarray(rng.random((1, 8, 8, 1), dtype=np.float32))
    gt = np.zeros((1, 8, 8, 1), dtype=np.float32)
    gt[0, 4:] = 1.0
    g = jax.grad(lambda p: silog_loss_variance(p, jnp.asarray(gt)))(pred)
    assert np.all(np.isfinite(np.asarray(g)))


def test_depth_loss_alhashim_matches_torch(rng):
    pred = rng.random((2, 30, 40, 1), dtype=np.float32) * 10
    gt = rng.random((2, 30, 40, 1), dtype=np.float32) * 10
    tp, tg = nchw(pred), nchw(gt)

    l1 = F.l1_loss(tp, tg)
    l_ssim = torch.clamp((1 - torch_ssim_gaussian(tp, tg, 10.0)) * 0.5, 0, 1)
    right = F.pad(tp, [0, 1, 0, 0])[:, :, :, 1:]
    bottom = F.pad(tp, [0, 0, 0, 1])[:, :, 1:, :]
    p_dx, p_dy = right - tp, bottom - tp
    p_dx[..., -1], p_dy[:, :, -1, :] = 0, 0
    rightg = F.pad(tg, [0, 1, 0, 0])[:, :, :, 1:]
    bottomg = F.pad(tg, [0, 0, 0, 1])[:, :, 1:, :]
    g_dx, g_dy = rightg - tg, bottomg - tg
    g_dx[..., -1], g_dy[:, :, -1, :] = 0, 0
    l_grad = ((g_dx - p_dx).abs() + (g_dy - p_dy).abs()).mean()
    want = float(0.1 * l1 + 1.0 * l_ssim + 1.0 * l_grad)

    loss = DepthLoss(0.1, 1.0, 1.0, max_depth=10.0)
    got = float(loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - want) < 1e-4


def test_depth_loss_l1_only_masks_invalid(rng):
    pred = rng.random((1, 8, 8, 1), dtype=np.float32)
    gt = rng.random((1, 8, 8, 1), dtype=np.float32)
    gt[0, :2] = 0.0
    loss = DepthLoss(1.0, 0.0, 0.0)
    want = float(np.mean(np.abs((pred - gt)[gt > 0])))
    got = float(loss(jnp.asarray(pred), jnp.asarray(gt)))
    assert abs(got - want) < 1e-6


def test_depth_norm_minmax_is_global(rng):
    d = rng.random((3, 4, 5, 1), dtype=np.float32)
    got = np.asarray(depth_norm_minmax(jnp.asarray(d)))
    want = (d - d.min()) / (d.max() - d.min())
    np.testing.assert_allclose(got, want, rtol=1e-6)
