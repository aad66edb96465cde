"""Fused SSIM + L1 + gradient depth loss as one Pallas TPU kernel.

The alhashim training loss (``src/GuideDepth/losses.py:15-38``) reads the
prediction/target pair ~12 times in its unfused form (five 11x11 gaussian
statistics, forward differences, L1). This kernel computes all three terms in
a single pass per batch element with every intermediate kept in VMEM: the
separable gaussian runs as 2x11 shifted multiply-adds (VPU), forward diffs and
L1 reduce in-register, and only three scalars per element leave the chip.

Backward is a custom VJP that recomputes through the pure-jnp reference
implementation (:class:`tpudepth.losses.DepthLoss`) — "backward-friendly": the
fused forward is used for the (recomputed) primal inside backward too, and
numerics match the reference path to f32 tolerance (tested).

VMEM needs ~14 full-image f32 buffers (~17 MB at 480x640, well inside the
v5e's 128 MB VMEM); inputs above 1M pixels fall back to jnp.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_WS = 11
# v5e exposes 128 MB VMEM; the kernel's live set is ~14 f32 image buffers,
# so full NYU 480x640 (307k px -> ~17 MB) and KITTI 384x1280 fit comfortably.
_MAX_PIXELS = 1024 * 1024


@functools.lru_cache(maxsize=None)
def _gauss_taps(window_size: int = _WS, sigma: float = 1.5) -> Tuple[float, ...]:
    g = np.array(
        [math.exp(-((i - window_size // 2) ** 2) / (2.0 * sigma**2)) for i in range(window_size)],
        dtype=np.float64,
    )
    g = g / g.sum()
    return tuple(float(v) for v in g.astype(np.float32))


def _make_kernel(c1: float, c2: float, h: int, w: int):
    taps = _gauss_taps()
    half = _WS // 2

    def kernel(pred_ref, tgt_ref, out_ref, padh, padw, mu1, mu2, e11, e22, e12):
        # scratch refs force buffer reuse — a fully unrolled value-level
        # formulation kept every intermediate alive and blew past VMEM.

        def gconv_into(dst, src):
            # rows pass: zero-padded SAME conv along H
            padh[:] = jnp.zeros((h + 2 * half, w), jnp.float32)
            padh[half : half + h, :] = src
            acc = taps[0] * padh[0:h, :]
            for t in range(1, _WS):
                acc = acc + taps[t] * padh[t : t + h, :]
            # cols pass
            padw[:] = jnp.zeros((h, w + 2 * half), jnp.float32)
            padw[:, half : half + w] = acc
            acc = taps[0] * padw[:, 0:w]
            for t in range(1, _WS):
                acc = acc + taps[t] * padw[:, t : t + w]
            dst[:] = acc

        p = pred_ref[0].astype(jnp.float32)
        t = tgt_ref[0].astype(jnp.float32)

        l1_sum = jnp.sum(jnp.abs(p - t))
        gx = jnp.sum(jnp.abs((t[:, 1:] - t[:, :-1]) - (p[:, 1:] - p[:, :-1])))
        gy = jnp.sum(jnp.abs((t[1:, :] - t[:-1, :]) - (p[1:, :] - p[:-1, :])))

        gconv_into(mu1, p)
        gconv_into(mu2, t)
        gconv_into(e11, p * p)
        gconv_into(e22, t * t)
        gconv_into(e12, p * t)

        m1 = mu1[:]
        m2 = mu2[:]
        s11 = e11[:] - m1 * m1
        s22 = e22[:] - m2 * m2
        s12 = e12[:] - m1 * m2
        v1 = 2.0 * s12 + c2
        v2 = s11 + s22 + c2
        ssim_map = ((2.0 * m1 * m2 + c1) * v1) / ((m1 * m1 + m2 * m2 + c1) * v2)
        ssim_sum = jnp.sum(ssim_map)

        i = pl.program_id(0)
        out_ref[i, 0] = l1_sum
        out_ref[i, 1] = ssim_sum
        out_ref[i, 2] = gx + gy

    return kernel


def _fused_partials(pred: jax.Array, target: jax.Array, val_range: float) -> jax.Array:
    b, h, w, c = pred.shape
    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    half = _WS // 2
    kernel = _make_kernel(c1, c2, h, w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3), jnp.float32),
        grid=(b,),
        in_specs=[
            # inputs squeezed to [B, H, W]: a trailing size-1 channel dim
            # would be lane-padded to 128 (39 MB per window at half res)
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2 * half, w), jnp.float32),
            pltpu.VMEM((h, w + 2 * half), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
        ],
        # one SMEM-resident [b, 3] block shared by all grid steps; each step
        # writes its own row (per-step (1,3) blocks violate Mosaic's
        # block-divisibility rule)
        out_specs=pl.BlockSpec((b, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        # full-res images need ~60 MB of scratch; the default scoped-vmem cap
        # is 16 MB but v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        pred.astype(jnp.float32).reshape(b, h, w),
        target.astype(jnp.float32).reshape(b, h, w),
    )


def _combine(partials: jax.Array, n_pixels: int, alpha, beta, gamma):
    total = partials.shape[0] * n_pixels
    l1 = jnp.sum(partials[:, 0]) / total
    ssim_mean = jnp.sum(partials[:, 1]) / total
    grad = jnp.sum(partials[:, 2]) / total
    l_ssim = jnp.clip((1.0 - ssim_mean) * 0.5, 0.0, 1.0)
    return alpha * l1 + beta * l_ssim + gamma * grad


def fused_depth_loss_available(shape) -> bool:
    _, h, w, c = shape
    return c == 1 and h >= _WS and w >= _WS and h * w <= _MAX_PIXELS


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_depth_loss(pred, target, alpha, beta, gamma, max_depth):
    """Fused alhashim Depth_Loss(alpha, beta, gamma) forward."""
    partials = _fused_partials(pred, target, max_depth)
    return _combine(partials, pred.shape[1] * pred.shape[2], alpha, beta, gamma)


def _fdl_fwd(pred, target, alpha, beta, gamma, max_depth):
    return fused_depth_loss(pred, target, alpha, beta, gamma, max_depth), (pred, target)


def _fdl_bwd(alpha, beta, gamma, max_depth, res, g):
    pred, target = res
    b, h, w, c = pred.shape
    total = b * h * w
    # recompute the (cheap) fused forward partials for the clip gate
    partials = _fused_partials(pred, target, max_depth)
    ssim_mean = jnp.sum(partials[:, 1]) / total
    pre = (1.0 - ssim_mean) * 0.5
    gate = jnp.where((pre > 0.0) & (pre < 1.0), 1.0, 0.0)
    gf = g.astype(jnp.float32)
    scales = jnp.stack(
        [alpha * gf / total,
         beta * gf * (-0.5) * gate / total,
         gamma * gf / total]
    ).reshape(1, 3)
    dpred = _fused_bwd(pred, target, max_depth, scales)
    return (dpred.reshape(pred.shape).astype(pred.dtype), None)


fused_depth_loss.defvjp(_fdl_fwd, _fdl_bwd)


# ---------------------------------------------------------------------------
# Pallas backward: analytic dL/dpred in one fused pass.
#
# The SSIM adjoint uses the symmetry of the gaussian (adjoint of a symmetric
# zero-pad SAME conv is itself): with
#   N1 = 2*mu1*mu2 + c1, D1 = mu1^2 + mu2^2 + c1,
#   s12 = e12 - mu1*mu2, s11 = e11 - mu1^2, s22 = e22 - mu2^2,
#   N2 = 2*s12 + c2,     D2 = s11 + s22 + c2,   R = 1/(D1*D2), M = N1*N2*R
# the per-pixel coefficient maps are
#   Cmu1 = 2*mu2*R*(N2 - N1) - 2*mu1*M*(1/D1 - 1/D2)
#   Ce11 = -M / D2
#   Ce12 = 2*N1*R
# and d(ssim_sum)/dp = g*(Cmu1) + g*(Ce11)*2p + g*(Ce12)*t.
# ---------------------------------------------------------------------------


def _make_bwd_kernel(c1: float, c2: float, h: int, w: int):
    taps = _gauss_taps()
    half = _WS // 2

    def kernel(pred_ref, tgt_ref, scales_ref, dout_ref,
               padh, padw, mu1, mu2, e11, e22, e12):
        def gconv_into(dst, src):
            padh[:] = jnp.zeros((h + 2 * half, w), jnp.float32)
            padh[half : half + h, :] = src
            acc = taps[0] * padh[0:h, :]
            for t in range(1, _WS):
                acc = acc + taps[t] * padh[t : t + h, :]
            padw[:] = jnp.zeros((h, w + 2 * half), jnp.float32)
            padw[:, half : half + w] = acc
            acc = taps[0] * padw[:, 0:w]
            for t in range(1, _WS):
                acc = acc + taps[t] * padw[:, t : t + w]
            dst[:] = acc

        p = pred_ref[0].astype(jnp.float32)
        t = tgt_ref[0].astype(jnp.float32)
        s_l1 = scales_ref[0, 0]
        s_ssim = scales_ref[0, 1]
        s_grad = scales_ref[0, 2]

        # L1 term
        d = s_l1 * jnp.sign(p - t)

        # gradient-loss term: q = (t-diff) - (p-diff); dgx/dp[j] = sx[j] - sx[j-1]
        sx = jnp.sign((t[:, 1:] - t[:, :-1]) - (p[:, 1:] - p[:, :-1]))  # [h, w-1]
        zcol = jnp.zeros((h, 1), jnp.float32)
        d = d + s_grad * (
            jnp.concatenate([sx, zcol], axis=1) - jnp.concatenate([zcol, sx], axis=1)
        )
        sy = jnp.sign((t[1:, :] - t[:-1, :]) - (p[1:, :] - p[:-1, :]))  # [h-1, w]
        zrow = jnp.zeros((1, w), jnp.float32)
        d = d + s_grad * (
            jnp.concatenate([sy, zrow], axis=0) - jnp.concatenate([zrow, sy], axis=0)
        )

        # SSIM term
        gconv_into(mu1, p)
        gconv_into(mu2, t)
        gconv_into(e11, p * p)
        gconv_into(e22, t * t)
        gconv_into(e12, p * t)
        m1 = mu1[:]
        m2 = mu2[:]
        n1 = 2.0 * m1 * m2 + c1
        d1 = m1 * m1 + m2 * m2 + c1
        s12 = e12[:] - m1 * m2
        s11 = e11[:] - m1 * m1
        s22 = e22[:] - m2 * m2
        n2 = 2.0 * s12 + c2
        d2 = s11 + s22 + c2
        r = 1.0 / (d1 * d2)
        m = n1 * n2 * r
        cmu1 = 2.0 * m2 * r * (n2 - n1) - 2.0 * m1 * m * (1.0 / d1 - 1.0 / d2)
        ce11 = -m / d2
        ce12 = 2.0 * n1 * r
        # reuse scratch for the adjoint convs
        gconv_into(mu1, cmu1)
        gconv_into(e11, ce11)
        gconv_into(e12, ce12)
        d = d + s_ssim * (mu1[:] + e11[:] * 2.0 * p + e12[:] * t)

        dout_ref[0] = d

    return kernel


def _fused_bwd(pred, target, val_range, scales):
    b, h, w = pred.shape[0], pred.shape[1], pred.shape[2]
    c1 = (0.01 * val_range) ** 2
    c2 = (0.03 * val_range) ** 2
    half = _WS // 2
    kernel = _make_bwd_kernel(c1, c2, h, w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * half, w), jnp.float32),
            pltpu.VMEM((h, w + 2 * half), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
        ],
    )(
        pred.astype(jnp.float32).reshape(b, h, w),
        target.astype(jnp.float32).reshape(b, h, w),
        scales,
    )
