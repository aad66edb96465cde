"""Fused root-recipe loss (monodepth2 SSIM + L1) as one Pallas TPU kernel.

The root training stack's loss (``src/train.py:94-100`` with
``src/loss.py:57-88``) is ``beta * mean(clip((1-SSIM)/2, 0, 1)) +
alpha * mean(|p-t|)`` where SSIM uses ReflectionPad(1) + 3x3 average-pool
statistics. Unfused it costs 20.4 ms fwd+bwd at 480x640 bs8 on v5e — a
third of a SAM train step (PERF.md round 2). This kernel mirrors
:mod:`tpudepth.ops.pallas.fused_loss` (the alhashim-recipe kernel): one
VMEM-resident pass per batch element for the forward partial sums, and an
analytic one-pass backward.

Differences from the alhashim kernel that shape the math here:
- 3x3 BOX window with REFLECTION padding (not 11x11 gaussian, zero pad):
  the pool adjoint is a zero-padded full correlation followed by folding
  the pad rows/cols back onto their reflection sources.
- the clip is PER PIXEL (inside the mean), so the backward gates each
  pixel's SSIM adjoint individually rather than gating the scalar mean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C1 = 0.01**2
_C2 = 0.03**2
_MAX_PIXELS = 1024 * 1024
_THIRD = 1.0 / 3.0


def fused_root_loss_available(shape) -> bool:
    _, h, w, c = shape
    return c == 1 and h >= 4 and w >= 4 and h * w <= _MAX_PIXELS


def _box_into(dst, src, padh, padw, h, w):
    """3x3 box mean with reflection pad 1 (torch ReflectionPad2d + AvgPool)."""
    padh[1 : h + 1, :] = src
    padh[0:1, :] = src[1:2, :]
    padh[h + 1 : h + 2, :] = src[h - 2 : h - 1, :]
    acc = (padh[0:h, :] + padh[1 : h + 1, :] + padh[2 : h + 2, :]) * _THIRD
    padw[:, 1 : w + 1] = acc
    padw[:, 0:1] = acc[:, 1:2]
    padw[:, w + 1 : w + 2] = acc[:, w - 2 : w - 1]
    dst[:] = (padw[:, 0:w] + padw[:, 1 : w + 1] + padw[:, 2 : w + 2]) * _THIRD


def _box_adjoint_into(dst, src, padh, padw, h, w):
    """Adjoint of :func:`_box_into` (symmetric box; reflection-pad transpose
    folds the two pad lines back onto rows/cols 1 and n-2)."""
    # W pass adjoint: full correlation with zero pad, then fold cols
    padw[:, 2 : w + 2] = src
    padw[:, 0:2] = jnp.zeros((h, 2), jnp.float32)
    padw[:, w + 2 : w + 4] = jnp.zeros((h, 2), jnp.float32)
    # gp[q] = (src[q] + src[q-1] + src[q-2])/3 (zero OOB), q in [0, w+2)
    gp = (padw[:, 0 : w + 2] + padw[:, 1 : w + 3] + padw[:, 2 : w + 4]) * _THIRD
    acc = gp[:, 1 : w + 1]
    # fold the pad columns back onto cols 1 and w-2 (Mosaic has no
    # scatter-add; build the sparse addends by concatenation instead)
    zc = jnp.zeros((h, 1), jnp.float32)
    acc = acc + jnp.concatenate(
        [zc, gp[:, 0:1]] + [jnp.zeros((h, w - 2), jnp.float32)], axis=1)
    acc = acc + jnp.concatenate(
        [jnp.zeros((h, w - 2), jnp.float32), gp[:, w + 1 : w + 2], zc], axis=1)
    # H pass adjoint
    padh[2 : h + 2, :] = acc
    padh[0:2, :] = jnp.zeros((2, w), jnp.float32)
    padh[h + 2 : h + 4, :] = jnp.zeros((2, w), jnp.float32)
    gp = (padh[0 : h + 2, :] + padh[1 : h + 3, :] + padh[2 : h + 4, :]) * _THIRD
    acc = gp[1 : h + 1, :]
    zr = jnp.zeros((1, w), jnp.float32)
    acc = acc + jnp.concatenate(
        [zr, gp[0:1, :], jnp.zeros((h - 2, w), jnp.float32)], axis=0)
    acc = acc + jnp.concatenate(
        [jnp.zeros((h - 2, w), jnp.float32), gp[h + 1 : h + 2, :], zr], axis=0)
    dst[:] = acc


def _stats(p, t, box, mu1, mu2, e11, e22, e12):
    box(mu1, p)
    box(mu2, t)
    box(e11, p * p)
    box(e22, t * t)
    box(e12, p * t)
    m1, m2 = mu1[:], mu2[:]
    s11 = e11[:] - m1 * m1
    s22 = e22[:] - m2 * m2
    s12 = e12[:] - m1 * m2
    n1 = 2.0 * m1 * m2 + _C1
    d1 = m1 * m1 + m2 * m2 + _C1
    n2 = 2.0 * s12 + _C2
    d2 = s11 + s22 + _C2
    return m1, m2, n1, d1, n2, d2


def _make_fwd_kernel(h: int, w: int):
    def kernel(pred_ref, tgt_ref, out_ref, padh, padw, mu1, mu2, e11, e22, e12):
        box = functools.partial(_box_into, padh=padh, padw=padw, h=h, w=w)
        p = pred_ref[0].astype(jnp.float32)
        t = tgt_ref[0].astype(jnp.float32)
        l1_sum = jnp.sum(jnp.abs(p - t))
        _, _, n1, d1, n2, d2 = _stats(p, t, box, mu1, mu2, e11, e22, e12)
        ssim_map = (n1 * n2) / (d1 * d2)
        loss_map = jnp.clip((1.0 - ssim_map) * 0.5, 0.0, 1.0)
        i = pl.program_id(0)
        out_ref[i, 0] = jnp.sum(loss_map)
        out_ref[i, 1] = l1_sum

    return kernel


def _make_bwd_kernel(h: int, w: int):
    def kernel(pred_ref, tgt_ref, scales_ref, dout_ref,
               padh, padwf, padha, padwa, mu1, mu2, e11, e22, e12):
        box = functools.partial(_box_into, padh=padh, padw=padwf, h=h, w=w)
        boxT = functools.partial(_box_adjoint_into, padh=padha, padw=padwa,
                                 h=h, w=w)
        p = pred_ref[0].astype(jnp.float32)
        t = tgt_ref[0].astype(jnp.float32)
        s_ssim = scales_ref[0, 0]  # beta * g / total
        s_l1 = scales_ref[0, 1]   # alpha * g / total

        d = s_l1 * jnp.sign(p - t)

        m1, m2, n1, d1, n2, d2 = _stats(p, t, box, mu1, mu2, e11, e22, e12)
        r = 1.0 / (d1 * d2)
        m = n1 * n2 * r
        pre = (1.0 - m) * 0.5
        # per-pixel clip gate; d(clip((1-ssim)/2))/dssim = -1/2 inside
        gate = jnp.where((pre > 0.0) & (pre < 1.0), -0.5, 0.0) * s_ssim
        cmu1 = gate * (2.0 * m2 * r * (n2 - n1) - 2.0 * m1 * m * (1.0 / d1 - 1.0 / d2))
        ce11 = gate * (-m / d2)
        ce12 = gate * (2.0 * n1 * r)
        # adjoint pools back to pixel space (reuse stat scratch)
        boxT(mu1, cmu1)
        boxT(e11, ce11)
        boxT(e12, ce12)
        d = d + mu1[:] + e11[:] * 2.0 * p + e12[:] * t
        dout_ref[0] = d

    return kernel


def _fused_partials(pred: jax.Array, target: jax.Array) -> jax.Array:
    b, h, w, _ = pred.shape
    return pl.pallas_call(
        _make_fwd_kernel(h, w),
        out_shape=jax.ShapeDtypeStruct((b, 2), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2, w), jnp.float32),
            pltpu.VMEM((h, w + 2), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
        ],
        out_specs=pl.BlockSpec((b, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        pred.astype(jnp.float32).reshape(b, h, w),
        target.astype(jnp.float32).reshape(b, h, w),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_root_loss(pred, target, ssim_weight, l1_weight):
    """``ssim_weight * ssim_loss + l1_weight * L1`` (root recipe,
    ``src/train.py:94-100``), fused."""
    partials = _fused_partials(pred, target)
    total = pred.shape[0] * pred.shape[1] * pred.shape[2]
    return (ssim_weight * jnp.sum(partials[:, 0])
            + l1_weight * jnp.sum(partials[:, 1])) / total


def _frl_fwd(pred, target, ssim_weight, l1_weight):
    return fused_root_loss(pred, target, ssim_weight, l1_weight), (pred, target)


def _frl_bwd(ssim_weight, l1_weight, res, g):
    pred, target = res
    b, h, w, _ = pred.shape
    total = b * h * w
    gf = g.astype(jnp.float32)
    scales = jnp.stack(
        [ssim_weight * gf / total, l1_weight * gf / total]).reshape(1, 2)
    dpred = pl.pallas_call(
        _make_bwd_kernel(h, w),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w), jnp.float32),
            pltpu.VMEM((h, w + 2), jnp.float32),
            pltpu.VMEM((h + 4, w), jnp.float32),
            pltpu.VMEM((h, w + 4), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
            pltpu.VMEM((h, w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        pred.astype(jnp.float32).reshape(b, h, w),
        target.astype(jnp.float32).reshape(b, h, w),
        scales,
    )
    return (dpred.reshape(pred.shape).astype(pred.dtype), None)


fused_root_loss.defvjp(_frl_fwd, _frl_bwd)
