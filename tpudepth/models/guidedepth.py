"""GuideDepth: DDRNet-23-slim + guided upsampling pyramid (flax, NHWC).

Rebuild of ``src/GuideDepth/model/GuideDepth.py`` and
``src/GuideDepth/model/modules.py``: the backbone's 1/8-res feature is
upsampled x2 three times, each step refined by a Guided Upsampling Block
conditioned on the RGB pyramid (nearest-downsampled halves —
``GuideDepth.py:46-47`` uses default-mode interpolate).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudepth.models.ddrnet import DualResNetBackbone
from tpudepth.models.layers import BatchNorm, Conv, relu
from tpudepth.ops.image import resize_bilinear, resize_nearest

_BN_MOM = 0.1
_BN_EPS = 1e-5


def gub_fused_enabled() -> bool:
    """Trace-time dispatch for the fused Pallas GUB stage kernels
    (ops/pallas/gub_conv.py) — EXPERIMENTAL, default OFF.

    Measured on the real v5e (PERF.md round 3): the all-Pallas stage runs
    the full-res train step at 137.8 img/s and the k1-via-jnp hybrid at
    144.8, vs 169.4 for XLA's own conv pipeline — XLA's conv fusions at
    these shapes are already near the HBM roofline, and the custom-call
    boundary + kernel pipeline overheads cost more than the ~18 ms/step of
    relayout copies they remove. The hybrid additionally trips a
    program-shape-sensitive gradient NaN on TPU (fine when the grads gain
    extra consumers; minimal repro scripts/repro_grad_nan_fusion.py,
    writeup docs/xla_tpu_grad_nan_bug.md). Set
    ``TPUDEPTH_GUB=fused`` to engage anyway."""
    return os.environ.get("TPUDEPTH_GUB") == "fused"


def _packed_prelude(pre, block, bsz):
    """Tile a per-original-channel BN affine (A, C) to per-(batch, packed
    channel) arrays for the fused kernel."""
    from tpudepth.ops.packed import block_total, tile_channel

    a, c = pre
    n = block_total(block) * a.shape[0]
    return (jnp.broadcast_to(tile_channel(a, block)[None], (bsz, n)),
            jnp.broadcast_to(tile_channel(c, block)[None], (bsz, n)))


def _se_prelude(pre, exc, block):
    """Fold a (positive) SE excitation [B, C_orig] into the BN affine:
    relu(x*A + C) * se == relu(x*(A*se) + C*se) because se > 0
    (sigmoid output; SELayer applies the scale after the relu)."""
    from tpudepth.ops.packed import block_total, tile_channel

    a, c = pre
    e = jnp.tile(exc.astype(jnp.float32), (1, block_total(block)))
    return (tile_channel(a, block)[None] * e,
            tile_channel(c, block)[None] * e)


def _norm_mean(y, pre, block, dt):
    """Per-original-channel spatial mean of ``relu(y*A + C)`` (the SE
    squeeze input) computed without materializing the normalized tensor."""
    from tpudepth.ops.packed import packed_channel_mean, tile_channel

    a, c = pre
    z = (y.astype(jnp.float32) * tile_channel(a, block)
         + tile_channel(c, block))
    return packed_channel_mean(jnp.maximum(z, 0.0).astype(dt), block)


class SELayer(nn.Module):
    """Channel SE with spatial mean squeeze (TensorRT-friendly variant,
    ``modules.py:5-25``); bias-free linears, reduction=1 in GUB.

    ``packed``: input is a space-to-depth tensor; the squeeze averages the
    packed copies back to per-original-channel means (identical values) and
    the excitation scale is tiled back — the fc params are unchanged."""

    reduction: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, packed=0, splits=None, squeezed=None):
        """``splits``: the input is a PLAIN channel concat of packed tensors
        with these original channel counts (cheap-layout alternative to
        packed_concat — see ops/packed.py). The squeeze/excite then works per
        part; fc params are identical to the packed_concat form because the
        squeezed vector is in original-channel order either way.

        ``squeezed``: fused-kernel path — the caller provides the squeeze
        means [B, C_orig] directly and gets back the raw excitation
        [B, C_orig] (to be folded into the next conv's prelude) instead of
        the scaled tensor."""
        if squeezed is not None:
            c = squeezed.shape[-1]
            y = squeezed
        elif packed and splits:
            from tpudepth.ops.packed import block_total, packed_channel_mean

            b2 = block_total(packed)
            c = x.shape[-1] // b2
            offs = [0]
            for cj in splits:
                offs.append(offs[-1] + b2 * cj)
            parts = [x[..., offs[j]:offs[j + 1]] for j in range(len(splits))]
            y = jnp.concatenate(
                [packed_channel_mean(p, packed) for p in parts], axis=-1)
        elif packed:
            from tpudepth.ops.packed import block_total, packed_channel_mean

            c = x.shape[-1] // block_total(packed)
            y = packed_channel_mean(x, packed)
        else:
            c = x.shape[-1]
            y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        if squeezed is not None:
            return y
        if packed and splits:
            from tpudepth.ops.packed import block_total

            b2 = block_total(packed)
            offs = [0]
            for cj in splits:
                offs.append(offs[-1] + cj)
            y = jnp.concatenate(
                [jnp.tile(y[:, offs[j]:offs[j + 1]], (1, b2))
                 for j in range(len(splits))], axis=-1)
        elif packed:
            from tpudepth.ops.packed import block_total

            y = jnp.tile(y, (1, block_total(packed)))
        return x * y[:, None, None, :]


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool, packed: int = 0, input_splits=None,
                 fused_preludes=None):
        """Fused path (``x`` is a TUPLE of packed parts): the conv runs as
        the Pallas kernel with the previous layer's BN affine applied on the
        fly and this layer's batch statistics accumulated in-pass; returns
        ``(raw_conv_out, (A, C))`` — the normalized/activated tensor never
        exists. Plain path returns ``relu(bn(conv(x)))`` as before."""
        if isinstance(x, (tuple, list)):
            from tpudepth.ops.packed import block_total

            conv = Conv(self.features, self.kernel,
                        padding=(self.kernel - 1) // 2, use_bias=True,
                        dtype=self.dtype, name="conv")
            bn = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn")
            if train and self.kernel != 1:
                y, s, q = conv(tuple(x), packed=packed,
                               input_splits=input_splits,
                               fused_preludes=fused_preludes,
                               fused_stats=True)
                b2 = block_total(packed)
                n = y.shape[0] * y.shape[1] * y.shape[2] * b2
                stats_in = (s, q, float(n))
            else:
                # k=1 runs as a jnp dot (layers.py _k1_fused); its BN
                # reduces from y directly (XLA fuses the reduction)
                y = conv(tuple(x), packed=packed, input_splits=input_splits,
                         fused_preludes=fused_preludes, fused_stats=False)
                stats_in = None
            vec = bn(y, train, packed=packed, stats_in=stats_in,
                     as_vectors=True)
            return y, vec
        x = Conv(self.features, self.kernel, padding=(self.kernel - 1) // 2,
                 use_bias=True, dtype=self.dtype, name="conv")(
            x, packed=packed, input_splits=input_splits)
        x = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn")(
            x, train, packed=packed)
        return relu(x)


class GuidedUpsamplingBlock(nn.Module):
    """GUB (``modules.py:29-100``), guidance_type='full':

    feature branch (conv3-BN-ReLU, conv1-BN-ReLU to expand//2) || guide branch
    (same on RGB) -> concat -> SE(reduction=1) -> comb conv back to
    in_features -> +depth residual -> 1x1 reduce.

    ``packed``: all tensors flow in space-to-depth layout (see
    :mod:`tpudepth.ops.packed`) — exact same math with 4x the channels at 1/4
    the spatial size, which is ~5x faster on the MXU for the thin-channel
    full/half-res stages (scripts/bench_s2d.py). Parameters are identical."""

    in_features: int
    expand_features: int
    out_features: int
    kernel_size: int = 3
    channel_attention: bool = True
    dtype: Optional[Any] = None
    #: execute the packed stage through the fused Pallas conv kernels
    #: (ops/pallas/gub_conv.py) — TPU fast path, mathematically the same
    fused: bool = False

    @nn.compact
    def __call__(self, guide, depth, train: bool = False, packed: int = 0):
        if packed and self.fused:
            return self._fused(guide, depth, train, packed)
        ef = self.expand_features
        x = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype, name="feature_conv_a")(depth, train, packed)
        x = _ConvBNRelu(ef // 2, 1, dtype=self.dtype, name="feature_conv_b")(x, train, packed)

        y = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype, name="guide_conv_a")(guide, train, packed)
        y = _ConvBNRelu(ef // 2, 1, dtype=self.dtype, name="guide_conv_b")(y, train, packed)

        # Plain channel concat even when packed: the interleaving
        # packed_concat reshapes cost ~4 ms per occurrence in hostile XLA
        # layouts (PERF.md round 2); instead the SE squeeze works per part
        # and comb_conv_a's packed kernel re-indexes its input channels.
        xy = jnp.concatenate([x, y], axis=-1)
        splits = (ef // 2, ef // 2) if packed else None
        if self.channel_attention:
            xy = SELayer(reduction=1, dtype=self.dtype, name="SE_block")(
                xy, packed=packed, splits=splits)

        r = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype, name="comb_conv_a")(
            xy, train, packed, input_splits=splits)
        r = _ConvBNRelu(self.in_features, 1, dtype=self.dtype, name="comb_conv_b")(r, train, packed)

        return Conv(self.out_features, 1, padding=0, use_bias=True, dtype=self.dtype,
                    name="reduce")(r + depth, packed=packed)

    def _fused(self, guide, depth, train: bool, packed):
        """Fused-kernel execution: every conv is a Pallas custom call that
        applies the previous BN+relu (and SE scale / residual) on the fly and
        emits its own BN statistics — no normalized activation and no conv
        emitter (and hence none of XLA:TPU's conv layout copies) in the whole
        stage. Parameter tree identical to the plain path."""
        ef = self.expand_features
        bsz = depth.shape[0]
        dt = self.dtype or depth.dtype

        y1, p1 = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype,
                             name="feature_conv_a")((depth,), train, packed)
        y2, p2 = _ConvBNRelu(ef // 2, 1, dtype=self.dtype,
                             name="feature_conv_b")(
            (y1,), train, packed,
            fused_preludes=(_packed_prelude(p1, packed, bsz),))

        g1, q1 = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype,
                             name="guide_conv_a")((guide,), train, packed)
        g2, q2 = _ConvBNRelu(ef // 2, 1, dtype=self.dtype,
                             name="guide_conv_b")(
            (g1,), train, packed,
            fused_preludes=(_packed_prelude(q1, packed, bsz),))

        splits = (ef // 2, ef // 2)
        if self.channel_attention:
            mx = _norm_mean(y2, p2, packed, dt)
            mg = _norm_mean(g2, q2, packed, dt)
            exc = SELayer(reduction=1, dtype=self.dtype, name="SE_block")(
                None, packed=packed, splits=splits,
                squeezed=jnp.concatenate([mx, mg], axis=-1))
            pre_x = _se_prelude(p2, exc[:, :ef // 2], packed)
            pre_g = _se_prelude(q2, exc[:, ef // 2:], packed)
        else:
            pre_x = _packed_prelude(p2, packed, bsz)
            pre_g = _packed_prelude(q2, packed, bsz)

        y5, p5 = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype,
                             name="comb_conv_a")(
            (y2, g2), train, packed, input_splits=splits,
            fused_preludes=(pre_x, pre_g))
        y6, p6 = _ConvBNRelu(self.in_features, 1, dtype=self.dtype,
                             name="comb_conv_b")(
            (y5,), train, packed,
            fused_preludes=(_packed_prelude(p5, packed, bsz),))

        return Conv(self.out_features, 1, padding=0, use_bias=True,
                    dtype=self.dtype, name="reduce")(
            (y6,), packed=packed,
            fused_preludes=(_packed_prelude(p6, packed, bsz),),
            fused_skip=depth)


class GuideDepth(nn.Module):
    """``GuideDepth.py:9-57``. ``up_features=[64,32,16]`` (default) or
    ``[32,8,4]`` for GuideDepth-S (``loader.py:19``).

    ``packed=True`` executes thin-channel GUB stages in space-to-depth layout
    (2x2 blocks folded into channels): mathematically identical, ~5x faster
    per packed conv on the MXU (PERF.md / scripts/bench_s2d.py). A stage is
    packed when its expanded channel count still fits well in the 128-lane
    vector register (4*expand <= 128) and the guide resolution is even."""

    up_features: Sequence[int] = (64, 32, 16)
    inner_features: Sequence[int] = (64, 32, 16)
    dtype: Optional[Any] = None
    packed: bool = True
    # a stage packs at block=2 while 4*expand stays within this channel
    # budget (128 = one lane register)
    packed_max_channels: int = 128
    # ... and at block=(4,4) while 16*expand fits here (256 = two lane
    # registers). The full-res c16 stage hits exactly 256: c256@H/4
    # eliminates the lane-padding waste AND the relayout copies the c64
    # packed-2 form pays (PERF.md round 2/3). NOTE the rectangular c128
    # folds (2,4)/(4,2) run the isolated conv up to 2.2x faster (half the
    # dense FLOPs; PERF.md round-3 rect-fold sweep) but measure SLOWER end to
    # end (158.7-161.6 vs 169.4 train img/s; 520 vs 556 infer) — the
    # config is bandwidth-bound and only the two-full-register c256 form
    # dodges XLA's conv layout copies, so (4,4) stays the default
    # (PERF.md round 3).
    packed_block4_max_channels: int = 256
    #: explicit per-stage pack blocks, e.g. ((2,4), (4,8), (8,8)) — overrides
    #: the threshold rules above per stage (None entry = keep the rule).
    #: Motivation (round 4): GuideDepth-S's thin stages (inner 32/8/4,
    #: loader.py:19) fold to c128/c128/c64 under the default rules — exactly
    #: the one-register forms that re-pay XLA's conv layout copies; larger
    #: folds reach the copy-free two-register c256 at every stage.
    packed_blocks: Optional[Sequence[Optional[Sequence[int]]]] = None
    #: allow packed stages to run through the fused Pallas conv kernels
    #: when TPUDEPTH_GUB=fused (experimental; measured slower than XLA's
    #: conv pipeline — see gub_fused_enabled)
    fused_stage_kernels: bool = True
    #: rematerialize each GUB stage in the backward pass (jax.checkpoint per
    #: stage): only the stage-boundary tensors are saved for the backward;
    #: every conv/BN/ReLU activation inside a stage is recomputed. This
    #: trades ~2x the (cheap, 8%-of-peak) stage FLOPs for not carrying the
    #: stage activations from forward to backward — a bytes lever on the
    #: HBM-roofline-bound full-res train step and a memory lever for larger
    #: batches (bs32 @480x640 OOMs without it). Measured ablation: PERF.md
    #: round 4.
    remat_stages: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from tpudepth.ops.packed import (
            depth_to_space,
            space_to_depth,
            upsample2x_pack,
        )

        use_fused = self.fused_stage_kernels and gub_fused_enabled()

        up, inner = list(self.up_features), list(self.inner_features)
        y = DualResNetBackbone(features=up[0], dtype=self.dtype,
                               name="feature_extractor")(x, train)

        h, w = x.shape[1:3]
        x_half = resize_nearest(x, (h // 2, w // 2))
        x_quarter = resize_nearest(x, (h // 4, w // 4))

        guides = (x_quarter, x_half, x)
        outs = (up[1], up[2], 1)
        gub_cls = GuidedUpsamplingBlock
        if self.remat_stages:
            # static argnums count self: (guide, depth, train, packed) ->
            # train=3, packed=4 (a hashable block tuple / 0)
            gub_cls = nn.remat(GuidedUpsamplingBlock, static_argnums=(3, 4))
        for i in range(3):
            guide = guides[i]
            gh, gw = guide.shape[1:3]
            blk = None
            if self.packed:
                override = (self.packed_blocks[i]
                            if self.packed_blocks is not None else None)
                if override is not None:
                    by, bx = override
                    if gh % by == 0 and gw % bx == 0:
                        blk = (by, bx)
                elif (16 * inner[i] <= self.packed_block4_max_channels
                        and gh % 4 == 0 and gw % 4 == 0):
                    blk = (4, 4)
                elif (4 * inner[i] <= self.packed_max_channels
                      and gh % 2 == 0 and gw % 2 == 0):
                    blk = (2, 2)
            gub = gub_cls(up[i], inner[i], outs[i],
                          dtype=self.dtype, fused=use_fused,
                          name=f"up_{i + 1}")
            if blk is not None:
                y = upsample2x_pack(y, blk)  # packed at guide resolution
                y = gub(space_to_depth(guide, blk), y, train, blk)
                y = depth_to_space(y, blk)
            else:
                y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2),
                                    align_corners=False)
                y = gub(guide, y, train, 0)
        return y
