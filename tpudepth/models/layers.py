"""Shared flax building blocks (NHWC, f32 params, bf16-friendly compute).

Torch-semantic notes:
- ``BatchNorm`` momentum: torch ``momentum=m`` keeps ``(1-m)`` of the running
  stat, flax keeps ``momentum`` — so flax momentum = 1 - torch momentum.
- torchvision MobileNetV3 BN uses eps=1e-3, momentum=0.01; DDRNet uses
  eps=1e-5, momentum=0.1 (``src/GuideDepth/model/DDRNet_23_slim.py:17``).
- ``hardswish`` / ``hardsigmoid`` follow torch: x*relu6(x+3)/6, relu6(x+3)/6.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def hardswish(x: jax.Array) -> jax.Array:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hardsigmoid(x: jax.Array) -> jax.Array:
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def relu(x: jax.Array) -> jax.Array:
    return jax.nn.relu(x)


def leaky_relu_02(x: jax.Array) -> jax.Array:
    """LeakyReLU(0.2) used by the DenseDepth/U-Net ConvBlocks
    (``src/models/model_mobileV3.py:13-15``)."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def gelu(x: jax.Array) -> jax.Array:
    # torch nn.GELU default is the exact (erf) formulation.
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "relu": relu,
    "hardswish": hardswish,
    "leaky_relu": leaky_relu_02,
    "gelu": gelu,
    None: lambda x: x,
}


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding used by the MobileNetV3 paper / torchvision."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _PackedConvInner(nn.Module):
    """Param-compatible stand-in for ``nn.Conv`` executing in packed
    (space-to-depth) layout — see :mod:`tpudepth.ops.packed`. Declares the
    SAME 'kernel'/'bias' params (unpacked shapes) so checkpoints, converters
    and golden tests are unaffected; only the execution layout changes."""

    features: int
    kernel_size: int
    block: Union[int, Tuple[int, int]]
    use_bias: bool
    dtype: Optional[Dtype] = None
    #: When the input is a PLAIN concat of packed tensors with these original
    #: channel counts (instead of a packed_concat), reorder the packed
    #: kernel's input channels to match — the big activation never gets
    #: reshuffled (see ops/packed.concat_input_perm).
    input_splits: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, xp):
        from tpudepth.ops.packed import (
            block_total, concat_input_perm, pack_conv_kernel, tile_channel,
        )

        b2 = block_total(self.block)
        cin = xp.shape[-1] // b2
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, cin, self.features),
            jnp.float32,
        )
        dt = self.dtype or xp.dtype
        wp, (pad_y, pad_x) = pack_conv_kernel(kernel, self.block)
        if self.input_splits is not None:
            q = concat_input_perm(tuple(self.input_splits), self.block)
            # out = sum_i packed[i] * wp[i] = sum_m plain[m] * wp[q^-1[m]]
            wp = wp[:, :, np.argsort(q), :]
        y = jax.lax.conv_general_dilated(
            xp.astype(dt), wp.astype(dt), (1, 1),
            [(pad_y, pad_y), (pad_x, pad_x)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + tile_channel(bias, self.block).astype(dt)
        return y


class Conv(nn.Module):
    """2D conv wrapper: NHWC, torch-style symmetric padding.

    ``packed``: execute in space-to-depth layout (input/output are packed
    tensors with ``by*bx`` x channels; int or ``(by, bx)`` block spec) —
    requires stride 1, groups 1 and SAME-style padding. Parameters are
    identical to the unpacked form.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Union[int, str] = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, packed=0, input_splits=None):
        if packed:
            assert self.stride == 1 and self.groups == 1
            assert self.padding == (self.kernel_size - 1) // 2
            return _PackedConvInner(
                self.features, self.kernel_size, packed, self.use_bias,
                dtype=self.dtype,
                input_splits=tuple(input_splits) if input_splits else None,
                name="Conv_0",
            )(x)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class ConvTranspose(nn.Module):
    """torch ``nn.ConvTranspose2d(k=2, s=2)`` equivalent (U-Net ``Up``,
    ``src/models/model_mobileV3_Unet.py:58``)."""

    features: int
    kernel_size: int = 2
    stride: int = 2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class _PackedBatchNormInner(nn.Module):
    """Param-compatible stand-in for ``nn.BatchNorm`` on packed tensors:
    batch statistics are computed per ORIGINAL channel (grouping the
    ``block**2`` packed copies), exactly matching the unpacked stats; running
    stats/scale/bias keep their unpacked [C] shapes and names."""

    block: Union[int, Tuple[int, int]]
    momentum: float  # flax-style: fraction of the running stat kept
    eps: float
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, xp, train: bool):
        from tpudepth.ops.packed import block_total

        b2 = block_total(self.block)
        c = xp.shape[-1] // b2
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,))
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            xf = xp.astype(jnp.float32)
            xg = xf.reshape(*xf.shape[:-1], b2, c)
            mean = jnp.mean(xg, axis=(0, 1, 2, 3))
            mean2 = jnp.mean(xg * xg, axis=(0, 1, 2, 3))
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        from tpudepth.ops.packed import tile_channel

        # same op order as flax nn.BatchNorm._normalize (promote to dtype,
        # y = (x - mean) * (rsqrt(var + eps) * scale) + bias).
        # NOTE (PERF.md round 2): reformulating these channel stats as MXU
        # dots was tried and REGRESSED (134.5 -> 119.7 img/s) — XLA keeps
        # the layout copies and the extra dot passes just add HBM traffic.
        dt = self.dtype or xp.dtype
        y = xp.astype(dt) - tile_channel(mean.astype(dt), self.block)
        mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(self.eps, dt))
        mul = mul * scale.astype(dt)
        return y * tile_channel(mul, self.block) + tile_channel(
            bias.astype(dt), self.block)


class BatchNorm(nn.Module):
    """BatchNorm with torch-style momentum semantics.

    Cross-replica behaviour: under pjit with a batch sharded on the 'data'
    mesh axis, the batch statistics are global means — XLA inserts the
    all-reduce — giving SyncBatchNorm semantics for free (the reference left
    this unsolved: ``src/GuideDepth/model/DDRNet_23_slim.py:15``).

    ``packed``: operate on a space-to-depth tensor with per-original-channel
    stats (grouped over the packed copies); param tree unchanged.
    """

    torch_momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool, packed=0):
        if packed:
            return _PackedBatchNormInner(
                packed, 1.0 - self.torch_momentum, self.eps, dtype=self.dtype,
                name="BatchNorm_0",
            )(x, train)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.torch_momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class ConvBNAct(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[str] = "relu"
    bn_eps: float = 1e-5
    bn_momentum: float = 0.1
    use_bias: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            padding=(self.kernel_size - 1) // 2,
            groups=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(self.bn_momentum, self.bn_eps, dtype=self.dtype, name="bn")(x, train)
        return ACTIVATIONS[self.act](x)


class SqueezeExcitation(nn.Module):
    """torchvision MobileNetV3 SE: 1x1 convs, relu -> hardsigmoid scale."""

    squeeze_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = Conv(self.squeeze_channels, 1, use_bias=True, dtype=self.dtype, name="fc1")(s)
        s = relu(s)
        s = Conv(x.shape[-1], 1, use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * hardsigmoid(s)


class Mlp(nn.Module):
    """Transformer FFN (``src/SAM.py:9-27``): Linear -> GELU -> Linear."""

    hidden_features: int
    out_features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)
        return x


class LayerNorm(nn.Module):
    """torch-eps LayerNorm over the channel dim."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)(x)
