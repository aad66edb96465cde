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


class Conv(nn.Module):
    """2D conv wrapper: NHWC, torch-style symmetric padding."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Union[int, str] = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
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


class BatchNorm(nn.Module):
    """BatchNorm with torch-style momentum semantics.

    Cross-replica behaviour: under pjit with a batch sharded on the 'data'
    mesh axis, the batch statistics are global means — XLA inserts the
    all-reduce — giving SyncBatchNorm semantics for free (the reference left
    this unsolved: ``src/GuideDepth/model/DDRNet_23_slim.py:15``).
    """

    torch_momentum: float = 0.1
    eps: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
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
