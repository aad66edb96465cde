"""GuideDepth: DDRNet-23-slim + guided upsampling pyramid (flax, NHWC).

Rebuild of ``src/GuideDepth/model/GuideDepth.py`` and
``src/GuideDepth/model/modules.py``: the backbone's 1/8-res feature is
upsampled x2 three times, each step refined by a Guided Upsampling Block
conditioned on the RGB pyramid (nearest-downsampled halves —
``GuideDepth.py:46-47`` uses default-mode interpolate).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudepth.models.ddrnet import DualResNetBackbone
from tpudepth.models.layers import BatchNorm, Conv, relu
from tpudepth.ops.image import resize_bilinear, resize_nearest

_BN_MOM = 0.1
_BN_EPS = 1e-5


class SELayer(nn.Module):
    """Channel SE with spatial mean squeeze (TensorRT-friendly variant,
    ``modules.py:5-25``); bias-free linears, reduction=1 in GUB."""

    reduction: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class _ConvBNRelu(nn.Module):
    features: int
    kernel: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, self.kernel, padding=(self.kernel - 1) // 2,
                 use_bias=True, dtype=self.dtype, name="conv")(x)
        x = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn")(x, train)
        return relu(x)


class GuidedUpsamplingBlock(nn.Module):
    """GUB (``modules.py:29-100``), guidance_type='full':

    feature branch (conv3-BN-ReLU, conv1-BN-ReLU to expand//2) || guide branch
    (same on RGB) -> concat -> SE(reduction=1) -> comb conv back to
    in_features -> +depth residual -> 1x1 reduce."""

    in_features: int
    expand_features: int
    out_features: int
    kernel_size: int = 3
    channel_attention: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, guide, depth, train: bool = False):
        ef = self.expand_features
        x = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype, name="feature_conv_a")(depth, train)
        x = _ConvBNRelu(ef // 2, 1, dtype=self.dtype, name="feature_conv_b")(x, train)

        y = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype, name="guide_conv_a")(guide, train)
        y = _ConvBNRelu(ef // 2, 1, dtype=self.dtype, name="guide_conv_b")(y, train)

        xy = jnp.concatenate([x, y], axis=-1)
        if self.channel_attention:
            xy = SELayer(reduction=1, dtype=self.dtype, name="SE_block")(xy)

        r = _ConvBNRelu(ef, self.kernel_size, dtype=self.dtype, name="comb_conv_a")(xy, train)
        r = _ConvBNRelu(self.in_features, 1, dtype=self.dtype, name="comb_conv_b")(r, train)

        return Conv(self.out_features, 1, use_bias=True, dtype=self.dtype,
                    name="reduce")(r + depth)


class GuideDepth(nn.Module):
    """``GuideDepth.py:9-57``. ``up_features=[64,32,16]`` (default) or
    ``[32,8,4]`` for GuideDepth-S (``loader.py:19``)."""

    up_features: Sequence[int] = (64, 32, 16)
    inner_features: Sequence[int] = (64, 32, 16)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        up, inner = list(self.up_features), list(self.inner_features)
        y = DualResNetBackbone(features=up[0], dtype=self.dtype,
                               name="feature_extractor")(x, train)

        h, w = x.shape[1:3]
        x_half = resize_nearest(x, (h // 2, w // 2))
        x_quarter = resize_nearest(x, (h // 4, w // 4))

        y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2), align_corners=False)
        y = GuidedUpsamplingBlock(up[0], inner[0], up[1], dtype=self.dtype,
                                  name="up_1")(x_quarter, y, train)
        y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2), align_corners=False)
        y = GuidedUpsamplingBlock(up[1], inner[1], up[2], dtype=self.dtype,
                                  name="up_2")(x_half, y, train)
        y = resize_bilinear(y, (y.shape[1] * 2, y.shape[2] * 2), align_corners=False)
        y = GuidedUpsamplingBlock(up[2], inner[2], 1, dtype=self.dtype,
                                  name="up_3")(x, y, train)
        return y
