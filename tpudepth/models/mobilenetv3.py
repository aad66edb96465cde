"""MobileNetV3 Large/Small feature encoders (flax, NHWC).

Re-implemented from the MobileNetV3 paper spec with torchvision's exact
channel/SE conventions so that torchvision ``state_dict``s convert 1:1 (the
reference builds its encoders from ``models.mobilenet_v3_large(pretrained=True)``
and taps every intermediate feature — ``src/model_mobileV3_large_SAM.py:161-182``,
``src/models/model_mobileV3_Unet_interpolado_small.py:161``).

``__call__`` returns ``[x] + [out of every features-module]`` — 18 entries for
Large, 14 for Small — matching the reference's feature-collection loop
(``src/model_mobileV3_large_SAM.py:178-182``) so decoder tap indices carry over
unchanged. The torch->flax weight converter lives in
:mod:`tpudepth.models.torch_import`.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudepth.models.layers import (
    BatchNorm,
    Conv,
    ConvBNAct,
    SqueezeExcitation,
    hardswish,
    make_divisible,
    relu,
)

# (kernel, exp_channels, out_channels, use_se, activation, stride)
# torchvision mobilenet_v3_large inverted-residual table.
LARGE_SPEC = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
]
LARGE_LAST = 960

SMALL_SPEC = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hardswish", 2),
    (5, 240, 40, True, "hardswish", 1),
    (5, 240, 40, True, "hardswish", 1),
    (5, 120, 48, True, "hardswish", 1),
    (5, 144, 48, True, "hardswish", 1),
    (5, 288, 96, True, "hardswish", 2),
    (5, 576, 96, True, "hardswish", 1),
    (5, 576, 96, True, "hardswish", 1),
]
SMALL_LAST = 576

_BN_EPS = 1e-3  # torchvision MobileNetV3 BN eps
_BN_MOM = 0.01  # torch momentum


class InvertedResidual(nn.Module):
    kernel: int
    exp_channels: int
    out_channels: int
    use_se: bool
    act: str
    stride: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        use_residual = self.stride == 1 and in_ch == self.out_channels
        h = x
        # expand (skipped when exp == in, first block)
        if self.exp_channels != in_ch:
            h = ConvBNAct(
                self.exp_channels, 1, 1, act=self.act,
                bn_eps=_BN_EPS, bn_momentum=_BN_MOM, dtype=self.dtype, name="expand",
            )(h, train)
        # depthwise
        h = ConvBNAct(
            self.exp_channels, self.kernel, self.stride, groups=self.exp_channels,
            act=self.act, bn_eps=_BN_EPS, bn_momentum=_BN_MOM, dtype=self.dtype,
            name="depthwise",
        )(h, train)
        if self.use_se:
            squeeze = make_divisible(self.exp_channels // 4, 8)
            h = SqueezeExcitation(squeeze, dtype=self.dtype, name="se")(h)
        # project (linear)
        h = ConvBNAct(
            self.out_channels, 1, 1, act=None,
            bn_eps=_BN_EPS, bn_momentum=_BN_MOM, dtype=self.dtype, name="project",
        )(h, train)
        if use_residual:
            h = h + x
        return h


class MobileNetV3Features(nn.Module):
    """Returns the input plus every stage output (reference feature list)."""

    arch: str = "large"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        spec = LARGE_SPEC if self.arch == "large" else SMALL_SPEC
        last = LARGE_LAST if self.arch == "large" else SMALL_LAST
        feats = [x]
        h = ConvBNAct(
            16, 3, 2, act="hardswish", bn_eps=_BN_EPS, bn_momentum=_BN_MOM,
            dtype=self.dtype, name="stem",
        )(x, train)
        feats.append(h)
        for i, (k, exp, out, se, act, s) in enumerate(spec):
            h = InvertedResidual(
                k, exp, out, se, act, s, dtype=self.dtype, name=f"block{i + 1}"
            )(h, train)
            feats.append(h)
        h = ConvBNAct(
            last, 1, 1, act="hardswish", bn_eps=_BN_EPS, bn_momentum=_BN_MOM,
            dtype=self.dtype, name="head",
        )(h, train)
        feats.append(h)
        return feats
