"""Torch MobileNetV3 stand-in for torchvision (absent in this image).

The reference attention models build their encoder from
``torchvision.models.mobilenet_v3_large(pretrained=True)``
(``src/model_mobileV3_large_SAM.py:165``) and only ever touch
``.features`` and ``.parameters()`` (``:168-182``). This module implements
that subset with torchvision's EXACT module structure and state_dict naming
(``features.0.0 / features.{i}.block.{j}.0 / .fc1 / .fc2`` — the layout
``tpudepth.models.torch_import.convert_mobilenetv3`` maps), so the full
reference ``PTModel`` can be instantiated, trained and converted on this
machine. ``pretrained`` is accepted and ignored (no network access; parity
runs compare same-random-init models on both sides).

``install()`` registers a fake ``torchvision.models`` in ``sys.modules``
(plus the timm shim the reference attention layers import).
"""

from __future__ import annotations

import sys
import types


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _build_models_module():
    import torch
    import torch.nn as nn

    from tpudepth.models.mobilenetv3 import (
        LARGE_LAST,
        LARGE_SPEC,
        SMALL_LAST,
        SMALL_SPEC,
    )

    def _act(name):
        if name == "relu":
            return nn.ReLU(inplace=True)
        if name == "hardswish":
            return nn.Hardswish(inplace=True)
        raise ValueError(name)

    class Conv2dNormActivation(nn.Sequential):
        """torchvision.ops.Conv2dNormActivation subset: conv(bias=False) ->
        BN(eps=1e-3, momentum=0.01) -> activation."""

        def __init__(self, cin, cout, kernel=3, stride=1, groups=1,
                     act="hardswish"):
            layers = [
                nn.Conv2d(cin, cout, kernel, stride, (kernel - 1) // 2,
                          groups=groups, bias=False),
                nn.BatchNorm2d(cout, eps=0.001, momentum=0.01),
            ]
            if act is not None:
                layers.append(_act(act))
            super().__init__(*layers)

    class SqueezeExcitation(nn.Module):
        """torchvision.ops.SqueezeExcitation: avgpool -> fc1 -> ReLU -> fc2
        -> Hardsigmoid scale."""

        def __init__(self, input_channels, squeeze_channels):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(input_channels, squeeze_channels, 1)
            self.fc2 = nn.Conv2d(squeeze_channels, input_channels, 1)
            self.activation = nn.ReLU()
            self.scale_activation = nn.Hardsigmoid()

        def forward(self, x):
            s = self.avgpool(x)
            s = self.activation(self.fc1(s))
            s = self.scale_activation(self.fc2(s))
            return x * s

    class InvertedResidual(nn.Module):
        def __init__(self, cin, kernel, exp, cout, use_se, act, stride):
            super().__init__()
            self.use_res_connect = stride == 1 and cin == cout
            layers = []
            if exp != cin:
                layers.append(Conv2dNormActivation(cin, exp, 1, 1, act=act))
            layers.append(
                Conv2dNormActivation(exp, exp, kernel, stride, groups=exp,
                                     act=act))
            if use_se:
                layers.append(
                    SqueezeExcitation(exp, _make_divisible(exp // 4)))
            layers.append(Conv2dNormActivation(exp, cout, 1, 1, act=None))
            self.block = nn.Sequential(*layers)

        def forward(self, x):
            result = self.block(x)
            if self.use_res_connect:
                result = result + x
            return result

    class MobileNetV3(nn.Module):
        def __init__(self, spec, last):
            super().__init__()
            feats = [Conv2dNormActivation(3, 16, 3, 2, act="hardswish")]
            cin = 16
            for (k, exp, out, se, act, s) in spec:
                feats.append(InvertedResidual(cin, k, exp, out, se, act, s))
                cin = out
            feats.append(Conv2dNormActivation(cin, last, 1, 1,
                                              act="hardswish"))
            self.features = nn.Sequential(*feats)

    models = types.ModuleType("torchvision.models")

    def mobilenet_v3_large(pretrained=False, **kw):
        return MobileNetV3(LARGE_SPEC, LARGE_LAST)

    def mobilenet_v3_small(pretrained=False, **kw):
        return MobileNetV3(SMALL_SPEC, SMALL_LAST)

    models.mobilenet_v3_large = mobilenet_v3_large
    models.mobilenet_v3_small = mobilenet_v3_small
    return models


def install_timm_stub():
    """timm is only needed for DropPath / to_2tuple / trunc_normal_."""
    import torch
    import torch.nn as nn

    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def install():
    """Register torchvision + timm stubs; returns the models module."""
    install_timm_stub()
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = _build_models_module()
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    return sys.modules["torchvision"].models
