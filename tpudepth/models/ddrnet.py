"""DDRNet-23-slim dual-resolution backbone (flax, NHWC).

Rebuild of ``src/GuideDepth/model/DDRNet_23_slim.py`` (itself adopted from
ydhongHIT/DDRNet): stem /4, four residual stages with a parallel high-res
branch and bidirectional fusion (compression3/4, down3/4), DAPPM pyramid
pooling and a segmenthead emitting a ``features``-channel map at 1/8
resolution. BN uses momentum 0.1 / eps 1e-5 (``DDRNet_23_slim.py:16-17``).

Under a data-sharded pjit the BN batch statistics are global (XLA inserts the
cross-replica reduction) — resolving the SyncBatchNorm stub the reference left
commented out (``DDRNet_23_slim.py:15``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudepth.models.layers import BatchNorm, Conv, relu
from tpudepth.ops.image import avg_pool, global_avg_pool, resize_bilinear

_BN_MOM = 0.1
_BN_EPS = 1e-5


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    no_relu: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = Conv(self.planes, 3, self.stride, padding=1, use_bias=False,
                   dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn1")(out, train)
        out = relu(out)
        out = Conv(self.planes, 3, 1, padding=1, use_bias=False,
                   dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn2")(out, train)
        if self.has_downsample:
            residual = Conv(self.planes, 1, self.stride, use_bias=False,
                            dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype,
                                 name="downsample_bn")(residual, train)
        out = out + residual
        return out if self.no_relu else relu(out)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    no_relu: bool = True  # torch Bottleneck default (DDRNet_23_slim.py:77)
    dtype: Optional[Any] = None

    expansion: int = 2

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out = Conv(self.planes, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn1")(out, train)
        out = relu(out)
        out = Conv(self.planes, 3, self.stride, padding=1, use_bias=False,
                   dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn2")(out, train)
        out = relu(out)
        out = Conv(self.planes * self.expansion, 1, use_bias=False,
                   dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn3")(out, train)
        if self.has_downsample:
            residual = Conv(self.planes * self.expansion, 1, self.stride,
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype,
                                 name="downsample_bn")(residual, train)
        out = out + residual
        return out if self.no_relu else relu(out)


class _Stage(nn.Module):
    """_make_layer equivalent (``DDRNet_23_slim.py:291-309``): first block may
    downsample; the LAST block in a multi-block stage has no_relu=True."""

    planes: int
    blocks: int
    stride: int = 1
    in_planes: int = 0
    bottleneck: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        cls = Bottleneck if self.bottleneck else BasicBlock
        expansion = 2 if self.bottleneck else 1
        need_ds = self.stride != 1 or self.in_planes != self.planes * expansion
        x = cls(self.planes, self.stride, has_downsample=need_ds,
                dtype=self.dtype, name="block0")(x, train)
        for i in range(1, self.blocks):
            x = cls(self.planes, 1, has_downsample=False,
                    no_relu=(i == self.blocks - 1),
                    dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, self.kernel, self.stride,
                 padding=(self.kernel - 1) // 2, use_bias=False,
                 dtype=self.dtype, name="conv")(x)
        return BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn")(x, train)


class _BNReluConv(nn.Module):
    """BN -> ReLU -> Conv, the DAPPM branch unit (``DDRNet_23_slim.py:138-142``)."""

    features: int
    kernel: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn")(x, train)
        x = relu(x)
        return Conv(self.features, self.kernel, padding=(self.kernel - 1) // 2,
                    use_bias=False, dtype=self.dtype, name="conv")(x)


class DAPPM(nn.Module):
    """Deep Aggregation Pyramid Pooling (``DDRNet_23_slim.py:115-195``)."""

    branch_planes: int
    out_planes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[1:3]
        size = (h, w)

        def up(z):
            return resize_bilinear(z, size, align_corners=False)

        x0 = _BNReluConv(self.branch_planes, dtype=self.dtype, name="scale0")(x, train)
        s1 = _BNReluConv(self.branch_planes, dtype=self.dtype, name="scale1")(
            avg_pool(x, 5, 2, 2), train)
        x1 = _BNReluConv(self.branch_planes, 3, dtype=self.dtype, name="process1")(
            up(s1) + x0, train)
        s2 = _BNReluConv(self.branch_planes, dtype=self.dtype, name="scale2")(
            avg_pool(x, 9, 4, 4), train)
        x2 = _BNReluConv(self.branch_planes, 3, dtype=self.dtype, name="process2")(
            up(s2) + x1, train)
        s3 = _BNReluConv(self.branch_planes, dtype=self.dtype, name="scale3")(
            avg_pool(x, 17, 8, 8), train)
        x3 = _BNReluConv(self.branch_planes, 3, dtype=self.dtype, name="process3")(
            up(s3) + x2, train)
        s4 = _BNReluConv(self.branch_planes, dtype=self.dtype, name="scale4")(
            global_avg_pool(x, keepdims=True), train)
        x4 = _BNReluConv(self.branch_planes, 3, dtype=self.dtype, name="process4")(
            up(s4) + x3, train)

        cat = jnp.concatenate([x0, x1, x2, x3, x4], axis=-1)
        out = _BNReluConv(self.out_planes, dtype=self.dtype, name="compression")(cat, train)
        shortcut = _BNReluConv(self.out_planes, dtype=self.dtype, name="shortcut")(x, train)
        return out + shortcut


class SegmentHead(nn.Module):
    """BN-ReLU-conv3 -> BN-ReLU-conv1 head (``DDRNet_23_slim.py:198-219``)."""

    inter_planes: int
    out_planes: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn1")(x, train)
        x = Conv(self.inter_planes, 3, padding=1, use_bias=False,
                 dtype=self.dtype, name="conv1")(relu(x))
        x = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="bn2")(x, train)
        return Conv(self.out_planes, 1, use_bias=True,
                    dtype=self.dtype, name="conv2")(relu(x))


class DualResNetBackbone(nn.Module):
    """DDRNet-23-slim: planes=32, layers [2,2,2,2], spp 128, head 64
    (``DDRNet_23_slim.py:357-365``). Returns a ``features``-channel map at
    1/8 input resolution."""

    features: int = 64
    planes: int = 32
    spp_planes: int = 128
    head_planes: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.planes
        hp = p * 2  # highres planes
        out_h, out_w = x.shape[1] // 8, x.shape[2] // 8
        size = (out_h, out_w)

        # stem: two stride-2 conv-bn-relu (DDRNet_23_slim.py:229-236)
        h = Conv(p, 3, 2, padding=1, use_bias=True, dtype=self.dtype, name="stem_conv1")(x)
        h = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="stem_bn1")(h, train)
        h = relu(h)
        h = Conv(p, 3, 2, padding=1, use_bias=True, dtype=self.dtype, name="stem_conv2")(h)
        h = BatchNorm(_BN_MOM, _BN_EPS, dtype=self.dtype, name="stem_bn2")(h, train)
        h = relu(h)

        l1 = _Stage(p, 2, in_planes=p, dtype=self.dtype, name="layer1")(h, train)
        l2 = _Stage(p * 2, 2, stride=2, in_planes=p, dtype=self.dtype, name="layer2")(
            relu(l1), train)
        # The context branch (H/16 and deeper, incl. DAPPM's pyramid) runs
        # with spatial sharding dropped: tiny shards are a perf loss AND the
        # SPMD partitioner miscompiles fused backward passes at one row per
        # device (core/mesh.py:despatialize). No-op off-mesh.
        from tpudepth.core.mesh import despatialize

        l3 = _Stage(p * 4, 2, stride=2, in_planes=p * 2, dtype=self.dtype, name="layer3")(
            relu(l2), train)
        l3 = despatialize(l3)
        x_ = _Stage(hp, 2, in_planes=p * 2, dtype=self.dtype, name="layer3_")(
            relu(l2), train)

        xm = l3 + despatialize(
            _ConvBN(p * 4, 3, 2, dtype=self.dtype, name="down3")(relu(x_), train))
        x_ = x_ + resize_bilinear(
            _ConvBN(hp, dtype=self.dtype, name="compression3")(relu(l3), train),
            size, align_corners=False)

        l4 = _Stage(p * 8, 2, stride=2, in_planes=p * 4, dtype=self.dtype, name="layer4")(
            relu(xm), train)
        l4 = despatialize(l4)
        x_ = _Stage(hp, 2, in_planes=hp, dtype=self.dtype, name="layer4_")(relu(x_), train)

        # down4: two stride-2 convs with a relu between (DDRNet_23_slim.py:259-265)
        d4 = _ConvBN(p * 4, 3, 2, dtype=self.dtype, name="down4_a")(relu(x_), train)
        d4 = _ConvBN(p * 8, 3, 2, dtype=self.dtype, name="down4_b")(relu(d4), train)
        xm = l4 + despatialize(d4)
        x_ = x_ + resize_bilinear(
            _ConvBN(hp, dtype=self.dtype, name="compression4")(relu(l4), train),
            size, align_corners=False)

        x_ = _Stage(hp, 1, in_planes=hp, bottleneck=True, dtype=self.dtype,
                    name="layer5_")(relu(x_), train)

        l5 = despatialize(
            _Stage(p * 8, 1, stride=2, in_planes=p * 8, bottleneck=True,
                   dtype=self.dtype, name="layer5")(relu(xm), train))
        spp = DAPPM(self.spp_planes, p * 4, dtype=self.dtype, name="spp")(l5, train)
        xm = resize_bilinear(despatialize(spp), size, align_corners=False)

        return SegmentHead(self.head_planes, self.features, dtype=self.dtype,
                           name="final_layer")(xm + x_, train)
