"""MobileNetV3 encoder-decoder depth models (flax, NHWC).

The five root-stack model variants, rebuilt TPU-first on top of
:class:`tpudepth.models.mobilenetv3.MobileNetV3Features`:

- ``MobileV3SAMDepth``     — 4 SAM stages + PixelShuffle ups
  (``src/model_mobileV3_large_SAM.py``; backbone frozen there, `:168-169`)
- ``MobileV3NewCRFDepth``  — same topology with NewCRF stages
  (``src/model_mobileV3_large_newCRFs.py``; backbone trainable)
- ``MobileV3DenseDepth``   — DenseDepth-style interpolate/concat decoder
  (``src/models/model_mobileV3.py`` and the identical-in-effect
  ``src/models/model_mobileV2.py``)
- ``MobileV3UNet``         — transposed-conv U-Net with MaxPool bridge
  (``src/models/model_mobileV3_Unet.py``)
- ``MobileV3UNetInterp``   — interpolated U-Net, large / small encoders
  (``src/models/model_mobileV3_Unet_interpolado{,_small}.py``)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudepth.models.layers import Conv, ConvTranspose, leaky_relu_02
from tpudepth.models.mobilenetv3 import MobileNetV3Features
from tpudepth.models.newcrf import NewCRF
from tpudepth.models.sam import SAM
from tpudepth.ops.image import max_pool, pixel_shuffle, resize_bilinear, upsample


class ConvBlock(nn.Module):
    """3x3 conv + LeakyReLU(0.2), twice (``src/models/model_mobileV3.py:6-21``)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        x = leaky_relu_02(x)
        x = Conv(self.features, 3, padding=1, dtype=self.dtype, name="conv2")(x)
        return leaky_relu_02(x)


class UpSampleConcat(nn.Module):
    """Bilinear(align_corners=True)-to-skip-size, concat, ConvBlock
    (``src/models/model_mobileV3.py:6-21`` UpSample / interpolated-U-Net Up)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip):
        x = resize_bilinear(x, skip.shape[1:3], align_corners=True)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(self.features, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# Attention decoders (SAM / NewCRF)
# ---------------------------------------------------------------------------

_ATTN_HEADS = (4, 8, 16, 32)
_ATTN_EMBED = (128, 256, 512, 1024)  # crf_dims (src/model_mobileV3_large_SAM.py:69)
_ATTN_VDIM = (64, 128, 256, 512)  # v_dims (:70)
_ATTN_INCH = (24, 40, 112, 160, 960)  # encoder taps (:71)


class _AttentionDecoder(nn.Module):
    """Shared topology of the SAM / NewCRF decoders
    (``src/model_mobileV3_large_SAM.py:60-124``):

    bridge 1x1 960->512 on feats[17]; 4 attention stages on taps
    feats[16]/[13]/[7]/[4] with PixelShuffle(2) between; 3x3 conv -> sigmoid
    head; final x4 bilinear upsample.
    """

    variant: str  # 'sam' | 'newcrf'
    window_size: int = 7
    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]) -> jax.Array:
        stage_cls = SAM if self.variant == "sam" else NewCRF
        bridge = Conv(_ATTN_VDIM[3], 1, dtype=self.dtype, name="conv0")(feats[17])

        def stage(i, e, q):
            return stage_cls(
                input_dim=_ATTN_INCH[i],
                embed_dim=_ATTN_EMBED[i],
                v_dim=_ATTN_VDIM[i],
                num_heads=_ATTN_HEADS[i],
                window_size=self.window_size,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"crf{i}",
            )(e, q)

        e3 = stage(3, feats[16], bridge)          # 1024 @ H/32
        e2 = stage(2, feats[13], pixel_shuffle(e3, 2))  # 512 @ H/16
        e1 = stage(1, feats[7], pixel_shuffle(e2, 2))   # 256 @ H/8
        e0 = stage(0, feats[4], pixel_shuffle(e1, 2))   # 128 @ H/4

        depth = Conv(1, 3, padding=1, dtype=self.dtype, name="conv1")(e0)
        depth = jax.nn.sigmoid(depth.astype(jnp.float32))
        return upsample(depth, 4, align_corners=False)


class MobileV3SAMDepth(nn.Module):
    """``PTModel`` of ``src/model_mobileV3_large_SAM.py`` (frozen backbone in
    the reference; freezing is handled by the trainer's optimizer partition)."""

    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV3Features("large", dtype=self.dtype, name="encoder")(x, train)
        return _AttentionDecoder(
            "sam", dtype=self.dtype, use_pallas=self.use_pallas, name="decoder"
        )(feats)


class MobileV3NewCRFDepth(nn.Module):
    """``PTModel`` of ``src/model_mobileV3_large_newCRFs.py``."""

    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV3Features("large", dtype=self.dtype, name="encoder")(x, train)
        return _AttentionDecoder(
            "newcrf", dtype=self.dtype, use_pallas=self.use_pallas, name="decoder"
        )(feats)


# ---------------------------------------------------------------------------
# DenseDepth-style decoder
# ---------------------------------------------------------------------------


class MobileV3DenseDepth(nn.Module):
    """DenseDepth-style decoder (``src/models/model_mobileV3.py:24-70``):
    1x1 bridge (960, with torch's padding=1 size-growth quirk NOT replicated —
    see note), 6 UpSample stages over taps feats[16,13,10,7,4,2], 3x3 head.
    Output at half input resolution.

    Note: the reference's bridge ``nn.Conv2d(960, 960, 1, padding=1)``
    (``src/models/model_mobileV3.py:30``) pads a 1x1 conv, growing 15x20 to
    17x22; the next UpSample immediately bilinear-resizes to the skip's 15x20,
    so the extra ring only contributes zero-padding artifacts. We keep the
    1x1 bridge without the padding (documented divergence).
    """

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV3Features("large", dtype=self.dtype, name="encoder")(x, train)
        f = 960
        h = Conv(f, 1, dtype=self.dtype, name="conv2")(feats[17])
        h = UpSampleConcat(f // 2, dtype=self.dtype, name="up0")(h, feats[16])
        h = UpSampleConcat(f // 2, dtype=self.dtype, name="up1")(h, feats[13])
        h = UpSampleConcat(f // 4, dtype=self.dtype, name="up2")(h, feats[10])
        h = UpSampleConcat(f // 8, dtype=self.dtype, name="up3")(h, feats[7])
        h = UpSampleConcat(f // 8, dtype=self.dtype, name="up4")(h, feats[4])
        h = UpSampleConcat(f // 16, dtype=self.dtype, name="up5")(h, feats[2])
        return Conv(1, 3, padding=1, dtype=self.dtype, name="conv3")(h)


# ---------------------------------------------------------------------------
# U-Net variants
# ---------------------------------------------------------------------------


class _UpTransposed(nn.Module):
    """ConvTranspose(k2,s2) up + concat + ConvBlock
    (``src/models/model_mobileV3_Unet.py:52-67``)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, skip):
        x = ConvTranspose(self.features, 2, 2, dtype=self.dtype, name="up")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlock(self.features, dtype=self.dtype, name="convBlock")(x)


class MobileV3UNet(nn.Module):
    """Transposed-conv U-Net (``src/models/model_mobileV3_Unet.py``):
    MaxPool(2)+1x1 bridge 960->1280 at H/64, then 5 transposed-conv ups over
    taps feats[17,13,7,4,2], 3x3 head at half resolution... the reference's
    final up reaches feats[2] (240x320 for a 480x640 input)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV3Features("large", dtype=self.dtype, name="encoder")(x, train)
        h = max_pool(feats[17], 2, 2)
        h = Conv(1280, 1, dtype=self.dtype, name="bridge_conv")(h)
        h = _UpTransposed(960, dtype=self.dtype, name="upa")(h, feats[17])
        h = _UpTransposed(112, dtype=self.dtype, name="up0")(h, feats[13])
        h = _UpTransposed(40, dtype=self.dtype, name="up1")(h, feats[7])
        h = _UpTransposed(24, dtype=self.dtype, name="up2")(h, feats[4])
        h = _UpTransposed(16, dtype=self.dtype, name="up3")(h, feats[2])
        return Conv(1, 3, padding=1, dtype=self.dtype, name="conv3")(h)


class MobileV3UNetInterp(nn.Module):
    """Interpolated U-Net (``src/models/model_mobileV3_Unet_interpolado.py``
    large, ``..._small.py`` small).

    Large: 1x1 bridge 960->960, 7 interpolate/concat Up stages over taps
    feats[17,16,13,11,7,4,2], head 8->1. Small (mobilenet_v3_small): bridge
    576, taps feats[13,13,10,8,5,3,1] per the small model's layout
    (``..._small.py:99-128``)."""

    arch: str = "large"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = MobileNetV3Features(self.arch, dtype=self.dtype, name="encoder")(x, train)
        if self.arch == "large":
            bridge_ch = 960
            taps = [17, 16, 13, 11, 7, 4, 2]
            chans = [160, 112, 80, 40, 24, 16, 8]
        else:
            # small taps per src/models/model_mobileV3_Unet_interpolado_small.py:127-128
            bridge_ch = 576
            taps = [13, 10, 8, 5, 3, 1]
            chans = [96, 48, 40, 24, 16, 8]
        h = Conv(bridge_ch, 1, dtype=self.dtype, name="bridge")(feats[taps[0]])
        for i, (tap, ch) in enumerate(zip(taps, chans)):
            h = UpSampleConcat(ch, dtype=self.dtype, name=f"up{i}")(h, feats[tap])
        return Conv(1, 3, padding=1, dtype=self.dtype, name="conv3")(h)
