"""Model registry: every model of both reference stacks behind one name map
(superset of ``src/GuideDepth/model/loader.py:15-22``; the root stack's models
had no registry — each file exposed a ``PTModel``)."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from tpudepth.models.decoders import (
    MobileV3DenseDepth,
    MobileV3NewCRFDepth,
    MobileV3SAMDepth,
    MobileV3UNet,
    MobileV3UNetInterp,
)
from tpudepth.models.guidedepth import GuideDepth


def build_model(name: str, dtype: Optional[Any] = None,
                use_pallas: Optional[bool] = None, **kwargs) -> nn.Module:
    """``kwargs`` forward to the model class (GuideDepth family only), e.g.
    ``remat_stages=True`` for per-GUB-stage rematerialization or explicit
    ``packed_*`` thresholds."""
    name_l = name.lower()
    if name == "GuideDepth" or name_l == "guidedepth":
        return GuideDepth(dtype=dtype, **kwargs)
    if name == "GuideDepth-S" or name_l in ("guidedepth-s", "guidedepth_s"):
        return GuideDepth(up_features=(32, 8, 4), inner_features=(32, 8, 4),
                          dtype=dtype, **kwargs)
    if name_l in ("sam", "mobilev3_sam", "mobilev3_large_sam"):
        return MobileV3SAMDepth(dtype=dtype, use_pallas=use_pallas)
    if name_l in ("newcrf", "newcrfs", "mobilev3_newcrf", "mobilev3_large_newcrfs"):
        return MobileV3NewCRFDepth(dtype=dtype, use_pallas=use_pallas)
    if name_l in ("densedepth", "mobilev3", "mobilev2", "mobilev3_densedepth"):
        return MobileV3DenseDepth(dtype=dtype)
    if name_l in ("unet", "mobilev3_unet"):
        return MobileV3UNet(dtype=dtype)
    if name_l in ("unet_interp", "mobilev3_unet_interpolado", "unet_interpolado"):
        return MobileV3UNetInterp("large", dtype=dtype)
    if name_l in ("unet_interp_small", "mobilev3_unet_interpolado_small", "unet_interpolado_small"):
        return MobileV3UNetInterp("small", dtype=dtype)
    raise ValueError(f"unknown model {name!r}; available: {MODEL_NAMES}")


MODEL_NAMES = [
    "GuideDepth",
    "GuideDepth-S",
    "sam",
    "newcrf",
    "densedepth",
    "unet",
    "unet_interp",
    "unet_interp_small",
]


def init_model(model, rng, sample, train: bool = False):
    """Jitted model.init — eager init compiles each op separately through the
    remote TPU compile helper (observed 400+s for the SAM model); one jitted
    init compiles in a few seconds."""
    import functools

    import jax

    return jax.jit(functools.partial(model.init, train=train))(rng, sample)
