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


# alias (lowercased) -> canonical registry name. The upstream aliases mirror
# the root stack's module filenames (model_mobileV3_large_SAM.py etc.); every
# behavior switch keyed on a model name (frozen encoder, loss recipe, remat)
# MUST go through canonical_model_name so aliases cannot dodge it.
_ALIASES = {
    "guidedepth": "GuideDepth",
    "guidedepth-s": "GuideDepth-S",
    "guidedepth_s": "GuideDepth-S",
    "sam": "sam",
    "mobilev3_sam": "sam",
    "mobilev3_large_sam": "sam",
    "newcrf": "newcrf",
    "newcrfs": "newcrf",
    "mobilev3_newcrf": "newcrf",
    "mobilev3_large_newcrfs": "newcrf",
    "densedepth": "densedepth",
    "mobilev3": "densedepth",
    "mobilev2": "densedepth",
    "mobilev3_densedepth": "densedepth",
    "unet": "unet",
    "mobilev3_unet": "unet",
    "unet_interp": "unet_interp",
    "mobilev3_unet_interpolado": "unet_interp",
    "unet_interpolado": "unet_interp",
    "unet_interp_small": "unet_interp_small",
    "mobilev3_unet_interpolado_small": "unet_interp_small",
    "unet_interpolado_small": "unet_interp_small",
}


def canonical_model_name(name: str, strict: bool = True) -> str:
    """Map any accepted alias to its canonical registry name.

    ``strict=False`` passes unknown names through (lowercased) instead of
    raising — for Trainer instances constructed with an explicit custom
    ``model=`` object whose config name is not registered."""
    canon = _ALIASES.get(str(name).lower())
    if canon is None:
        if strict:
            raise ValueError(f"unknown model {name!r}; available: {MODEL_NAMES}")
        return str(name).lower()
    return canon


def build_model(name: str, dtype: Optional[Any] = None,
                use_pallas: Optional[bool] = None, **kwargs) -> nn.Module:
    """``kwargs`` forward to the model class (GuideDepth family only), e.g.
    ``remat_stages=True`` for per-GUB-stage rematerialization or explicit
    ``packed_*`` thresholds."""
    canon = canonical_model_name(name)
    if canon == "GuideDepth":
        return GuideDepth(dtype=dtype, **kwargs)
    if canon == "GuideDepth-S":
        return GuideDepth(up_features=(32, 8, 4), inner_features=(32, 8, 4),
                          dtype=dtype, **kwargs)
    if canon == "sam":
        return MobileV3SAMDepth(dtype=dtype, use_pallas=use_pallas)
    if canon == "newcrf":
        return MobileV3NewCRFDepth(dtype=dtype, use_pallas=use_pallas)
    if canon == "densedepth":
        return MobileV3DenseDepth(dtype=dtype)
    if canon == "unet":
        return MobileV3UNet(dtype=dtype)
    if canon == "unet_interp":
        return MobileV3UNetInterp("large", dtype=dtype)
    assert canon == "unet_interp_small"
    return MobileV3UNetInterp("small", dtype=dtype)


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
