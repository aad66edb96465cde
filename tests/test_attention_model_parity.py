"""Golden parity of the SAM / NewCRF attention stages vs the mounted torch
reference. timm (absent here) is only needed for DropPath / to_2tuple /
trunc_normal_, so a minimal stub makes the reference modules importable."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def reference_modules():
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules:
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

    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")
    import SAM as ref_sam
    import newcrf_layers as ref_newcrf

    return ref_sam, ref_newcrf


def _convert_sam_stage(tmodule):
    """Reference SAM module state_dict -> tpudepth SAM stage variables."""
    from tpudepth.models.torch_import import _Builder, _sam_stage, state_dict_to_numpy

    sd = state_dict_to_numpy(tmodule.state_dict())
    b = _Builder(sd)
    _sam_stage(b, "stage", "", has_proj_e=True, has_proj_q=True)
    # strip the leading 'stage/' level and the reference's unused proj conv
    vars_ = b.variables()
    return {k: v["stage"] for k, v in vars_.items()}


@pytest.mark.slow
def test_sam_stage_matches_reference(reference_modules):
    import torch

    ref_sam, _ = reference_modules
    torch.manual_seed(0)
    tm = ref_sam.SAM(input_dim=24, embed_dim=64, v_dim=32, window_size=7,
                     num_heads=4).eval()

    from tpudepth.models.sam import SAM
    from tpudepth.models.torch_import import _Builder, _sam_stage, state_dict_to_numpy

    sd = state_dict_to_numpy(tm.state_dict())
    b = _Builder(sd)
    _sam_stage(b, "s", ".".lstrip("."), has_proj_e=True, has_proj_q=True)
    variables = b.variables()
    variables = {k: v["s"] for k, v in variables.items()}

    model = SAM(input_dim=24, embed_dim=64, v_dim=32, num_heads=4, use_pallas=False)

    rng = np.random.default_rng(0)
    e = rng.standard_normal((2, 15, 20, 24)).astype(np.float32)  # encoder feat
    q = rng.standard_normal((2, 15, 20, 32)).astype(np.float32)  # decoder state

    with torch.no_grad():
        want = (
            tm(torch.from_numpy(e).permute(0, 3, 1, 2),
               torch.from_numpy(q).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1).numpy()
        )
    got = np.asarray(model.apply({"params": variables["params"]},
                                 jnp.asarray(e), jnp.asarray(q)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_newcrf_stage_matches_reference(reference_modules):
    import torch

    _, ref_newcrf = reference_modules
    torch.manual_seed(0)
    tm = ref_newcrf.NewCRF(input_dim=24, embed_dim=64, v_dim=32, window_size=7,
                           num_heads=4).eval()

    from tpudepth.models.newcrf import NewCRF
    from tpudepth.models.torch_import import (
        _Builder,
        _newcrf_stage,
        state_dict_to_numpy,
    )

    sd = state_dict_to_numpy(tm.state_dict())
    b = _Builder(sd)
    _newcrf_stage(b, "s", "", has_proj_x=True, has_proj_v=True)
    variables = b.variables()
    variables = {k: v["s"] for k, v in variables.items()}

    model = NewCRF(input_dim=24, embed_dim=64, v_dim=32, num_heads=4, use_pallas=False)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 15, 20, 24)).astype(np.float32)  # unary/encoder
    v = rng.standard_normal((2, 15, 20, 32)).astype(np.float32)  # decoder value

    with torch.no_grad():
        want = (
            tm(torch.from_numpy(x).permute(0, 3, 1, 2),
               torch.from_numpy(v).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1).numpy()
        )
    got = np.asarray(model.apply({"params": variables["params"]},
                                 jnp.asarray(x), jnp.asarray(v)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
