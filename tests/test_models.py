"""Model zoo: shape smoke tests + golden parity vs the mounted reference
(GuideDepth stack is pure-torch and importable; SURVEY.md §4)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudepth.models import build_model, MODEL_NAMES


@pytest.fixture(scope="module")
def key():
    return jax.random.PRNGKey(0)


SHAPE_CASES = [
    # (name, input hw, expected output hw relative to input)
    ("GuideDepth", (96, 128), (96, 128)),
    ("GuideDepth-S", (96, 128), (96, 128)),
    ("sam", (64, 96), (64, 96)),
    ("newcrf", (64, 96), (64, 96)),
    ("densedepth", (96, 128), (48, 64)),
    ("unet", (128, 128), (64, 64)),
    ("unet_interp", (96, 128), (48, 64)),
    # small's final tap is the stem output at 1/2 res
    # (src/models/model_mobileV3_Unet_interpolado_small.py:128), so the
    # output is half resolution.
    ("unet_interp_small", (96, 128), (48, 64)),
]


@pytest.mark.parametrize("name,hw,out_hw", SHAPE_CASES)
def test_model_output_shapes(key, name, hw, out_hw):
    model = build_model(name, use_pallas=False)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = model.init(key, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape[0] == 1 and y.shape[-1] == 1
    assert y.shape[1:3] == out_hw, f"{name}: {y.shape} vs {out_hw}"


def _load_reference_guidedepth():
    """Instantiate the reference torch GuideDepth (pure torch, no timm)."""
    import torch

    # "GuideDepth.model..." absolute imports need src/ on the path.
    for p in ("/root/reference/src", "/root/reference/src/GuideDepth"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from GuideDepth.model.GuideDepth import GuideDepth as TorchGuideDepth
    torch.manual_seed(0)
    return TorchGuideDepth(pretrained=False)


def test_guidedepth_matches_reference_torch_model():
    """Golden parity: random-init reference torch GuideDepth, convert weights,
    compare eval-mode forward outputs (tolerance: fp32 conv stacks)."""
    import torch

    from tpudepth.models.torch_import import convert_guidedepth, state_dict_to_numpy

    tmodel = _load_reference_guidedepth().eval()
    sd = state_dict_to_numpy(tmodel.state_dict())

    model = build_model("GuideDepth")
    variables = convert_guidedepth(sd)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 96, 128, 3)).astype(np.float32)

    with torch.no_grad():
        want = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_guidedepth_converter_covers_all_torch_params():
    from tpudepth.models.torch_import import convert_guidedepth, state_dict_to_numpy

    tmodel = _load_reference_guidedepth()
    sd = state_dict_to_numpy(tmodel.state_dict())
    variables = convert_guidedepth(sd)

    n_torch = sum(v.size for k, v in sd.items() if "num_batches_tracked" not in k)
    n_flax = sum(
        x.size for x in jax.tree_util.tree_leaves(variables)
    )
    assert n_torch == n_flax, f"param count mismatch: torch {n_torch} vs flax {n_flax}"


def test_converted_params_match_init_structure(key):
    """Converted tree must be loadable exactly where init() puts params."""
    from tpudepth.models.torch_import import convert_guidedepth, state_dict_to_numpy

    tmodel = _load_reference_guidedepth()
    variables = convert_guidedepth(state_dict_to_numpy(tmodel.state_dict()))

    model = build_model("GuideDepth")
    init_vars = model.init(key, jnp.zeros((1, 32, 32, 3)), train=False)

    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_vars)
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables)
    assert init_shapes == conv_shapes
