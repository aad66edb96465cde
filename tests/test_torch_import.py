"""Weight converter coverage: torchvision MobileNetV3 name mapping against a
synthetic state_dict with the documented torchvision layout, and DDRNet
converter structure checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudepth.models.mobilenetv3 import (
    LARGE_SPEC,
    SMALL_SPEC,
    LARGE_LAST,
    SMALL_LAST,
    MobileNetV3Features,
)
from tpudepth.models.torch_import import convert_mobilenetv3


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def synth_torchvision_sd(arch: str):
    """Random state_dict with torchvision mobilenet_v3 'features' naming."""
    rng = np.random.default_rng(0)
    spec = LARGE_SPEC if arch == "large" else SMALL_SPEC
    last = LARGE_LAST if arch == "large" else SMALL_LAST
    sd = {}

    def conv(prefix, cin, cout, k, groups=1, bias=False):
        sd[f"{prefix}.weight"] = rng.standard_normal(
            (cout, cin // groups, k, k)
        ).astype(np.float32) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.random(c).astype(np.float32) + 0.5
        sd[f"{prefix}.bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_mean"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[f"{prefix}.running_var"] = rng.random(c).astype(np.float32) + 0.5
        sd[f"{prefix}.num_batches_tracked"] = np.asarray(0)

    conv("features.0.0", 3, 16, 3)
    bn("features.0.1", 16)
    cin = 16
    for i, (k, exp, out, se, act, s) in enumerate(spec):
        t = f"features.{i + 1}.block"
        j = 0
        if exp != cin:
            conv(f"{t}.{j}.0", cin, exp, 1)
            bn(f"{t}.{j}.1", exp)
            j += 1
        conv(f"{t}.{j}.0", exp, exp, k, groups=exp)
        bn(f"{t}.{j}.1", exp)
        j += 1
        if se:
            sq = _make_divisible(exp // 4)
            conv(f"{t}.{j}.fc1", exp, sq, 1, bias=True)
            conv(f"{t}.{j}.fc2", sq, exp, 1, bias=True)
            j += 1
        conv(f"{t}.{j}.0", exp, out, 1)
        bn(f"{t}.{j}.1", out)
        cin = out
    conv(f"features.{len(spec) + 1}.0", cin, last, 1)
    bn(f"features.{len(spec) + 1}.1", last)
    return sd


@pytest.mark.parametrize("arch", ["large", "small"])
def test_mobilenetv3_converter_matches_init_structure(arch):
    sd = synth_torchvision_sd(arch)
    variables = convert_mobilenetv3(sd, arch)
    model = MobileNetV3Features(arch)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_vars)
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables)
    assert init_shapes == conv_shapes

    n_sd = sum(v.size for k, v in sd.items() if "num_batches_tracked" not in k)
    n_flax = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    assert n_sd == n_flax


def test_mobilenetv3_converted_forward_runs():
    sd = synth_torchvision_sd("large")
    variables = convert_mobilenetv3(sd, "large")
    model = MobileNetV3Features("large")
    feats = model.apply(variables, jnp.ones((1, 64, 96, 3)), train=False)
    assert len(feats) == 18
    assert feats[17].shape == (1, 2, 3, 960)
    assert np.all(np.isfinite(np.asarray(feats[17])))


def test_ddrnet_converter_matches_backbone_structure():
    """Round-trip: reference torch DDRNet state_dict -> our backbone tree."""
    import sys

    for p in ("/root/reference/src", "/root/reference/src/GuideDepth"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch
    from GuideDepth.model.DDRNet_23_slim import DualResNet_Backbone

    from tpudepth.models.ddrnet import DualResNetBackbone
    from tpudepth.models.torch_import import convert_ddrnet, state_dict_to_numpy

    torch.manual_seed(0)
    tmodel = DualResNet_Backbone(pretrained=False, features=64)
    variables = convert_ddrnet(state_dict_to_numpy(tmodel.state_dict()))

    model = DualResNetBackbone(features=64)
    init_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, init_vars)
    conv_shapes = jax.tree_util.tree_map(lambda x: x.shape, variables)
    assert init_shapes == conv_shapes


def test_ddrnet_converted_forward_matches_torch():
    import sys

    for p in ("/root/reference/src", "/root/reference/src/GuideDepth"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch
    from GuideDepth.model.DDRNet_23_slim import DualResNet_Backbone

    from tpudepth.models.ddrnet import DualResNetBackbone
    from tpudepth.models.torch_import import convert_ddrnet, state_dict_to_numpy

    torch.manual_seed(0)
    tmodel = DualResNet_Backbone(pretrained=False, features=64).eval()
    variables = convert_ddrnet(state_dict_to_numpy(tmodel.state_dict()))
    model = DualResNetBackbone(features=64)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = (
            tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
        )
    got = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
