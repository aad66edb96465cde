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


def test_bn_stats_bf16read_variant_matches_flax():
    """TPUDEPTH_BN_STATS=bf16read swaps flax nn.BatchNorm for reductions
    with f32 accumulation reading the compute-dtype tensor (the roofline
    'bf16 stat reads' lever, PERF.md round 4). Same param/batch_stats tree,
    train and eval outputs + running stats within bf16 tolerance."""
    import os

    import numpy as np

    from tpudepth.models.layers import BatchNorm

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 32)) * 2 + 0.5, jnp.float32)

    def run(dtype):
        ref = BatchNorm(0.1, 1e-5, dtype=dtype)
        v = ref.init(jax.random.PRNGKey(0), x.astype(dtype), train=True)
        y_ref, m_ref = ref.apply(v, x.astype(dtype), train=True,
                                 mutable=["batch_stats"])
        os.environ["TPUDEPTH_BN_STATS"] = "bf16read"
        try:
            fast = BatchNorm(0.1, 1e-5, dtype=dtype)
            v2 = fast.init(jax.random.PRNGKey(0), x.astype(dtype), train=True)
            assert (jax.tree_util.tree_structure(v2)
                    == jax.tree_util.tree_structure(v))
            y_fast, m_fast = fast.apply(v, x.astype(dtype), train=True,
                                        mutable=["batch_stats"])
            ye_ref = ref.apply(
                {"params": v["params"],
                 "batch_stats": m_ref["batch_stats"]}, x.astype(dtype),
                train=False)
        finally:
            del os.environ["TPUDEPTH_BN_STATS"]
        ye_ref2 = ref.apply(
            {"params": v["params"], "batch_stats": m_ref["batch_stats"]},
            x.astype(dtype), train=False)
        return y_ref, m_ref, y_fast, m_fast, ye_ref, ye_ref2

    # f32: stats must agree to float rounding, outputs to reassociation tol
    y_ref, m_ref, y_fast, m_fast, ye_fast, ye_ref = run(jnp.float32)
    for a, b in zip(jax.tree_util.tree_leaves(m_ref),
                    jax.tree_util.tree_leaves(m_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_fast),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ye_fast), np.asarray(ye_ref),
                               rtol=1e-6, atol=1e-6)

    # bf16 compute: reading bf16 with f32 accumulation vs convert-then-reduce
    # differ only by accumulation order — bound by bf16 epsilon
    y_ref, m_ref, y_fast, m_fast, _, _ = run(jnp.bfloat16)
    for a, b in zip(jax.tree_util.tree_leaves(m_ref),
                    jax.tree_util.tree_leaves(m_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(y_ref, np.float32), np.asarray(y_fast, np.float32),
        rtol=3e-2, atol=3e-2)


def test_mlp_infer_kernel_matches_unfused():
    """ops/pallas/mlp_infer (fused fc1+GELU+fc2, hidden in VMEM — the eval
    byte-reduction lever, PERF.md round 4) must match the unfused Mlp dots;
    and the restructured Mlp module must keep nn.Dense's exact param tree."""
    import numpy as np

    from tpudepth.models.layers import Mlp
    from tpudepth.ops.pallas.mlp_infer import mlp_infer, mlp_infer_available

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 64)), jnp.float32)
    mlp = Mlp(256, 64)
    v = mlp.init(jax.random.PRNGKey(0), x)
    assert set(v["params"].keys()) == {"fc1", "fc2"}
    assert set(v["params"]["fc1"].keys()) == {"kernel", "bias"}
    assert v["params"]["fc1"]["kernel"].shape == (64, 256)
    y_ref = mlp.apply(v, x)  # CPU: unfused dots

    m = 2 * 8 * 16
    assert mlp_infer_available(m, 64, 256, 4)
    y_k = mlp_infer(
        x.reshape(m, 64),
        v["params"]["fc1"]["kernel"], v["params"]["fc1"]["bias"],
        v["params"]["fc2"]["kernel"], v["params"]["fc2"]["bias"],
        interpret=True,
    ).reshape(y_ref.shape)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=2e-6, atol=2e-6)


def test_mlp_train_kernel_fwd_and_grads_match_unfused():
    """ops/pallas/mlp_train (fused FFN fwd + analytic-VJP bwd recomputing the
    hidden tile in VMEM — the TRAIN byte-reduction lever, VERDICT r4 item 1)
    must match the unfused dots path: forward AND all five gradients
    (dx, dw1, db1, dw2, db2)."""
    import numpy as np

    from tpudepth.ops.pallas.mlp_train import mlp_train, mlp_train_available

    rng = np.random.default_rng(1)
    m, c, h, c2 = 64, 64, 256, 64
    x = jnp.asarray(rng.normal(size=(m, c)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, h)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(h, c2)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c2,)) * 0.1, jnp.float32)
    g = jnp.asarray(rng.normal(size=(m, c2)), jnp.float32)
    assert mlp_train_available(m, c, h, 4)

    def unfused(x, w1, b1, w2, b2):
        hh = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return hh @ w2 + b2

    def loss_ref(*args):
        return jnp.vdot(unfused(*args), g)

    def loss_fused(*args):
        return jnp.vdot(mlp_train(*args, True), g)

    y_ref = unfused(x, w1, b1, w2, b2)
    y_k = mlp_train(x, w1, b1, w2, b2, True)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_ref),
                               rtol=3e-6, atol=3e-6)

    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    grads_k = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"),
                          grads_k, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5,
            err_msg=name)
