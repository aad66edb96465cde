"""Keras .h5 import utilities on a synthetic weights file."""

import numpy as np
import pytest

from tpudepth.models.keras_import import (
    clip_predictions,
    keras_bn,
    load_keras_h5,
    my_depth_norm,
)


@pytest.fixture
def h5_file(tmp_path, rng):
    import h5py

    p = str(tmp_path / "weights.h5")
    with h5py.File(p, "w") as f:
        mw = f.create_group("model_weights")
        conv = mw.create_group("conv1/conv1")
        conv.create_dataset("kernel:0", data=rng.standard_normal((3, 3, 3, 16)).astype(np.float32))
        conv.create_dataset("bias:0", data=np.zeros(16, np.float32))
        bn = mw.create_group("bn1/bn1")
        for n in ("gamma:0", "beta:0", "moving_mean:0", "moving_variance:0"):
            bn.create_dataset(n, data=rng.random(16).astype(np.float32))
    return p


def test_load_keras_h5(h5_file):
    w = load_keras_h5(h5_file)
    conv = w["conv1/conv1"]
    assert conv["kernel:0"].shape == (3, 3, 3, 16)  # HWIO, flax-ready
    gamma, beta, mean, var = keras_bn(w["bn1/bn1"])
    assert gamma.shape == (16,) and var is not None


def test_depth_norm_and_clip():
    x = np.asarray([10.0, 100.0, 1000.0])
    np.testing.assert_allclose(my_depth_norm(x), [100.0, 10.0, 1.0])
    out = clip_predictions(np.asarray([0.5, 2.0, 1000.0]))
    # clip(1000/p, 10, 1000)/1000
    np.testing.assert_allclose(out, [1.0, 0.5, 0.01])


def test_import_keras_sequential_end_to_end():
    """The reference's positional walk (load_weight_from_keras.py:47-83)
    retargeted at flax: conv kernel/bias, BN gamma/beta/mean/var consumed in
    keras get_weights() order, landing in params + batch_stats."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tpudepth.models.keras_import import import_keras_sequential

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Conv(4, (1, 1))(x)
            return x

    model = Tiny()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    # keras get_weights() order: conv1 k, conv1 b, gamma, beta, mean, var,
    # conv2 k, conv2 b
    wl = [
        rng.random((3, 3, 3, 8)).astype(np.float32),
        rng.random(8).astype(np.float32),
        rng.random(8).astype(np.float32) + 0.5,
        rng.random(8).astype(np.float32),
        rng.random(8).astype(np.float32),
        rng.random(8).astype(np.float32) + 0.1,
        rng.random((1, 1, 8, 4)).astype(np.float32),
        rng.random(4).astype(np.float32),
    ]
    new = import_keras_sequential(
        wl, variables, layer_order=["Conv_0", "BatchNorm_0", "Conv_1"])
    p = new["params"]
    np.testing.assert_array_equal(p["Conv_0"]["kernel"], wl[0])
    np.testing.assert_array_equal(p["Conv_0"]["bias"], wl[1])
    np.testing.assert_array_equal(p["BatchNorm_0"]["scale"], wl[2])
    np.testing.assert_array_equal(p["BatchNorm_0"]["bias"], wl[3])
    np.testing.assert_array_equal(new["batch_stats"]["BatchNorm_0"]["mean"], wl[4])
    np.testing.assert_array_equal(new["batch_stats"]["BatchNorm_0"]["var"], wl[5])
    np.testing.assert_array_equal(p["Conv_1"]["kernel"], wl[6])
    np.testing.assert_array_equal(p["Conv_1"]["bias"], wl[7])

    # imported weights drive the forward (eval BN uses imported stats)
    y = model.apply(new, x)
    want = np.asarray(x)
    k, b = wl[0], wl[1]
    # manual reference forward
    conv1 = jax.lax.conv_general_dilated(
        jnp.asarray(want), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    xn = (conv1 - wl[4]) / np.sqrt(wl[5] + 1e-5) * wl[2] + wl[3]
    xr = np.maximum(np.asarray(xn), 0)
    conv2 = jax.lax.conv_general_dilated(
        jnp.asarray(xr), jnp.asarray(wl[6]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + wl[7]
    np.testing.assert_allclose(np.asarray(y), np.asarray(conv2),
                               rtol=1e-4, atol=1e-5)


def test_import_keras_sequential_errors():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import pytest

    from tpudepth.models.keras_import import import_keras_sequential

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    v = M().init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    with pytest.raises(ValueError, match="exhausted"):
        import_keras_sequential([np.zeros((3, 4), np.float32)], v)
    with pytest.raises(ValueError, match="mismatch"):
        import_keras_sequential(
            [np.zeros((5, 4), np.float32), np.zeros(4, np.float32)], v)
    with pytest.raises(ValueError, match="unconsumed"):
        import_keras_sequential(
            [np.zeros((3, 4), np.float32), np.zeros(4, np.float32),
             np.zeros(4, np.float32)], v)


def test_import_keras_nested_level_ordering():
    """layer_order as a {path: ordering} mapping reorders NESTED siblings
    whose alphabetical order differs from network order (ADVICE r2: a
    positional walk would otherwise import shape-compatible siblings
    silently swapped)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from tpudepth.models.keras_import import import_keras_sequential

    class Inner(nn.Module):
        @nn.compact
        def __call__(self, x):
            # network order: zfirst then asecond — alphabetical is reversed
            x = nn.Dense(3, name="zfirst")(x)
            return nn.Dense(3, name="asecond")(x)

    class Outer(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Inner(name="inner")(x)

    v = Outer().init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
    w = [np.full((3, 3), 1.0, np.float32), np.full(3, 2.0, np.float32),   # zfirst
         np.full((3, 3), 3.0, np.float32), np.full(3, 4.0, np.float32)]  # asecond
    out = import_keras_sequential(
        w, v, layer_order={"inner": ["zfirst", "asecond"]})
    p = out["params"]["inner"]
    assert float(p["zfirst"]["kernel"][0, 0]) == 1.0
    assert float(p["asecond"]["kernel"][0, 0]) == 3.0
    # without the mapping, alphabetical walk swaps them
    swapped = import_keras_sequential(w, v)
    assert float(swapped["params"]["inner"]["asecond"]["kernel"][0, 0]) == 1.0
