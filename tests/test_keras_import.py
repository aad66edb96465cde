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
