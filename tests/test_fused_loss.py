"""Fused SSIM+L1+gradient pallas loss vs the pure-jnp reference loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudepth.losses import DepthLoss
from tpudepth.ops.pallas.fused_loss import (
    fused_depth_loss,
    fused_depth_loss_available,
    _fused_partials,
)


@pytest.fixture
def pair(rng):
    pred = rng.random((3, 48, 64, 1), dtype=np.float32) * 10
    tgt = rng.random((3, 48, 64, 1), dtype=np.float32) * 10
    return jnp.asarray(pred), jnp.asarray(tgt)


def test_fused_matches_reference_loss(pair):
    pred, tgt = pair
    want = float(DepthLoss(0.1, 1.0, 1.0, 10.0)(pred, tgt))
    # interpret-mode pallas on CPU
    import tpudepth.ops.pallas.fused_loss as fl
    from jax.experimental import pallas as pl
    import functools

    # monkeypatch pallas_call to interpret mode for the CPU test
    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        got = float(fused_depth_loss(pred, tgt, 0.1, 1.0, 1.0, 10.0))
    finally:
        pl.pallas_call = orig
    assert abs(got - want) < 2e-4, (got, want)


def test_fused_grad_matches_reference(pair):
    pred, tgt = pair
    from jax.experimental import pallas as pl
    import functools

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        g_fused = jax.grad(
            lambda p: fused_depth_loss(p, tgt, 0.1, 1.0, 1.0, 10.0)
        )(pred)
    finally:
        pl.pallas_call = orig
    g_ref = jax.grad(lambda p: DepthLoss(0.1, 1.0, 1.0, 10.0)(p, tgt))(pred)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_availability_guard():
    assert fused_depth_loss_available((8, 240, 320, 1))
    assert fused_depth_loss_available((8, 192, 640, 1))
    assert fused_depth_loss_available((8, 480, 640, 1))
    assert fused_depth_loss_available((8, 384, 1280, 1))
    assert not fused_depth_loss_available((8, 1024, 1280, 1))  # VMEM budget
    assert not fused_depth_loss_available((8, 8, 8, 1))  # window too big
    assert not fused_depth_loss_available((8, 240, 320, 3))
