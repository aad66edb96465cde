"""Fused root-recipe loss kernel (ops/pallas/fused_root_loss.py) vs the
pure-jnp reference (ssim + l1_loss): forward and analytic backward."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpudepth.losses import l1_loss, ssim
from tpudepth.ops.pallas import fused_root_loss as frl


@pytest.fixture
def pair():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((2, 24, 32, 1)) * 0.9 + 0.05, jnp.float32)
    tgt = jnp.asarray(rng.random((2, 24, 32, 1)) * 0.9 + 0.05, jnp.float32)
    return pred, tgt


def _interp(fn, *args):
    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        return fn(*args)
    finally:
        pl.pallas_call = orig


def reference(pred, tgt):
    return 1.0 * ssim(pred, tgt) + 0.1 * l1_loss(pred, tgt)


def test_fused_root_forward_matches_reference(pair):
    pred, tgt = pair
    got = _interp(lambda: frl.fused_root_loss(pred, tgt, 1.0, 0.1))
    want = reference(pred, tgt)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)


def test_fused_root_grad_matches_reference(pair):
    pred, tgt = pair
    want = jax.grad(lambda p: reference(p, tgt))(pred)
    got = _interp(
        lambda: jax.grad(lambda p: frl.fused_root_loss(p, tgt, 1.0, 0.1))(pred))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_fused_root_grad_with_clip_active(pair):
    """Anticorrelated inputs push (1-ssim)/2 toward the clip boundaries —
    the per-pixel gate must match autodiff of the clipped reference."""
    pred, tgt = pair
    pred = 1.0 - tgt + 0.05 * pred  # strongly anticorrelated with target
    want = jax.grad(lambda p: reference(p, tgt))(pred)
    got = _interp(
        lambda: jax.grad(lambda p: frl.fused_root_loss(p, tgt, 1.0, 0.1))(pred))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


def test_availability_guard():
    assert frl.fused_root_loss_available((8, 480, 640, 1))
    assert frl.fused_root_loss_available((8, 384, 1280, 1))
    assert not frl.fused_root_loss_available((1, 2048, 1024, 1))  # > 1M px
    assert not frl.fused_root_loss_available((8, 480, 640, 3))
