"""NaN-check and profiling utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudepth.utils.debug import checkify_nan_step, nan_debug_mode
from tpudepth.utils.profiling import StepTimer, timed


def test_checkify_nan_step_raises_on_nan():
    def step(x):
        return jnp.log(x)  # NaN for negative input

    checked = checkify_nan_step(jax.jit(step))
    out = checked(jnp.asarray([1.0, 2.0]))
    assert np.all(np.isfinite(np.asarray(out)))
    with pytest.raises(Exception) as e:
        checked(jnp.asarray([-1.0]))
    assert "nan" in str(e.value).lower()


def test_nan_debug_mode_restores_flag():
    before = jax.config.jax_debug_nans
    with nan_debug_mode():
        assert jax.config.jax_debug_nans is True
    assert jax.config.jax_debug_nans == before


def test_timed_and_step_timer():
    out, dt = timed(jax.jit(lambda x: x * 2), jnp.ones((8, 8)))
    assert dt >= 0 and out.shape == (8, 8)
    t = StepTimer()
    t.data_done()
    t.step_done(sync_on=out)
    s = t.summary()
    assert s["steps"] == 1 and s["compute_time_per_step"] >= 0
