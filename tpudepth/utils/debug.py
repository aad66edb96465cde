"""Numerics debugging: NaN detection modes.

The reference's NaN handling is embryonic — inf/nan scrubbing at eval
(``src/test.py:107-108``) and a commented-out NaN-image dump in the train loop
(``src/train.py:102-108``). Here it is a first-class debug mode:

- :func:`nan_debug_mode` — global ``jax_debug_nans`` (re-runs the op that
  produced a NaN un-jitted and raises with a precise location).
- :func:`checkify_nan_step` — wraps a jitted step with
  ``jax.experimental.checkify`` so NaN/inf errors become explicit, cheap,
  device-side checks that surface as Python errors without disabling jit.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Iterator

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def nan_debug_mode() -> Iterator[None]:
    """Enable jax_debug_nans for the duration of the context."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checkify_nan_step(step_fn: Callable) -> Callable:
    """Wrap a step function with device-side NaN/div checks.

    Returns a callable with the same signature; raises
    ``checkify.JaxRuntimeError`` (via ``err.throw()``) when a NaN appears.
    """
    checked = checkify.checkify(step_fn, errors=checkify.float_checks)

    def wrapped(*args, **kw):
        err, out = checked(*args, **kw)
        err.throw()
        return out

    return wrapped
