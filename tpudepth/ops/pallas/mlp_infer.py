"""Fused transformer-FFN kernel for INFERENCE (Pallas TPU).

The SAM / NewCRF blocks end with ``x + fc2(gelu(fc1(LN(x))))``
(``src/SAM.py:241-243``, ``src/newcrf_layers.py:252-255``, mlp_ratio 4). At
eval the XLA path materializes the 4C hidden activation in HBM twice (fc1
write + fc2 read) — at 480x640 bs8 that is 2 x 157 MB per block, the largest
remaining byte consumer of the attention decoders' eval path after the
round-3 channel-packed attention kernel (PERF.md round 4 accounting).

This kernel runs fc1 -> GELU -> fc2 over row tiles with the hidden tile held
in VMEM: HBM traffic becomes read x + write y + the (grid-invariant, resident)
weights. Numerics mirror the XLA eval path: dots in the input dtype with f32
accumulation, fc1 output cast back to the compute dtype, exact (erf) GELU —
exactness vs the unfused path is asserted on-chip in
tests/test_models.py::test_mlp_infer_kernel_matches (CPU uses interpret mode).

Training keeps the XLA path (the backward wants XLA's dot fusions; this
kernel has no VJP). Dispatch: :class:`tpudepth.models.layers.Mlp` on
TPU-eval; ``TPUDEPTH_MLP=xla`` opts out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, max abs error 1.5e-7 —
    Mosaic has no erf/erfc primitive (NotImplementedError on lowering), and
    1.5e-7 is below bf16 resolution of the GELU inputs this kernel sees."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu_exact(x):
    """0.5 * x * (1 + erf(x / sqrt(2))) — the nn.GELU(approximate=False)
    formulation the unfused eval path uses (src/SAM.py:12)."""
    inv_sqrt2 = 0.7071067811865476
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * inv_sqrt2))).astype(x.dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    dt = x_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    x = x_ref[:]
    h = jax.lax.dot_general(
        x, w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b1_ref[:].astype(jnp.float32)
    # same op order as the unfused path: fc1 returns the compute dtype, the
    # exact (erf) GELU runs on that dtype (src/SAM.py:12 nn.GELU default)
    h = _gelu_exact(h.astype(dt))
    y = jax.lax.dot_general(
        h, w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = y.astype(out_ref.dtype)


def _pick_tile(m: int, c: int, hidden: int, itemsize: int,
               budget: int = 48 << 20) -> int:
    """Largest row tile dividing m whose VMEM footprint (x + out + f32
    hidden + double-buffering slack) fits after the resident weights."""
    weights = (c * hidden + hidden * c) * itemsize + (hidden + c) * 4
    per_row = 2 * (2 * c * itemsize + hidden * 4 + hidden * itemsize)
    cap = max(8, (budget - 2 * weights) // max(per_row, 1))
    best = 8
    for t in range(8, min(cap, m) + 1, 8):
        if m % t == 0:
            best = t
    return best


def mlp_infer_available(m: int, c: int, hidden: int, itemsize: int = 2) -> bool:
    """Shapes the kernel handles well: resident weights must leave VMEM room
    for a reasonable row tile, and m must have a /8 divisor tile."""
    weights = 2 * c * hidden * itemsize
    if weights > 32 << 20:
        return False
    return m % 8 == 0


@functools.partial(jax.jit, static_argnames="interpret")
def mlp_infer(x, w1, b1, w2, b2, *, interpret: bool = False):
    """Fused ``fc2(gelu(fc1(x)))`` over rows.

    Args:
      x: [M, C] tokens (flattened batch x spatial).
      w1: [C, H]; b1: [H]; w2: [H, C2]; b2: [C2].

    Returns: [M, C2] in x.dtype.
    """
    m, c = x.shape
    hidden = w1.shape[1]
    c2 = w2.shape[1]
    t = _pick_tile(m, c, hidden, x.dtype.itemsize)
    grid = (m // t,)
    flops = 2 * m * hidden * (c + c2)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(m * (c + c2) + 2 * c * hidden) * x.dtype.itemsize,
        transcendentals=m * hidden,
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, c2), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, c2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(x, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2)
