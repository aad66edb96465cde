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


#: Chebyshev-interpolated coefficients (power basis in the SCALED variable
#: t = 2*z*z/B^2 - 1, B = 3.9375; power-basis Horner in raw z^2 is
#: catastrophically ill-conditioned in f32 at this degree) of erf(z)/z,
#: degree 16. f32-evaluated max abs error 2.1e-7 over all z; erf saturates
#: to +-1 within 2.6e-8 at the clamp boundary.
_ERF_COEF = (3.5913577732e-01, -1.7932530043e-01, 1.3355388746e-01,
             -1.0886771484e-01, 9.0550457025e-02, -7.4167896060e-02,
             5.8572264281e-02, -4.4128607978e-02, 3.1153511247e-02,
             -2.0077809386e-02, 1.2643683187e-02, -8.5512452514e-03,
             4.5126567157e-03, -1.0665787938e-03, 6.3636799682e-04,
             -1.0203042461e-03, 4.1510098659e-04)
_ERF_CLAMP = 3.9375
_ERF_TSCALE = 0.1289997480473671  # 2 / B^2


def _erf_as(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7) — the
    round-4 form, kept behind ``TPUDEPTH_ERF=as`` for A/B attribution."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _erf(x):
    """Polynomial erf: z * P(2*z^2/B^2 - 1) with z clamped to [-B, B].

    Mosaic has no erf/erfc primitive (NotImplementedError on lowering). The
    round-4 kernels used the Abramowitz & Stegun 7.1.26 rational form (max
    err 1.5e-7), but its exp() and divide dominate the VPU cost of the
    GELU-heavy epilogue kernels, which xplane attribution measured
    transcendental-bound (PERF.md round 5: the two stage-0 NewCRF epilogue
    kernels evaluate 78M erfs each). This odd-polynomial form is pure
    FMA + one clamp — no exp, no divide — at the same accuracy (max abs
    error 2.1e-7, f32-evaluated)."""
    import os

    if os.environ.get("TPUDEPTH_ERF") == "as":  # trace-time A/B switch
        return _erf_as(x)
    z = jnp.clip(x, -_ERF_CLAMP, _ERF_CLAMP)
    t = z * z * jnp.float32(_ERF_TSCALE) - 1.0
    p = jnp.float32(_ERF_COEF[-1])
    for c in _ERF_COEF[-2::-1]:
        p = p * t + jnp.float32(c)
    return z * p


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
