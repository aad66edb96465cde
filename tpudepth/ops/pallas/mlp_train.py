"""Fused transformer-FFN kernel for TRAINING (Pallas TPU, analytic VJP).

Round 4 removed the FFN's 4C-hidden HBM round-trip at inference only
(``ops/pallas/mlp_infer.py``); the SAM / NewCRF TRAIN steps still materialize
the hidden activation twice on the forward (fc1 write + fc2 read) AND save
both the pre-GELU and post-GELU hidden tensors for the backward — at 480x640
bs8 that is 4 x [M, 4C] of HBM traffic per block on a step already pinned at
~102-104% of cost-bytes bandwidth (PERF.md round 4; VERDICT r4 item 1).

This module pairs the forward kernel (same body as mlp_infer: fc1 -> exact
rational-erf GELU -> fc2, hidden held in VMEM) with a fused analytic backward
that RECOMPUTES the hidden tile in VMEM instead of reading it back from HBM:

  backward HBM traffic = read x + read g + write dx + the (grid-invariant,
  VMEM-resident) weights and weight-gradient accumulators

versus the unfused autodiff's read(h1) + read(a) + write(da) + write(dh1)
[M, 4C] streams. Weight/bias grads accumulate in f32 across the (sequential)
TPU grid, the same single-block accumulator pattern as
``window_attn.py::_bwd_body``'s dbias.

Numerics: dots in the input dtype with f32 accumulation (bf16 takes the
native MXU path; f32 uses HIGHEST so Mosaic doesn't round operands to bf16);
GELU and its derivative use the Abramowitz-Stegun rational erf (max abs err
1.5e-7 — below bf16 resolution; see mlp_infer._erf). Exactness vs the
unfused XLA path is asserted for BOTH the forward and all five gradients in
tests/test_models.py (CPU interpret mode).

Dispatch: :class:`tpudepth.models.layers.Mlp` routes here on TPU training
traces (``tpudepth.ops.attention.training_mode``); ``TPUDEPTH_MLP=xla`` opts
out. Reference FFN being matched: ``src/SAM.py:241-242``,
``src/newcrf_layers.py:252-255`` (mlp_ratio 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudepth.ops.pallas.mlp_infer import _erf, _kernel, _pick_tile

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_and_grad(xf):
    """gelu(x) and d gelu/dx at f32 x: 0.5*x*(1+erf(x/sqrt2)) and
    0.5*(1+erf(x/sqrt2)) + x * pdf(x)."""
    cdf2 = 0.5 * (1.0 + _erf(xf * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * xf * xf) * _INV_SQRT_2PI
    return xf * cdf2, cdf2 + xf * pdf


def _bwd_kernel(x_ref, g_ref, w1_ref, b1_ref, w2_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    dt = x_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    dot = functools.partial(
        jax.lax.dot_general, preferred_element_type=jnp.float32,
        precision=prec)

    x = x_ref[:]                                     # [T, C]
    g = g_ref[:]                                     # [T, C2]
    # recompute the hidden tile in VMEM (the byte-for-FLOP trade)
    h1 = dot(x, w1_ref[:], (((1,), (0,)), ((), ()))) \
        + b1_ref[:].astype(jnp.float32)              # [T, H] f32
    # forward ran GELU on the dt-cast fc1 output — recompute identically
    hf = h1.astype(dt).astype(jnp.float32)
    a, dgelu = _gelu_and_grad(hf)                    # f32

    ad = a.astype(dt)
    # dw2[h, c2] = sum_t a[t, h] * g[t, c2]
    dw2 = dot(ad, g, (((0,), (0,)), ((), ())))
    db2 = jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    # da[t, h] = sum_c2 g[t, c2] * w2[h, c2]
    da = dot(g, w2_ref[:], (((1,), (1,)), ((), ())))
    dh1 = da * dgelu                                 # [T, H] f32
    dh1d = dh1.astype(dt)
    # dx[t, c] = sum_h dh1[t, h] * w1[c, h]
    dx = dot(dh1d, w1_ref[:], (((1,), (1,)), ((), ())))
    # dw1[c, h] = sum_t x[t, c] * dh1[t, h]
    dw1 = dot(x, dh1d, (((0,), (0,)), ((), ())))
    db1 = jnp.sum(dh1, axis=0, keepdims=True)

    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[:] = dw1
        db1_ref[:] = db1
        dw2_ref[:] = dw2
        db2_ref[:] = db2

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw1_ref[:] = dw1_ref[:] + dw1
        db1_ref[:] = db1_ref[:] + db1
        dw2_ref[:] = dw2_ref[:] + dw2
        db2_ref[:] = db2_ref[:] + db2


def _pick_tile_bwd(m: int, c: int, hidden: int, c2: int, itemsize: int,
                   budget: int = 72 << 20) -> int:
    """Largest row tile dividing m under the backward's VMEM budget: resident
    weights + f32 grad accumulators, ~3 live f32 [T, H] intermediates, and
    double-buffered x/g/dx row streams."""
    resident = (c * hidden + hidden * c2) * itemsize \
        + (c * hidden + hidden * c2 + hidden + c2) * 4
    per_row = 2 * ((2 * c + c2) * itemsize) + 3 * hidden * 4
    cap = max(8, (budget - resident) // max(per_row, 1))
    best = 8
    for t in range(8, min(cap, m) + 1, 8):
        if m % t == 0:
            best = t
    return best


def mlp_train_available(m: int, c: int, hidden: int, itemsize: int = 2) -> bool:
    """The backward must fit resident weights AND f32 grad accumulators in
    VMEM with room for at least an 8-row tile."""
    resident = 2 * c * hidden * itemsize + 2 * c * hidden * 4 + (hidden + c) * 4
    if resident > 56 << 20:
        return False
    return m % 8 == 0


@functools.partial(jax.jit, static_argnames="interpret")
def _mlp_fwd_pallas(x, w1, b1, w2, b2, *, interpret: bool = False):
    """Forward kernel (same body as mlp_infer, weights pre-cast by caller)."""
    m, c = x.shape
    hidden = w1.shape[1]
    c2 = w2.shape[1]
    t = _pick_tile(m, c, hidden, x.dtype.itemsize)
    cost = pl.CostEstimate(
        flops=2 * m * hidden * (c + c2),
        bytes_accessed=(m * (c + c2) + 2 * c * hidden) * x.dtype.itemsize,
        transcendentals=m * hidden,
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, c2), x.dtype),
        grid=(m // t,),
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
    )(x, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames="interpret")
def _mlp_bwd_pallas(x, g, w1, b1, w2, *, interpret: bool = False):
    m, c = x.shape
    hidden = w1.shape[1]
    c2 = w2.shape[1]
    t = _pick_tile_bwd(m, c, hidden, c2, x.dtype.itemsize)
    cost = pl.CostEstimate(
        flops=8 * m * hidden * (c + c2),
        bytes_accessed=(m * (2 * c + c2) + 2 * c * hidden) * x.dtype.itemsize,
        transcendentals=2 * m * hidden,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((m, c), x.dtype),            # dx
        jax.ShapeDtypeStruct((c, hidden), jnp.float32),   # dw1
        jax.ShapeDtypeStruct((1, hidden), jnp.float32),   # db1
        jax.ShapeDtypeStruct((hidden, c2), jnp.float32),  # dw2
        jax.ShapeDtypeStruct((1, c2), jnp.float32),       # db2
    )
    out_specs = (
        pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hidden, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=out_shapes,
        grid=(m // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 << 20),
        interpret=interpret,
    )(x, g, w1, b1, w2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def mlp_train(x, w1, b1, w2, b2, interpret: bool = False):
    """Differentiable fused ``fc2(gelu(fc1(x)))``.

    Args:
      x: [M, C] tokens (flattened batch x spatial), bf16/f32.
      w1: [C, H]; b1: [H]; w2: [H, C2]; b2: [C2] — any float dtype; dots run
        in x.dtype (weight grads flow back through the cast, like the unfused
        path's ``w.astype(dt)``).

    Returns: [M, C2] in x.dtype.
    """
    dt = x.dtype
    return _mlp_fwd_pallas(x, w1.astype(dt), b1.astype(dt), w2.astype(dt),
                           b2.astype(dt), interpret=interpret)


def _mt_fwd(x, w1, b1, w2, b2, interpret):
    out = mlp_train(x, w1, b1, w2, b2, interpret)
    return out, (x, w1, b1, w2, b2)


def _mt_bwd(interpret, res, g):
    x, w1, b1, w2, b2 = res
    dt = x.dtype
    dx, dw1, db1, dw2, db2 = _mlp_bwd_pallas(
        x, g.astype(dt), w1.astype(dt), b1.astype(dt), w2.astype(dt),
        interpret=interpret)
    return (dx, dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
            dw2.astype(w2.dtype), db2[0].astype(b2.dtype))


mlp_train.defvjp(_mt_fwd, _mt_bwd)
