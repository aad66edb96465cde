"""Fused block-epilogue kernel for INFERENCE (Pallas TPU).

Round 5's whole-block kernels (``block_infer.py``) proved that fusing the
attention-block tail is the right byte cut but the wrong layout: per-window
[56, C] dots starve the MXU (PERF.md round 5 quantified negative). This
kernel keeps the tail fusion and the FLAT layout: after the attention core's
output windows are reversed back to [B, H, W, C], everything downstream of
the attention scores is row-wise —

    z   = o @ W_proj + b_proj       (src/SAM.py:137-139 / newcrf_layers.py:147)
    y   = x + z                     (the first residual, src/SAM.py:231)
    out = y + fc2(gelu(fc1(LN(y)))) (src/SAM.py:241-243)

so one kernel over [M, C] row tiles (M = B*H*W) with full-height MXU tiles
computes all of it with z, y, LN(y) and the 4C hidden held in VMEM. HBM
traffic for the block tail collapses from ~12 C-planes (z write+read, y
write + 2 reads, LN write+read, FFN out write+read) to 3 (read o, read x,
write out) plus the grid-invariant resident weights.

Numerics per sub-op match the proven kernels: dots in the input dtype with
f32 accumulation (bf16 = native MXU, f32 = HIGHEST); LayerNorm is flax's
fast-variance f32 formula; GELU is the exact-erf rational approximation
(``mlp_infer._erf``); the two residual adds round through the compute dtype
exactly where the unfused path materializes dt tensors. Inference only (no
VJP) — training keeps ``mlp_train`` + XLA's fused backward.

Dispatch: ``models/sam.py::SAMBlock`` / ``models/newcrf.py::CRFBlock`` on
TPU-eval traces; ``TPUDEPTH_EPILOGUE=xla`` opts out. The attention modules
hand back the raw proj weights (``skip_proj=True``) through the same
``_DenseParams`` declaration, keeping the param tree identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudepth.ops.pallas.block_infer import _ln
from tpudepth.ops.pallas.mlp_infer import _gelu_exact


def _kernel(o_ref, x_ref, wp_ref, bp_ref, lns_ref, lnb_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    dt = o_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    z = jax.lax.dot_general(
        o_ref[:], wp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + bp_ref[:].astype(jnp.float32)
    y = x_ref[:] + z.astype(dt)  # dt add, as the unfused residual
    yn = _ln(y.astype(jnp.float32), lns_ref, lnb_ref).astype(dt)
    h = jax.lax.dot_general(
        yn, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b1_ref[:].astype(jnp.float32)
    g = _gelu_exact(h.astype(dt))
    m = jax.lax.dot_general(
        g, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b2_ref[:].astype(jnp.float32)
    out_ref[:] = (y + m.astype(dt)).astype(out_ref.dtype)


def _pick_tile(m: int, c: int, hidden: int, itemsize: int,
               budget: int = 48 << 20) -> int:
    """Largest /8 row tile dividing m fitting after the resident weights:
    3 dt IO planes (double-buffered) + ~4 f32 C-planes of intermediates +
    the f32+dt hidden."""
    weights = (c * c + 2 * c * hidden) * itemsize + (5 * c + hidden) * 4
    per_row = 2 * 3 * c * itemsize + 4 * c * 4 + hidden * 4 + hidden * itemsize
    cap = max(8, (budget - 2 * weights) // max(per_row, 1))
    best = 8
    for t in range(8, min(cap, m) + 1, 8):
        if m % t == 0:
            best = t
    return best


def epilogue_available(m: int, c: int, hidden: int, itemsize: int = 2) -> bool:
    """Resident weights (proj + FFN) must leave VMEM room for a row tile;
    all decoder stages (C=128..1024, ratio-4 FFN) qualify at bf16."""
    weights = (c * c + 2 * c * hidden) * itemsize
    return m % 8 == 0 and weights <= 32 << 20


@functools.partial(jax.jit, static_argnames="interpret")
def block_epilogue_infer(o, x, wproj, bproj, lns, lnb, w1, b1, w2, b2,
                         *, interpret: bool = False):
    """Fused ``(x + proj(o)) + FFN(LN(x + proj(o)))`` over rows.

    Args:
      o: [M, C] attention-core output (post window-reverse/crop, flattened).
      x: [M, C] block input (the residual shortcut), same dtype as o.
      wproj/bproj: out-projection; lns/lnb: norm2; w1/b1/w2/b2: FFN.

    Returns: [M, C] block output in o.dtype.
    """
    m, c = o.shape
    hidden = w1.shape[1]
    dt = o.dtype
    t = _pick_tile(m, c, hidden, dt.itemsize)
    grid = (m // t,)
    flops = 2 * m * c * (c + 2 * hidden)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(3 * m * c + c * c + 2 * c * hidden) * dt.itemsize,
        transcendentals=m * hidden,
    )
    row = lambda: pl.BlockSpec((t, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    full2d = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, c), dt),
        grid=grid,
        in_specs=[row(), row(), full2d(c, c), vec(c), vec(c), vec(c),
                  full2d(c, hidden), vec(hidden), full2d(hidden, c), vec(c)],
        out_specs=row(),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 << 20),
        interpret=interpret,
    )(o, x.astype(dt), wproj.astype(dt), bproj, lns, lnb,
      w1.astype(dt), b1, w2.astype(dt), b2)
