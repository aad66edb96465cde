"""Channel-packed fused window attention for INFERENCE (Pallas TPU).

Why a second kernel: profiling the NewCRF eval path (PERF.md round 3) showed
the XLA attention spending most of its time on `[BW, heads, 49, 49]` f32
probability tensors — with TPU tiling the minor 49 pads to 128 lanes, so each
one is physically ~2.6x its logical size and the chain runs at ~150 GB/s —
plus `[BW, 49, heads, 32]` head-split transposes on both sides. This kernel
takes q/k/v in the natural channel-packed layout `[BW, N, C]` straight out of
the QK/KV projections (C = heads * head_dim, lane-aligned), loops over heads
in VMEM (all decoder stages use head_dim=32: 128/4 .. 1024/32), and writes
the output back channel-packed — no head transpose, no probability
materialization, nothing but q/k/v/out ever touches HBM.

The training path keeps the head-split kernel pair in
:mod:`tpudepth.ops.pallas.window_attn` (its fused backward is the win there);
dispatch lives in :func:`tpudepth.ops.attention.window_cross_attention_packed`.

Numerics: f32 score accumulation + f32 softmax, dots in the input dtype
(bf16 single-pass MXU in production, HIGHEST for f32 inputs) — same contract
as the training kernel.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_batched(a, b, contract_a, contract_b, prec):
    return jax.lax.dot_general(
        a, b,
        dimension_numbers=(((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _body(q_ref, k_ref, v_ref, bias_ref, out_ref, mask_ref, heads):
    t, n, c = q_ref.shape
    d = c // heads
    dt = q_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    mask = None
    if mask_ref is not None:
        mask = mask_ref[:].astype(jnp.float32)  # [T, N, N]

    outs = []
    for h in range(heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=2)
        kh = jax.lax.slice_in_dim(k, h * d, (h + 1) * d, axis=2)
        vh = jax.lax.slice_in_dim(v, h * d, (h + 1) * d, axis=2)
        s = _dot_batched(qh, kh, 2, 2, prec)  # [T, N, N] f32
        s = s + bias_ref[h].astype(jnp.float32)[None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        outs.append(_dot_batched(p, vh, 2, 1, prec))  # [T, N, D] f32
    out_ref[:] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, heads):
    _body(q_ref, k_ref, v_ref, bias_ref, out_ref, None, heads)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, heads):
    _body(q_ref, k_ref, v_ref, bias_ref, out_ref, mask_ref, heads)


def _pick_tile(bw: int, nw: int, c: int, budget: int = 8 << 20) -> int:
    """Largest window tile dividing bw (and the mask period nw when present)
    whose VMEM block footprint stays under `budget`.

    Footprint per window: 4 channel-packed [N_pad, C] bf16-ish buffers plus
    one f32 [N_pad, 128] score plane live at a time (N=49 pads to 56
    sublanes, scores' minor 49 pads to 128 lanes)."""
    per_window = 56 * (4 * c * 2 + 2 * 128 * 4)
    cap = max(1, min(256, budget // per_window))
    t = 1
    for cand in range(1, cap + 1):
        if bw % cand == 0 and (nw % cand == 0 if nw else True):
            t = cand
    return t


def window_attention_infer(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused channel-packed window attention (inference only, no VJP).

    Args:
      q, k, v: [BW, N, C] with C = heads * head_dim; q pre-scaled.
      bias: [heads, N, N] relative-position bias.
      mask: optional [nW, N, N] additive shift mask; windows are [B, nW]-major.

    Returns: [BW, N, C].
    """
    bw, n, c = q.shape
    heads = bias.shape[0]
    assert c % heads == 0, (c, heads)
    nw = mask.shape[0] if mask is not None else 0
    t = _pick_tile(bw, nw, c)
    grid = (bw // t,)

    qkv_spec = pl.BlockSpec((t, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (heads, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((bw, n, c), q.dtype)
    d = c // heads
    flops = 4 * bw * heads * n * n * d
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=4 * bw * n * c * q.dtype.itemsize,
        transcendentals=bw * heads * n * n,
    )
    params = pltpu.CompilerParams(vmem_limit_bytes=64 << 20)

    if mask is None:
        import functools

        return pl.pallas_call(
            functools.partial(_kernel, heads=heads),
            out_shape=out_shape,
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=qkv_spec,
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(q, k, v, bias)

    import functools

    nblocks = nw // t
    mask_spec = pl.BlockSpec(
        (t, n, n), lambda i: (i % nblocks, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel_masked, heads=heads),
        out_shape=out_shape,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=qkv_spec,
        cost_estimate=cost,
        compiler_params=params,
        interpret=interpret,
    )(q, k, v, bias, mask)
