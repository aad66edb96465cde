"""Fused windowed-attention Pallas TPU kernel.

Computes softmax(q @ k^T + bias [+ shift-mask]) @ v for thousands of
independent 7x7(=49-token) windows in one pass, keeping the [N, N] score
matrices in VMEM instead of round-tripping them through HBM the way the
unfused XLA path must (two dots with a softmax between them cannot fuse).

The op is embarrassingly parallel over (batch x windows x heads) — window
attention in this model family is strictly local (``src/SAM.py:214-229``),
so the grid simply tiles the leading window axis. Numerics match
``tpudepth.ops.attention.window_cross_attention_xla`` (f32 accumulation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Mosaic's tpu.matmul supports at most ONE batch dimension, so (tile, heads)
# is flattened into a single batch axis before the dots and unflattened only
# for the per-head bias / per-window mask adds.
#
# Dots run in the INPUT dtype: bf16 inputs take the native single-pass MXU
# path; f32 inputs use HIGHEST so Mosaic doesn't silently round the operands
# to bf16. Accumulation and softmax are always f32.


def _scores(q, k):
    # q, k: [TH, N, D] -> [TH, N, N] f32
    prec = None if q.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _apply(p, v):
    # p: [TH, N, N] (input dtype), v: [TH, N, D] -> [TH, N, D] f32
    prec = None if v.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        p,
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=prec,
    )


def _softmax(s):
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    # q/k/v: [T, heads, N, D]; bias: [heads, N, N]
    t, heads, n, d = q_ref.shape
    dt = q_ref.dtype
    q = q_ref[:].reshape(t * heads, n, d)
    k = k_ref[:].reshape(t * heads, n, d)
    v = v_ref[:].reshape(t * heads, n, d)
    s = _scores(q, k).reshape(t, heads, n, n)
    s = s + bias_ref[:].astype(jnp.float32)[None]
    p = _softmax(s).reshape(t * heads, n, n).astype(dt)
    o = _apply(p, v)
    out_ref[:] = o.reshape(t, heads, n, d).astype(out_ref.dtype)


def _attn_kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    t, heads, n, d = q_ref.shape
    dt = q_ref.dtype
    q = q_ref[:].reshape(t * heads, n, d)
    k = k_ref[:].reshape(t * heads, n, d)
    v = v_ref[:].reshape(t * heads, n, d)
    s = _scores(q, k).reshape(t, heads, n, n)
    s = s + bias_ref[:].astype(jnp.float32)[None]
    s = s + mask_ref[:].astype(jnp.float32)[:, None]  # [T, 1, N, N]
    p = _softmax(s).reshape(t * heads, n, n).astype(dt)
    o = _apply(p, v)
    out_ref[:] = o.reshape(t, heads, n, d).astype(out_ref.dtype)


def _pick_tile(bw: int, nw: int, heads: int) -> int:
    """Largest window tile that divides bw (and nw when masked) subject to a
    VMEM budget: Mosaic pads [N, D] windows to (56, 128) lane tiles, so cap
    tile * heads so the q/k/v/score blocks stay well under the ~16 MB VMEM."""
    cap = max(1, min(16, 64 // heads))
    for t in range(cap, 0, -1):
        if bw % t == 0 and (nw % t == 0 if nw else True):
            return t
    return 1


def window_attention_pallas(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention over independent windows.

    Args mirror :func:`tpudepth.ops.attention.window_cross_attention_xla`:
      q, k, v: [BW, heads, N, D] (q pre-scaled); bias: [heads, N, N];
      mask: optional [nW, N, N] additive shift mask, BW % nW == 0.
    """
    bw, heads, n, d = q.shape
    nw = mask.shape[0] if mask is not None else 0
    t = _pick_tile(bw, nw, heads)
    grid = (bw // t,)

    qkv_spec = pl.BlockSpec(
        (t, heads, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (heads, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (t, heads, n, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((bw, heads, n, d), q.dtype)
    flops = 4 * bw * heads * n * n * d
    bytes_accessed = (3 * bw * heads * n * d + bw * heads * n * d) * q.dtype.itemsize
    cost = pl.CostEstimate(
        flops=flops, bytes_accessed=bytes_accessed, transcendentals=bw * heads * n * n
    )

    if mask is None:
        return pl.pallas_call(
            _attn_kernel,
            out_shape=out_shape,
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v, bias)

    # Windows are laid out [B, nW]-major, so window-tile i covers mask rows
    # (i*t) % nW ... consecutively (t divides nW by construction).
    nblocks = nw // t
    mask_spec = pl.BlockSpec(
        (t, n, n), lambda i: (i % nblocks, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _attn_kernel_masked,
        out_shape=out_shape,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, bias, mask)


# ---------------------------------------------------------------------------
# Fused Pallas backward: one pass per window tile recomputes the attention
# weights in VMEM and emits dq/dk/dv plus a dbias accumulator — the softmax
# probabilities never round-trip through HBM (the einsum backward materializes
# [BW, H, N, N] three times). The shift mask is a constant (no gradient).
# dbias accumulates across the (sequential) TPU grid into one block.
# ---------------------------------------------------------------------------


def _bwd_body(q_ref, k_ref, v_ref, bias_ref, g_ref,
              dq_ref, dk_ref, dv_ref, dbias_ref, mask_ref=None):
    t, heads, n, d = q_ref.shape
    dt = q_ref.dtype
    q = q_ref[:].reshape(t * heads, n, d)
    k = k_ref[:].reshape(t * heads, n, d)
    v = v_ref[:].reshape(t * heads, n, d)
    g = g_ref[:].reshape(t * heads, n, d)

    s = _scores(q, k).reshape(t, heads, n, n)
    s = s + bias_ref[:].astype(jnp.float32)[None]
    if mask_ref is not None:
        s = s + mask_ref[:].astype(jnp.float32)[:, None]
    p = _softmax(s).reshape(t * heads, n, n)  # f32

    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    pd = p.astype(dt)

    # dv[m, d] = sum_n p[n, m] * g[n, d]
    dv = jax.lax.dot_general(pd, g, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32, precision=prec)
    # dp[n, m] = sum_d g[n, d] * v[m, d]
    dp = jax.lax.dot_general(g, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32, precision=prec)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
    dsd = ds.astype(dt)
    # dq[n, d] = sum_m ds[n, m] * k[m, d]
    dq = jax.lax.dot_general(dsd, k, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32, precision=prec)
    # dk[m, d] = sum_n ds[n, m] * q[n, d]
    dk = jax.lax.dot_general(dsd, q, (((1,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32, precision=prec)

    dq_ref[:] = dq.reshape(t, heads, n, d).astype(dq_ref.dtype)
    dk_ref[:] = dk.reshape(t, heads, n, d).astype(dk_ref.dtype)
    dv_ref[:] = dv.reshape(t, heads, n, d).astype(dv_ref.dtype)

    db = jnp.sum(ds.reshape(t, heads, n, n), axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dbias_ref[:] = db

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dbias_ref[:] = dbias_ref[:] + db


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref):
    _bwd_body(q_ref, k_ref, v_ref, bias_ref, g_ref,
              dq_ref, dk_ref, dv_ref, dbias_ref)


def _bwd_kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, g_ref,
                       dq_ref, dk_ref, dv_ref, dbias_ref):
    _bwd_body(q_ref, k_ref, v_ref, bias_ref, g_ref,
              dq_ref, dk_ref, dv_ref, dbias_ref, mask_ref=mask_ref)


def window_attention_bwd_pallas(q, k, v, bias, mask, g, *, interpret: bool = False):
    """Fused backward: returns (dq, dk, dv, dbias)."""
    bw, heads, n, d = q.shape
    nw = mask.shape[0] if mask is not None else 0
    # the backward keeps ~3x the forward's live VMEM (p, dp, ds) — halve cap
    t = _pick_tile(bw, nw, heads * 2)
    grid = (bw // t,)

    qkv_spec = pl.BlockSpec((t, heads, n, d), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((bw, heads, n, d), q.dtype),
        jax.ShapeDtypeStruct((bw, heads, n, d), k.dtype),
        jax.ShapeDtypeStruct((bw, heads, n, d), v.dtype),
        jax.ShapeDtypeStruct((heads, n, n), jnp.float32),
    )
    out_specs = (qkv_spec, qkv_spec, qkv_spec, bias_spec)
    flops = 12 * bw * heads * n * n * d
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=8 * bw * heads * n * d * q.dtype.itemsize,
        transcendentals=bw * heads * n * n,
    )
    if mask is None:
        return pl.pallas_call(
            _bwd_kernel, out_shape=out_shapes, grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, qkv_spec],
            out_specs=out_specs, cost_estimate=cost, interpret=interpret,
        )(q, k, v, bias, g)
    nblocks = nw // t
    mask_spec = pl.BlockSpec((t, n, n), lambda i: (i % nblocks, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel_masked, out_shape=out_shapes, grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec, qkv_spec],
        out_specs=out_specs, cost_estimate=cost, interpret=interpret,
    )(q, k, v, bias, mask, g)


def _attn_reference_fwd(q, k, v, bias, mask):
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        bw, heads, n, _ = q.shape
        nw = mask.shape[0]
        s = s.reshape(bw // nw, nw, heads, n, n) + mask[None, :, None].astype(jnp.float32)
        s = s.reshape(bw, heads, n, n)
    return jax.nn.softmax(s, axis=-1)


def _xla_fwd(q, k, v, bias, mask):
    p = _attn_reference_fwd(q, k, v, bias, mask)
    out = jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def window_attention(q, k, v, bias, mask=None):
    """Differentiable fused window attention (pallas fwd + fused pallas bwd).

    A/B on v5e (SAM 480x640 bs8, scan differential): in TRAINING the
    all-pallas combination wins (137.6 img/s vs 130.4 pure-XLA vs 127.9 for
    XLA-fwd+pallas-bwd — the f32-HIGHEST einsum forward is the drag); in
    INFERENCE the XLA path wins (398.6 vs 363.7). Dispatch between them is
    trace-time (``tpudepth.ops.attention`` training mode), so eval paths
    never pay for this kernel.
    """
    return window_attention_pallas(q, k, v, bias, mask)


def _wa_fwd(q, k, v, bias, mask):
    out = window_attention_pallas(q, k, v, bias, mask)
    return out, (q, k, v, bias, mask)


def _wa_bwd(res, g):
    q, k, v, bias, mask = res
    if jax.default_backend() == "tpu":
        dq, dk, dv, dbias = window_attention_bwd_pallas(q, k, v, bias, mask, g)
        return dq, dk, dv, dbias.astype(bias.dtype), None
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    p = _attn_reference_fwd(q, k, v, bias, mask)  # [BW, H, N, N] f32
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    dbias = jnp.sum(ds, axis=0)  # broadcast over windows in fwd
    dmask = None
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dmask)


window_attention.defvjp(_wa_fwd, _wa_bwd)
