"""Whole-block fused SAM / NewCRF kernels for INFERENCE (Pallas TPU).

Round 4's kernels fused the attention core (``window_attn_infer.py``) and the
FFN (``mlp_infer.py``) separately; PERF.md round 4 itemized what still
round-trips HBM per block between them: LayerNorm reads/writes, the QK/KV
projection streams (a 2C-wide tensor each way), the output projection, both
residual adds, and the attention q/k/v/out streams stitching the two kernels
together (VERDICT r4 item 3).

These kernels run the ENTIRE transformer block per window tile with every
intermediate in VMEM:

    SAM    (``src/SAM.py:146-244``):      y = x + proj(attn(q(LN(x)) * s,
                                              kv(LN(v)))); out = y + FFN(LN(y))
    NewCRF (``src/newcrf_layers.py:152-257``): y = x + proj(attn(qk(LN(x)),
                                              v_raw [+shift mask])); same FFN

HBM traffic per block collapses to: read x_windows + read v_windows + write
out_windows, plus the grid-invariant VMEM-resident weights. The inputs are
RAW (un-normalized) padded windows — LayerNorm runs in-kernel, and the
``window_valid_mask`` zeroes normalized pad tokens so key/value streams match
the reference's pad-AFTER-LayerNorm semantics bit-for-bit (pad keys are
bias-only). Window partition/reverse and the pad/roll copies remain outside
(cheap relative to the removed streams; see PERF.md round 5).

Numerics per sub-op follow the proven single-op kernels: LayerNorm is flax's
fast-variance f32 formula; dots run in the input dtype with f32 accumulation
(bf16 = native MXU, f32 = HIGHEST); softmax f32; GELU = rational-erf
(``mlp_infer._erf``). Exactness vs the unfused module path is asserted in
tests/test_window_attention.py (CPU interpret) and was verified on-chip.

Inference only (no VJP) — training keeps the fused-backward attention kernel
pair + ``mlp_train``.

MEASURED OUTCOME (round 5, v5e chip, 480x640 bs8): correct (rel-max-err
SAM 2.0e-2 / NewCRF 7.8e-3 vs unfused, bf16-consistent) but SLOWER than the
round-4 attn+FFN kernel pair — SAM 429.9 vs 542.4, NewCRF 274.1 vs 385.0
img/s. The byte cut is real, but every projection/FFN dot here runs per
window on [56, C] operands (M=56 of the MXU's 128 rows, and Mosaic lowers
the [T, N, C] x [C, K] contraction window-by-window), while the round-4
kernels keep projections in flat [rows, C] layout with full-height MXU
tiles: the fused block trades a bandwidth win for a larger compute loss.
Kept as an opt-in (``TPUDEPTH_BLOCK=fused``) quantified negative —
dispatch in ``models/sam.py`` / ``models/newcrf.py`` defaults to the kernel
pair (PERF.md round 5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudepth.ops.pallas.mlp_infer import _gelu_exact


def _ln(xf, scale_ref, bias_ref):
    """flax nn.LayerNorm(eps=1e-5) fast-variance f32 formula
    (flax.linen.normalization._compute_stats/_normalize)."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + 1e-5) * scale_ref[:].astype(jnp.float32)
    return (xf - mu) * mul + bias_ref[:].astype(jnp.float32)


def _proj(x_dt, w_ref, b_ref, prec):
    """[T, N, Cin] @ [Cin, Cout] + b -> f32 [T, N, Cout]."""
    y = jax.lax.dot_general(
        x_dt, w_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    return y + b_ref[:].astype(jnp.float32)


def _dot_batched(a, b, ca, cb, prec):
    return jax.lax.dot_general(
        a, b, (((ca,), (cb,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)


def _attn_core(q, k, v, bias_ref, mask, heads, dt, prec):
    """Channel-packed per-head attention on VMEM values (the
    window_attn_infer._body loop, operating on arrays instead of refs)."""
    t, n, c = q.shape
    d = c // heads
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
    return jnp.concatenate(outs, axis=-1)  # [T, N, C] f32


def _ffn_residual(y, ln2s, ln2b, w1, b1, w2, b2, dt, prec):
    """out = y + fc2(gelu(fc1(LN(y)))) with y f32, hidden in VMEM."""
    yn = _ln(y, ln2s, ln2b).astype(dt)
    h = _proj(yn, w1, b1, prec)
    g = _gelu_exact(h.astype(dt))
    z = _proj(g, w2, b2, prec)
    return y + z


def _sam_kernel(x_ref, v_ref, ln1s, ln1b, lnvs, lnvb, wq, bq, wkv, bkv,
                bias_ref, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
                *rest, heads, scale, has_valid):
    valid_ref = rest[0] if has_valid else None
    out_ref = rest[-1]
    t, n, c = x_ref.shape
    dt = x_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    xf = x_ref[:].astype(jnp.float32)
    xn = _ln(xf, ln1s, ln1b)
    vn = _ln(v_ref[:].astype(jnp.float32), lnvs, lnvb)
    if valid_ref is not None:
        val = valid_ref[:].astype(jnp.float32)  # [T, N, 1]
        xn = xn * val
        vn = vn * val
    q = (_proj(xn.astype(dt), wq, bq, prec) * scale).astype(dt)
    kv = _proj(vn.astype(dt), wkv, bkv, prec)  # [T, N, 2C] f32
    k = jax.lax.slice_in_dim(kv, 0, c, axis=2).astype(dt)
    vv = jax.lax.slice_in_dim(kv, c, 2 * c, axis=2).astype(dt)
    o = _attn_core(q, k, vv, bias_ref, None, heads, dt, prec)
    o = _proj(o.astype(dt), wproj, bproj, prec)
    y = xf + o  # residual with the RAW (pre-LN) tokens, src/SAM.py:231
    out_ref[:] = _ffn_residual(y, ln2s, ln2b, w1, b1, w2, b2, dt, prec
                               ).astype(out_ref.dtype)


def _crf_kernel(x_ref, v_ref, ln1s, ln1b, wqk, bqk, bias_ref, wproj, bproj,
                ln2s, ln2b, w1, b1, w2, b2,
                *rest, heads, scale, has_mask, has_valid):
    i = 0
    mask_ref = None
    valid_ref = None
    if has_mask:
        mask_ref = rest[i]
        i += 1
    if has_valid:
        valid_ref = rest[i]
        i += 1
    out_ref = rest[-1]
    t, n, c = x_ref.shape
    dt = x_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    xf = x_ref[:].astype(jnp.float32)
    xn = _ln(xf, ln1s, ln1b)
    if valid_ref is not None:
        xn = xn * valid_ref[:].astype(jnp.float32)  # [T, N, 1]
    qk = _proj(xn.astype(dt), wqk, bqk, prec)  # [T, N, 2C] f32
    q = (jax.lax.slice_in_dim(qk, 0, c, axis=2) * scale).astype(dt)
    k = jax.lax.slice_in_dim(qk, c, 2 * c, axis=2).astype(dt)
    vv = v_ref[:]  # raw decoder values, NOT normalized (newcrf_layers.py:143)
    mask = mask_ref[:].astype(jnp.float32) if mask_ref is not None else None
    o = _attn_core(q, k, vv, bias_ref, mask, heads, dt, prec)
    o = _proj(o.astype(dt), wproj, bproj, prec)
    y = xf + o
    out_ref[:] = _ffn_residual(y, ln2s, ln2b, w1, b1, w2, b2, dt, prec
                               ).astype(out_ref.dtype)


def _pick_tile(bw: int, nw: int, c: int, hidden: int,
               budget: int = 56 << 20) -> int:
    """Largest window tile dividing bw (and the mask/valid period nw when
    present) under a VMEM budget: ~10 f32 [N_pad, C]-ish planes + the two
    [N_pad, 2C]/[N_pad, hidden] wide tensors per window (N=49 pads to 56
    sublanes), after the resident weights (bf16 in production)."""
    resident = (4 * c * c + 2 * c * hidden) * 2  # q/kv(or qk)/proj + FFN, dt
    per_window = 56 * (10 * c + 2 * 2 * c + 2 * hidden) * 4
    cap = max(1, min(128, max(0, budget - resident) // per_window))
    t = 1
    for cand in range(1, cap + 1):
        if bw % cand == 0 and (nw % cand == 0 if nw else True):
            t = cand
    return t


def block_infer_available(c: int, heads: int, hidden: int) -> bool:
    """Weights (attention projections + FFN) must leave VMEM room for at
    least one window; all decoder stages (C=128..1024, ratio-4 FFN) qualify."""
    resident = (4 * c * c + 2 * c * hidden) * 2  # dt bytes (q/kv/proj + FFN)
    return c % heads == 0 and resident <= 48 << 20


def _specs_1d(n):
    return pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM)


def sam_block_infer(
    xw: jax.Array,
    vw: jax.Array,
    ln1: tuple,
    lnv: tuple,
    wq: jax.Array, bq: jax.Array,
    wkv: jax.Array, bkv: jax.Array,
    bias: jax.Array,
    wproj: jax.Array, bproj: jax.Array,
    ln2: tuple,
    w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
    valid=None,
    *,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Fused SAM block over raw padded windows.

    Args:
      xw, vw: [BW, N, C] RAW (un-normalized) windows; x = decoder/query
        stream, v = encoder stream.
      ln1/lnv/ln2: (scale, bias) f32 LayerNorm params.
      valid: optional [nW, N] 1/0 pad-validity mask (windows [B, nW]-major).
      scale: query scale (head_dim ** -0.5).

    Returns: [BW, N, C] block output (attention + FFN residual chain).
    """
    bw, n, c = xw.shape
    heads = bias.shape[0]
    hidden = w1.shape[1]
    dt = xw.dtype
    nw = valid.shape[0] if valid is not None else 0
    t = _pick_tile(bw, nw, c, hidden)
    grid = (bw // t,)

    win_spec = pl.BlockSpec((t, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full2d = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    inputs = [xw, vw.astype(dt), ln1[0], ln1[1], lnv[0], lnv[1],
              wq.astype(dt), bq, wkv.astype(dt), bkv, bias,
              wproj.astype(dt), bproj, ln2[0], ln2[1],
              w1.astype(dt), b1, w2.astype(dt), b2]
    in_specs = [win_spec, win_spec, _specs_1d(c), _specs_1d(c), _specs_1d(c),
                _specs_1d(c), full2d(c, c), _specs_1d(c), full2d(c, 2 * c),
                _specs_1d(2 * c), bias_spec, full2d(c, c), _specs_1d(c),
                _specs_1d(c), _specs_1d(c), full2d(c, hidden),
                _specs_1d(hidden), full2d(hidden, c), _specs_1d(c)]
    if valid is not None:
        nblocks = nw // t
        # [nW, N, 1]: Mosaic's last-two-dims rule forbids a (t<8, N) block on
        # a [nW, N] array; a trailing size-1 lane dim keeps both legal AND
        # broadcasts directly against [T, N, C] in-kernel.
        inputs.append(jnp.asarray(valid)[:, :, None])
        in_specs.append(pl.BlockSpec((t, n, 1), lambda i: (i % nblocks, 0, 0),
                                     memory_space=pltpu.VMEM))
    flops = 2 * bw * n * c * (c + 2 * c + c + 2 * hidden) \
        + 4 * bw * heads * n * n * (c // heads)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * bw * n * c * dt.itemsize,
        transcendentals=bw * (heads * n * n + n * hidden),
    )
    return pl.pallas_call(
        functools.partial(_sam_kernel, heads=heads, scale=scale,
                          has_valid=valid is not None),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=win_spec,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(*inputs)


def crf_block_infer(
    xw: jax.Array,
    vw: jax.Array,
    ln1: tuple,
    wqk: jax.Array, bqk: jax.Array,
    bias: jax.Array,
    wproj: jax.Array, bproj: jax.Array,
    ln2: tuple,
    w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
    mask: Optional[jax.Array] = None,
    valid=None,
    *,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    """Fused NewCRF block: q,k from LN(x); raw v values; optional shift mask."""
    bw, n, c = xw.shape
    heads = bias.shape[0]
    hidden = w1.shape[1]
    dt = xw.dtype
    nw = 0
    if mask is not None:
        nw = mask.shape[0]
    if valid is not None:
        nw = valid.shape[0] if nw == 0 else nw
        assert mask is None or valid.shape[0] == mask.shape[0]
    t = _pick_tile(bw, nw, c, hidden)
    grid = (bw // t,)

    win_spec = pl.BlockSpec((t, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full2d = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((heads, n, n), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    inputs = [xw, vw.astype(dt), ln1[0], ln1[1], wqk.astype(dt), bqk, bias,
              wproj.astype(dt), bproj, ln2[0], ln2[1],
              w1.astype(dt), b1, w2.astype(dt), b2]
    in_specs = [win_spec, win_spec, _specs_1d(c), _specs_1d(c),
                full2d(c, 2 * c), _specs_1d(2 * c), bias_spec,
                full2d(c, c), _specs_1d(c), _specs_1d(c), _specs_1d(c),
                full2d(c, hidden), _specs_1d(hidden), full2d(hidden, c),
                _specs_1d(c)]
    nblocks = (nw // t) if nw else 1
    if mask is not None:
        inputs.append(mask)
        in_specs.append(pl.BlockSpec((t, n, n), lambda i: (i % nblocks, 0, 0),
                                     memory_space=pltpu.VMEM))
    if valid is not None:
        inputs.append(jnp.asarray(valid)[:, :, None])  # see sam_block_infer
        in_specs.append(pl.BlockSpec((t, n, 1), lambda i: (i % nblocks, 0, 0),
                                     memory_space=pltpu.VMEM))
    flops = 2 * bw * n * c * (2 * c + c + 2 * hidden) \
        + 4 * bw * heads * n * n * (c // heads)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * bw * n * c * dt.itemsize,
        transcendentals=bw * (heads * n * n + n * hidden),
    )
    return pl.pallas_call(
        functools.partial(_crf_kernel, heads=heads, scale=scale,
                          has_mask=mask is not None,
                          has_valid=valid is not None),
        out_shape=jax.ShapeDtypeStruct((bw, n, c), dt),
        grid=grid,
        in_specs=in_specs,
        out_specs=win_spec,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(*inputs)
