"""Window-ROW fused SAM / NewCRF block kernels for INFERENCE (Pallas TPU).

Third design point in the block-fusion series, fixing both earlier losses:

- ``block_infer.py`` (whole-block, per-window tiles) removed the inter-kernel
  HBM streams but ran every projection/FFN dot on [56, C] operands — per-
  window MXU starvation made it a measured regression (PERF.md round 5).
- ``window_attn_infer.py`` + ``epilogue_infer.py`` (the round-4/5 default
  pair) keep projections flat but leave the ``window_partition`` /
  ``window_reverse`` layout copies and the q/k/v/out + LN1 streams in HBM —
  xplane attribution put those copy fusions at 38% of the NewCRF eval step
  (PERF.md round 5).

This kernel reads a whole WINDOW ROW — block (1, ws, Wp, C) straight out of
the image-layout [B, H, W, C] tensor via spatial BlockSpec index maps — and
runs the ENTIRE transformer block on it:

    LN1 (+ LNv for SAM) -> qk/q/kv projections     [flat (ws*Wp, C) rows]
    -> windowize relayout (VMEM only)              [(nW, N, C), N = ws*ws]
    -> per-head window attention (+bias, +shift mask)
    -> merge relayout (VMEM only)                  [(ws*Wp, C)]
    -> out-proj -> residual -> LN2 -> FFN -> residual  [flat rows]

All projections and the FFN see flat (ws*Wp, C) operands (full MXU tiles);
only the tiny score dots run per window, exactly like the proven
``window_attn_infer`` kernel. The window partition/reverse relayouts happen
in VMEM (sublane shuffles) instead of HBM round-trips. Per block, HBM
traffic collapses to: read x row, read v row, write out row, plus the
grid-invariant resident weights.

Padding semantics (parity with ``src/SAM.py:214-231`` /
``src/newcrf_layers.py:219-246``, which LayerNorm FIRST and zero-pad the
normalized tensor): the caller zero-pads the RAW tensors to window multiples
(Mosaic's block-shape rule requires the minor-two block dims to equal the
array dims, so spatial blocks can only be read from window-multiple arrays;
the pad is ONE fused XLA copy per input vs the partition relayout + stream
copies this kernel removes) and a [Hp, Wp] validity image drives ``where``
selects so that normalized pad tokens are exactly zero before the q/k/kv
projections, making pad-token keys bias-only — bit-matching the reference's
pad-AFTER-LayerNorm. Raw NewCRF values are zeroed the same way (the
reference pads v with zeros). Pad-position OUTPUT rows are garbage (raw-pad
residuals flow through LN2/FFN) and are cropped by the caller.

Shifted NewCRF blocks (SW-MSA): the caller materializes the padded+rolled
[B, Hp, Wp, C] tensors in XLA (one fused pad+roll copy each — the roll's
wrap-around is not expressible as a block index map), the kernel adds the
per-window-row slice of the precomputed [nW, N, N] shift mask, and the
caller unrolls + crops the padded output. The residual / LN2 / FFN are
per-token so running them in rolled coordinates is value-identical.

Numerics per sub-op match the proven kernels bit-for-bit: LayerNorm is
flax's fast-variance f32 formula; dots run in the input dtype with f32
accumulation (bf16 = native MXU, f32 = HIGHEST); softmax f32; GELU =
rational-erf (``mlp_infer``). Inference only (no VJP) — training keeps the
fused-backward attention kernel pair + ``mlp_train``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpudepth.ops.pallas.block_infer import _ln
from tpudepth.ops.pallas.mlp_infer import _gelu_exact


def _roundup(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flat_proj(x_dt, w_ref, b_ref, prec):
    """[M, Cin] @ [Cin, Cout] + b -> f32 [M, Cout] (full-height MXU tiles)."""
    y = jax.lax.dot_general(
        x_dt, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    return y + b_ref[:].astype(jnp.float32)


def _windowize(t, ws: int, nww: int, c: int, r: int = 1):
    """[r*ws*Wp, C] flat rows -> [r*nW, N, C] window tokens (VMEM relayout).
    For r > 1 (multiple window rows per block) each sub-row is relayouted
    separately and concatenated along the window-batch dim — Mosaic handles
    the rank-4 transpose; a rank-5 version is not attempted."""
    if r == 1:
        return (t.reshape(ws, nww, ws, c).transpose(1, 0, 2, 3)
                .reshape(nww, ws * ws, c))
    m = ws * nww * ws
    parts = [
        _windowize(jax.lax.slice_in_dim(t, i * m, (i + 1) * m, axis=0),
                   ws, nww, c)
        for i in range(r)
    ]
    return jnp.concatenate(parts, axis=0)


def _merge(t, ws: int, nww: int, c: int, r: int = 1):
    """[r*nW, N, C] -> [r*ws*Wp, C] flat rows (inverse of _windowize)."""
    if r == 1:
        return (t.reshape(nww, ws, ws, c).transpose(1, 0, 2, 3)
                .reshape(ws * nww * ws, c))
    parts = [
        _merge(jax.lax.slice_in_dim(t, i * nww, (i + 1) * nww, axis=0),
               ws, nww, c)
        for i in range(r)
    ]
    return jnp.concatenate(parts, axis=0)


def _attn_core(q, k, v, bias_ref, mask, heads, dt, prec):
    """Per-head channel-packed window attention on VMEM values
    (``window_attn_infer._body``'s loop on arrays)."""
    t, n, c = q.shape
    d = c // heads
    outs = []
    for h in range(heads):
        qh = jax.lax.slice_in_dim(q, h * d, (h + 1) * d, axis=2)
        kh = jax.lax.slice_in_dim(k, h * d, (h + 1) * d, axis=2)
        vh = jax.lax.slice_in_dim(v, h * d, (h + 1) * d, axis=2)
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32,
                                precision=prec)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        if mask is not None:
            s = s + mask
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        outs.append(jax.lax.dot_general(p, vh, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32,
                                        precision=prec))
    return jnp.concatenate(outs, axis=-1)  # [T, N, C] f32


def _epilogue(xf_dt, o_f32, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
              dt, prec):
    """proj -> residual -> LN2 -> FFN -> residual on flat [M, C] rows
    (``epilogue_infer._kernel``'s math on arrays)."""
    z = _flat_proj(o_f32.astype(dt), wproj, bproj, prec)
    y = xf_dt + z.astype(dt)  # dt add, as the unfused residual
    yn = _ln(y.astype(jnp.float32), ln2s, ln2b).astype(dt)
    h = _flat_proj(yn, w1, b1, prec)
    g = _gelu_exact(h.astype(dt))
    m = _flat_proj(g, w2, b2, prec)
    return y + m.astype(dt)


def _crf_kernel(x_ref, v_ref, valid_ref, ln1s, ln1b, wqk, bqk, bias_ref,
                wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
                *rest, heads, scale, ws, nww, has_mask, r=1):
    mask_ref = rest[0] if has_mask else None
    out_ref = rest[-1]
    _, _, wp, c = x_ref.shape
    m = r * ws * wp
    dt = x_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    # [M, 1] f32 1/0; multiplicative lane-broadcast only (Mosaic has no
    # `where` lane broadcast). Inputs are genuinely zero-padded by the
    # caller, so LN(0-row) = bias and the multiply restores the exact-zero
    # pad tokens the reference's pad-after-LN produces; raw v pads are
    # already exactly zero.
    valid = valid_ref[:].reshape(m, 1)
    x = x_ref[0].reshape(m, c)
    vv = v_ref[0].reshape(m, c)

    xf = x.astype(jnp.float32)
    xn = _ln(xf, ln1s, ln1b) * valid  # pad tokens exactly 0 pre-projection
    qk = _flat_proj(xn.astype(dt), wqk, bqk, prec)  # [M, 2C] f32
    q = (jax.lax.slice_in_dim(qk, 0, c, axis=1) * scale).astype(dt)
    k = jax.lax.slice_in_dim(qk, c, 2 * c, axis=1).astype(dt)

    q3 = _windowize(q, ws, nww, c, r)
    k3 = _windowize(k, ws, nww, c, r)
    v3 = _windowize(vv.astype(dt), ws, nww, c, r)
    mask = mask_ref[:].astype(jnp.float32) if mask_ref is not None else None
    o = _attn_core(q3, k3, v3, bias_ref, mask, heads, dt, prec)
    of = _merge(o, ws, nww, c, r)  # [M, C] f32

    out = _epilogue(x, of, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2, dt, prec)
    out_ref[0] = out.reshape(r * ws, wp, c).astype(out_ref.dtype)


def _sam_kernel(x_ref, v_ref, valid_ref, ln1s, ln1b, lnvs, lnvb, wq, bq,
                wkv, bkv, bias_ref, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
                out_ref, *, heads, scale, ws, nww):
    _, _, wp, c = x_ref.shape
    m = ws * wp
    dt = x_ref.dtype
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST

    valid = valid_ref[:].reshape(m, 1)  # see _crf_kernel note
    x = x_ref[0].reshape(m, c)
    vv = v_ref[0].reshape(m, c)

    xf = x.astype(jnp.float32)
    xn = _ln(xf, ln1s, ln1b) * valid
    vn = _ln(vv.astype(jnp.float32), lnvs, lnvb) * valid
    q = (_flat_proj(xn.astype(dt), wq, bq, prec) * scale).astype(dt)
    kv = _flat_proj(vn.astype(dt), wkv, bkv, prec)  # [M, 2C] f32
    k = jax.lax.slice_in_dim(kv, 0, c, axis=1).astype(dt)
    vvp = jax.lax.slice_in_dim(kv, c, 2 * c, axis=1).astype(dt)

    o = _attn_core(_windowize(q, ws, nww, c), _windowize(k, ws, nww, c),
                   _windowize(vvp, ws, nww, c), bias_ref, None, heads, dt,
                   prec)
    of = _merge(o, ws, nww, c)

    out = _epilogue(x, of, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2, dt, prec)
    out_ref[0] = out.reshape(ws, wp, c).astype(out_ref.dtype)


def _valid_image(h: int, w: int, hp: int, wp: int, shift: int) -> np.ndarray:
    """[Hp, Wp] 1/0 validity map of real (non-pad) pixels, post-roll."""
    v = np.zeros((hp, wp), np.float32)
    v[:h, :w] = 1.0
    if shift:
        v = np.roll(v, (-shift, -shift), axis=(0, 1))
    return v


def rowblock_available(c: int, heads: int, hidden: int, wp: int,
                       itemsize: int = 2) -> bool:
    """Resident weights + one window-row of f32 intermediates must fit VMEM;
    every SAM/NewCRF decoder stage at the supported resolutions qualifies."""
    weights = (4 * c * c + 2 * c * hidden) * itemsize
    m = 7 * wp
    rows = m * (4 * c + hidden) * 4  # qk/hidden f32 + windowized dt copies
    return c % heads == 0 and weights + rows <= 100 << 20


def _specs_1d(n):
    return pl.BlockSpec((n,), lambda b, i: (0,), memory_space=pltpu.VMEM)


def _pick_rows(nh: int, ws: int, wp: int, c: int, hidden: int,
               budget: int = 40 << 20) -> int:
    """Window rows per program: amortizes per-program overhead and widens
    the flat-M dots; bounded by a VMEM budget on the f32 intermediates and
    by dividing nh."""
    per_row = ws * wp * (6 * c + 2 * hidden) * 4
    cap = max(1, budget // max(per_row, 1))
    r = 1
    for cand in range(1, min(cap, nh) + 1):
        if nh % cand == 0:
            r = cand
    return r


def _common_specs(b, hg, wg, c, ws, hp, wp, heads, n, r=1):
    img = pl.BlockSpec((1, r * ws, wp, c), lambda bb, i: (bb, i, 0, 0),
                       memory_space=pltpu.VMEM)
    # [Hp, Wp, 1]: the trailing size-1 lane dim keeps the in-kernel reshape
    # to [M, 1] a pure major-merge (minor dim unchanged) and broadcasts
    # directly against [M, C].
    valid = pl.BlockSpec((r * ws, wp, 1), lambda bb, i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((heads, n, n), lambda bb, i: (0, 0, 0),
                        memory_space=pltpu.VMEM)
    full2d = lambda a, bdim: pl.BlockSpec((a, bdim), lambda bb, i: (0, 0),
                                          memory_space=pltpu.VMEM)
    return img, valid, bias, full2d


def crf_rowblock_infer(
    x: jax.Array,
    v: jax.Array,
    ln1: tuple,
    wqk: jax.Array, bqk: jax.Array,
    bias: jax.Array,
    wproj: jax.Array, bproj: jax.Array,
    ln2: tuple,
    w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    scale: float,
    window_size: int = 7,
    valid_hw: Optional[tuple] = None,
    rows_per_block: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused NewCRF block over image-layout window rows.

    Args:
      x: [B, Hp, Wp, C] RAW decoder/unary stream, zero-padded to window
        multiples (and cyclically rolled for shifted blocks, with the
        [nW, N, N] shift ``mask``).
      v: [B, Hp, Wp, C] RAW values (NOT normalized), same geometry as x.
      valid_hw: (h, w, shift) true-content geometry for the validity image;
        defaults to (Hp, Wp, 0) (no padding anywhere).

    Returns: [B, Hp, Wp, C] block output (pad positions garbage — crop).
    """
    b, hg, wg, c = x.shape
    ws = window_size
    n = ws * ws
    heads = bias.shape[0]
    hidden = w1.shape[1]
    dt = x.dtype
    assert hg % ws == 0 and wg % ws == 0, (hg, wg, ws)
    hp, wp = hg, wg
    nh, nww = hp // ws, wp // ws
    h0, w0, shift = valid_hw if valid_hw is not None else (hg, wg, 0)
    vimg = jnp.asarray(_valid_image(h0, w0, hp, wp, shift)[:, :, None])

    import os

    r = (rows_per_block
         or int(os.environ.get("TPUDEPTH_ROWBLOCK_R", "0"))
         or _pick_rows(nh, ws, wp, c, hidden))
    assert nh % r == 0, (nh, r)

    img, valid, bias_s, full2d = _common_specs(b, hg, wg, c, ws, hp, wp,
                                               heads, n, r)
    inputs = [x, v.astype(dt), vimg, ln1[0], ln1[1], wqk.astype(dt), bqk,
              bias, wproj.astype(dt), bproj, ln2[0], ln2[1],
              w1.astype(dt), b1, w2.astype(dt), b2]
    in_specs = [img, img, valid, _specs_1d(c), _specs_1d(c),
                full2d(c, 2 * c), _specs_1d(2 * c), bias_s, full2d(c, c),
                _specs_1d(c), _specs_1d(c), _specs_1d(c),
                full2d(c, hidden), _specs_1d(hidden), full2d(hidden, c),
                _specs_1d(c)]
    if mask is not None:
        assert mask.shape[0] == nh * nww, (mask.shape, nh, nww)
        inputs.append(mask)
        in_specs.append(pl.BlockSpec((r * nww, n, n),
                                     lambda bb, i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    m_tot = b * hp * wp
    flops = 2 * m_tot * c * (2 * c + c + 2 * hidden) \
        + 4 * m_tot * heads * n * (c // heads)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * b * hg * wg * c * dt.itemsize,
        transcendentals=m_tot * (heads * n + hidden),
    )
    return pl.pallas_call(
        functools.partial(_crf_kernel, heads=heads, scale=scale, ws=ws,
                          nww=nww, has_mask=mask is not None, r=r),
        out_shape=jax.ShapeDtypeStruct((b, hg, wg, c), dt),
        grid=(b, nh // r),
        in_specs=in_specs,
        out_specs=img,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 << 20),
        interpret=interpret,
    )(*inputs)


def sam_rowblock_infer(
    x: jax.Array,
    v: jax.Array,
    ln1: tuple,
    lnv: tuple,
    wq: jax.Array, bq: jax.Array,
    wkv: jax.Array, bkv: jax.Array,
    bias: jax.Array,
    wproj: jax.Array, bproj: jax.Array,
    ln2: tuple,
    w1: jax.Array, b1: jax.Array, w2: jax.Array, b2: jax.Array,
    *,
    scale: float,
    window_size: int = 7,
    valid_hw: Optional[tuple] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused SAM block over image-layout window rows (q from LN(x),
    k/v from LN(v); never shifted). x, v: [B, Hp, Wp, C] RAW, zero-padded
    to window multiples; ``valid_hw`` = true (h, w) content extent."""
    b, hg, wg, c = x.shape
    ws = window_size
    n = ws * ws
    heads = bias.shape[0]
    hidden = w1.shape[1]
    dt = x.dtype
    assert hg % ws == 0 and wg % ws == 0, (hg, wg, ws)
    hp, wp = hg, wg
    nh, nww = hp // ws, wp // ws
    h0, w0 = valid_hw if valid_hw is not None else (hg, wg)
    vimg = jnp.asarray(_valid_image(h0, w0, hp, wp, 0)[:, :, None])

    img, valid, bias_s, full2d = _common_specs(b, hg, wg, c, ws, hp, wp,
                                               heads, n)
    inputs = [x, v.astype(dt), vimg, ln1[0], ln1[1], lnv[0], lnv[1],
              wq.astype(dt), bq, wkv.astype(dt), bkv, bias,
              wproj.astype(dt), bproj, ln2[0], ln2[1],
              w1.astype(dt), b1, w2.astype(dt), b2]
    in_specs = [img, img, valid, _specs_1d(c), _specs_1d(c), _specs_1d(c),
                _specs_1d(c), full2d(c, c), _specs_1d(c), full2d(c, 2 * c),
                _specs_1d(2 * c), bias_s, full2d(c, c), _specs_1d(c),
                _specs_1d(c), _specs_1d(c), full2d(c, hidden),
                _specs_1d(hidden), full2d(hidden, c), _specs_1d(c)]
    m_tot = b * hp * wp
    flops = 2 * m_tot * c * (c + 2 * c + c + 2 * hidden) \
        + 4 * m_tot * heads * n * (c // heads)
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=3 * b * hg * wg * c * dt.itemsize,
        transcendentals=m_tot * (heads * n + hidden),
    )
    return pl.pallas_call(
        functools.partial(_sam_kernel, heads=heads, scale=scale, ws=ws,
                          nww=nww),
        out_shape=jax.ShapeDtypeStruct((b, hg, wg, c), dt),
        grid=(b, nh),
        in_specs=in_specs,
        out_specs=img,
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 << 20),
        interpret=interpret,
    )(*inputs)
