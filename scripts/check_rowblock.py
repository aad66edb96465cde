#!/usr/bin/env python
"""Interpret-mode exactness check: rowblock_infer vs the unfused composition.

Mirrors the unfused CRFBlock/SAMBlock math (LN -> pad -> roll -> partition ->
projections -> attention -> reverse -> unroll -> crop -> proj -> residual ->
LN2 -> FFN -> residual) in plain jnp at f32, and asserts the window-row
kernel (interpret mode) reproduces it.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("TPUDEPTH_PLATFORM", "cpu")

import jax

from tpudepth.core.runtime import apply_platform_override

apply_platform_override()

import jax.numpy as jnp
import numpy as np

from tpudepth.ops.window import (
    pad_to_window_multiple,
    shifted_window_attention_mask,
    window_partition,
    window_reverse,
)
from tpudepth.ops.attention import window_cross_attention_xla, _to_heads, _from_heads
from tpudepth.ops.pallas.rowblock_infer import crf_rowblock_infer, sam_rowblock_infer

WS = 7


def _ln_ref(x, s, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * s + b


def _ffn_ref(y, ln2, w1, b1, w2, b2):
    yn = _ln_ref(y, ln2[0], ln2[1])
    h = yn @ w1 + b1
    g = 0.5 * h * (1.0 + jax.lax.erf(h * (2 ** -0.5)))
    return y + (g @ w2 + b2)


def ref_crf(x, v, ln1, wqk, bqk, bias, wproj, bproj, ln2, w1, b1, w2, b2,
            scale, ss):
    b, h, w, c = x.shape
    heads = bias.shape[0]
    xn = _ln_ref(x, ln1[0], ln1[1])
    xn, hp, wp = pad_to_window_multiple(xn, WS)
    vp, _, _ = pad_to_window_multiple(v, WS)
    mask = None
    if ss:
        xn = jnp.roll(xn, (-ss, -ss), axis=(1, 2))
        vp = jnp.roll(vp, (-ss, -ss), axis=(1, 2))
        mask = jnp.asarray(shifted_window_attention_mask(h, w, WS, ss))
    xw = window_partition(xn, WS).reshape(-1, WS * WS, c)
    vw = window_partition(vp, WS).reshape(-1, WS * WS, c)
    qk = xw @ wqk + bqk
    q, k = jnp.split(qk, 2, axis=-1)
    q = q * scale
    o = window_cross_attention_xla(_to_heads(q, heads), _to_heads(k, heads),
                                   _to_heads(vw, heads), bias, mask)
    o = _from_heads(o)
    o = window_reverse(o.reshape(-1, WS, WS, c), WS, hp, wp)
    if ss:
        o = jnp.roll(o, (ss, ss), axis=(1, 2))
    o = o[:, :h, :w, :]
    y = x + (o @ wproj + bproj)
    return _ffn_ref(y, ln2, w1, b1, w2, b2)


def ref_sam(x, v, ln1, lnv, wq, bq, wkv, bkv, bias, wproj, bproj, ln2,
            w1, b1, w2, b2, scale):
    b, h, w, c = x.shape
    heads = bias.shape[0]
    xn = _ln_ref(x, ln1[0], ln1[1])
    vn = _ln_ref(v, lnv[0], lnv[1])
    xn, hp, wp = pad_to_window_multiple(xn, WS)
    vn, _, _ = pad_to_window_multiple(vn, WS)
    xw = window_partition(xn, WS).reshape(-1, WS * WS, c)
    vw = window_partition(vn, WS).reshape(-1, WS * WS, c)
    q = (xw @ wq + bq) * scale
    kv = vw @ wkv + bkv
    k, vv = jnp.split(kv, 2, axis=-1)
    o = window_cross_attention_xla(_to_heads(q, heads), _to_heads(k, heads),
                                   _to_heads(vv, heads), bias, None)
    o = _from_heads(o)
    o = window_reverse(o.reshape(-1, WS, WS, c), WS, hp, wp)[:, :h, :w, :]
    y = x + (o @ wproj + bproj)
    return _ffn_ref(y, ln2, w1, b1, w2, b2)


def main():
    rng = np.random.default_rng(0)
    for (h, w, c, heads) in [(15, 20, 64, 2), (12, 16, 128, 4)]:
        hidden = 4 * c
        f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
        x = f(2, h, w, c) * 0.5
        v = f(2, h, w, c) * 0.5
        ln1 = (f(c) * 0.1 + 1.0, f(c) * 0.1)
        lnv = (f(c) * 0.1 + 1.0, f(c) * 0.1)
        ln2 = (f(c) * 0.1 + 1.0, f(c) * 0.1)
        wqk, bqk = f(c, 2 * c) * 0.05, f(2 * c) * 0.05
        wq, bq = f(c, c) * 0.05, f(c) * 0.05
        wkv, bkv = f(c, 2 * c) * 0.05, f(2 * c) * 0.05
        wproj, bproj = f(c, c) * 0.05, f(c) * 0.05
        w1, b1 = f(c, hidden) * 0.05, f(hidden) * 0.05
        w2, b2 = f(hidden, c) * 0.05, f(c) * 0.05
        bias = f(heads, 49, 49) * 0.2
        scale = (c // heads) ** -0.5

        # --- CRF, shift 0 ---
        want = ref_crf(x, v, ln1, wqk, bqk, bias, wproj, bproj, ln2,
                       w1, b1, w2, b2, scale, 0)
        xp0, _, _ = pad_to_window_multiple(x, WS)
        vp0, _, _ = pad_to_window_multiple(v, WS)
        got = crf_rowblock_infer(xp0, vp0, ln1, wqk, bqk, bias, wproj, bproj,
                                 ln2, w1, b1, w2, b2, None, scale=scale,
                                 valid_hw=(h, w, 0),
                                 interpret=True)[:, :h, :w, :]
        err = float(jnp.max(jnp.abs(want - got)) / jnp.max(jnp.abs(want)))
        print(f"crf s0  {h}x{w} c{c}: rel {err:.2e}")
        assert err < 2e-5, err

        # --- CRF, shifted ---
        ss = WS // 2
        want = ref_crf(x, v, ln1, wqk, bqk, bias, wproj, bproj, ln2,
                       w1, b1, w2, b2, scale, ss)
        xp, hp, wp = pad_to_window_multiple(x, WS)
        vp, _, _ = pad_to_window_multiple(v, WS)
        xr = jnp.roll(xp, (-ss, -ss), axis=(1, 2))
        vr = jnp.roll(vp, (-ss, -ss), axis=(1, 2))
        mask = jnp.asarray(shifted_window_attention_mask(h, w, WS, ss))
        got_r = crf_rowblock_infer(xr, vr, ln1, wqk, bqk, bias, wproj, bproj,
                                   ln2, w1, b1, w2, b2, mask, scale=scale,
                                   valid_hw=(h, w, ss), interpret=True)
        got = jnp.roll(got_r, (ss, ss), axis=(1, 2))[:, :h, :w, :]
        err = float(jnp.max(jnp.abs(want - got)) / jnp.max(jnp.abs(want)))
        print(f"crf s{ss} {h}x{w} c{c}: rel {err:.2e}")
        assert err < 2e-5, err

        # --- SAM ---
        want = ref_sam(x, v, ln1, lnv, wq, bq, wkv, bkv, bias, wproj, bproj,
                       ln2, w1, b1, w2, b2, scale)
        got = sam_rowblock_infer(xp0, vp0, ln1, lnv, wq, bq, wkv, bkv, bias,
                                 wproj, bproj, ln2, w1, b1, w2, b2,
                                 scale=scale, valid_hw=(h, w),
                                 interpret=True)[:, :h, :w, :]
        err = float(jnp.max(jnp.abs(want - got)) / jnp.max(jnp.abs(want)))
        print(f"sam     {h}x{w} c{c}: rel {err:.2e}")
        assert err < 2e-5, err
    print("OK")


if __name__ == "__main__":
    main()
