#!/usr/bin/env python
"""Feasibility experiment: window-row spatial-index-map kernel (round 5).

Question: can a Mosaic kernel read a (1, ws, Wp, C) block straight out of an
image-layout [B, Hp, Wp, C] tensor, reshape it in VMEM to [nW, N, C] windows
(N = ws*ws), run the batched per-window score dots, and write the block back
— and is the relayout cheap enough to beat the XLA window_partition copies?

Three sub-questions, each timed with the scan differential:
  1. does reshape (ws, Wp, C) -> (ws*Wp, C) lower (flat rows for projections)?
  2. does the windowize relayout (ws, Wp, C) -> (nW, N, C) lower?
  3. end-to-end: LN + qk proj (flat) + windowize + attention + merge + write,
     vs the current partition -> kernel -> reverse chain.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")
from tpudepth.core.runtime import apply_platform_override

apply_platform_override()

WS = 7
B, H, W, C = 8, 120, 160, 128
HP = ((H + WS - 1) // WS) * WS  # 126
WP = ((W + WS - 1) // WS) * WS  # 161
NH, NW = HP // WS, WP // WS
N = WS * WS
HEADS = 4


def timeit(fn, x, k1=4, k2=12):
    def many(x, k):
        def body(c, _):
            return fn(c), None
        y, _ = jax.lax.scan(body, x, None, length=k)
        return y
    f1 = jax.jit(lambda xx: many(xx, k1))
    f2 = jax.jit(lambda xx: many(xx, k2))
    r1 = np.asarray(f1(x)).sum()
    r2 = np.asarray(f2(x)).sum()  # warm
    t = []
    for f, k in ((f1, k1), (f2, k2)):
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(f(x)).sum()
        t.append((time.perf_counter() - t0) / 3)
    return (t[1] - t[0]) / (k2 - k1) * 1e3  # ms per call


def k_flat(x_ref, w_ref, o_ref):
    x = x_ref[0]  # [WS, WP, C]
    xf = x.reshape(WS * WP, C)
    y = jax.lax.dot_general(xf, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype).reshape(WS, WP, C)


def k_windowize(x_ref, o_ref):
    x = x_ref[0]  # [WS, WP, C]
    wnd = x.reshape(WS, NW, WS, C).transpose(1, 0, 2, 3).reshape(NW, N, C)
    # merge back
    back = wnd.reshape(NW, WS, WS, C).transpose(1, 0, 2, 3).reshape(WS, WP, C)
    o_ref[0] = back


def k_full(x_ref, w_ref, o_ref):
    x = x_ref[0]
    xf = x.reshape(WS * WP, C).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)
    q = jax.lax.dot_general(xn, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(x.dtype)
    wnd = q.reshape(WS, NW, WS, C).transpose(1, 0, 2, 3).reshape(NW, N, C)
    d = C // HEADS
    outs = []
    for h in range(HEADS):
        qh = jax.lax.slice_in_dim(wnd, h * d, (h + 1) * d, axis=2)
        s = jax.lax.dot_general(qh, qh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
        outs.append(jax.lax.dot_general(p, qh, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1).astype(x.dtype)  # [NW, N, C]
    back = o.reshape(NW, WS, WS, C).transpose(1, 0, 2, 3).reshape(WS, WP, C)
    o_ref[0] = back.astype(o_ref.dtype)


def run(name, kernel, with_w):
    x = jnp.asarray(np.random.randn(B, HP, WP, C), jnp.bfloat16)
    w = jnp.asarray(np.random.randn(C, C) * 0.05, jnp.bfloat16)
    blk = pl.BlockSpec((1, WS, WP, C), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((C, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [blk, wspec] if with_w else [blk]
    args = (w,) if with_w else ()

    def call(xx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, HP, WP, C), jnp.bfloat16),
            grid=(B, NH),
            in_specs=in_specs,
            out_specs=blk,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 << 20),
        )(xx, *args)

    try:
        ms = timeit(call, x)
        print(f"{name}: OK  {ms:.3f} ms")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run("flat-rows reshape + dot", k_flat, True)
    run("windowize relayout roundtrip", k_windowize, False)
    run("full: LN+proj+windowize+attn+merge", k_full, True)
