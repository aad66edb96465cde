"""Fused packed-GUB conv kernels: (BN-apply + ReLU [+skip]) -> KxK conv ->
bias [-> BN-stat accumulate], forward and analytic VJP, as Pallas TPU
kernels.

Why (PERF.md round 3): GuideDepth training sits at the HBM roofline (98.9%
of v5e peak bandwidth at 8% of FLOP peak), so the remaining cost is BYTES:
(a) XLA:TPU layout assignment wraps the packed-stage convs in
{1,3,2,0}<->{3,0,2,1} relayout copies (~18 ms/step) that are unreachable
from JAX (the custom-VJP conv experiment produced bit-identical HLO), and
(b) every BN-normalized activation is materialized to HBM and every conv
output is re-read for batch statistics. Replacing the stage's convs with
Mosaic custom calls removes the conv emitter from the region entirely (the
remaining XLA ops are elementwise/reductions that keep standard layouts),
and folding the BN prelude + stat epilogue into the conv kernels means each
intermediate is written once and read once:

    y_raw, sum(y), sum(y^2) = conv(relu(x_raw * A + C) [+ skip], w) + b

where ``A = rsqrt(var + eps) * gamma [* se]`` and ``C = beta - mean * A``
are per-(batch, channel) vectors computed in f32 from the PREVIOUS kernel's
emitted statistics (tiny jnp math outside the kernel, so autodiff handles
the BN-statistics and SE chain rules automatically). The normalized/activated
tensors never exist in HBM, in either the forward or the backward pass.

Implements the packed execution (tpudepth/ops/packed.py) of the reference's
Guided Upsampling Block convs, ``src/GuideDepth/model/modules.py:42-100``.

Conventions:
- NHWC, single batch item per grid step (full spatial extent in VMEM),
  optional channel-block grid splits to bound VMEM.
- Multi-input "parts": a conv over a channel concat is computed as the sum
  of per-part convs (conv(concat(x1,x2), w) == conv(x1, w[:c1]) +
  conv(x2, w[c1:])), so the concat itself is never materialized.
- Weights/bias enter in f32 (param dtype) and are cast to the compute dtype
  inside the kernel; their cotangents accumulate and return in f32.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's scoped-vmem accounting runs ~10-15% above these value-level
# estimates (measured on the c256 dx kernel: est 108M, actual 122.75M), so
# target well below the 112MB limit passed to the compiler.
_VMEM_TARGET = 76 * 1024 * 1024


class _Cfg(NamedTuple):
    k: int
    bsz: int
    h: int
    w: int
    cins: Tuple[int, ...]
    cout: int
    prelude: bool
    skip: bool
    stats: bool
    dt: str          # activation / IO dtype (e.g. 'bfloat16' or 'float32')
    interpret: bool


def _dtype(cfg: _Cfg):
    return jnp.dtype(cfg.dt)


def _isz(cfg: _Cfg) -> int:
    return _dtype(cfg).itemsize


def _pick_split(total: int, per_block_bytes, limit: int = _VMEM_TARGET) -> int:
    """Smallest split of the ``total`` channels whose per_block_bytes fits
    the limit. Split blocks must stay lane-aligned (multiples of 128) —
    Mosaic requires minor block dims to be 128-divisible or full — so
    non-128-multiple channel counts never split (they are small)."""
    best = 1
    for s in (1, 2, 4, 8, 16):
        if total % s == 0 and (s == 1 or (total // s) % 128 == 0):
            best = s
            if per_block_bytes(s) <= limit:
                return s
    return best


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_split(cfg: _Cfg) -> int:
    # grid-varying HBM blocks are double-buffered by Mosaic's pipeline (2x)
    hw = cfg.h * cfg.w
    cin = sum(cfg.cins)
    isz = _isz(cfg)

    def bytes_at(s):
        co = cfg.cout // s
        pad = 2 * (cfg.k // 2)
        return (
            2 * hw * cin * isz                  # input blocks
            + (cfg.h + pad) * (cfg.w + pad) * cin * isz   # padded copies
            + hw * cin * 4                      # f32 prelude transient
            + hw * co * 4                       # f32 accumulator
            + 2 * hw * co * isz                 # output block
            + 2 * cfg.k * cfg.k * cin * co * (4 + isz)  # weights (f32 + cast)
            + (2 * hw * cin * isz if cfg.skip else 0)
        )

    return _pick_split(cfg.cout, bytes_at)


def _pad2d(xa, k):
    """Zero-pad H and W by k//2 (value-level concat; k in {1, 3})."""
    if k == 1:
        return xa
    h, w, c = xa.shape
    zrow = jnp.zeros((1, w, c), xa.dtype)
    xa = jnp.concatenate([zrow, xa, zrow], axis=0)
    zcol = jnp.zeros((h + 2, 1, c), xa.dtype)
    return jnp.concatenate([zcol, xa, zcol], axis=1)


def _apply_prelude(cfg: _Cfg, x_ref, a_ref, c_ref, skip_ref):
    """relu(x * A + C) [+ skip] in f32, cast to the compute dtype."""
    dt = _dtype(cfg)
    x = x_ref[0]
    if not cfg.prelude:
        return x
    p = x.astype(jnp.float32) * a_ref[0, 0] + c_ref[0, 0]
    xa = jnp.maximum(p, 0.0)
    if skip_ref is not None:
        xa = xa + skip_ref[0].astype(jnp.float32)
    return xa.astype(dt)


def _fwd_kernel(cfg: _Cfg, *refs):
    n = len(cfg.cins)
    it = iter(refs)
    x_refs = [next(it) for _ in range(n)]
    a_refs = c_refs = [None] * n
    if cfg.prelude:
        a_refs = [next(it) for _ in range(n)]
        c_refs = [next(it) for _ in range(n)]
    skip_ref = next(it) if cfg.skip else None
    w_ref = next(it)
    b_ref = next(it)
    y_ref = next(it)
    s_ref = q_ref = None
    if cfg.stats:
        s_ref = next(it)
        q_ref = next(it)

    dt = _dtype(cfg)
    h, wd, k = cfg.h, cfg.w, cfg.k
    co = y_ref.shape[-1]
    acc = jnp.zeros((h * wd, co), jnp.float32)
    off = 0
    for j in range(n):
        cin = cfg.cins[j]
        xa = _apply_prelude(cfg, x_refs[j], a_refs[j], c_refs[j],
                            skip_ref if j == 0 else None)
        xap = _pad2d(xa, k)
        for u in range(k):
            for v in range(k):
                xs = jax.lax.slice(xap, (u, v, 0), (u + h, v + wd, cin))
                acc = acc + jax.lax.dot_general(
                    xs.reshape(h * wd, cin),
                    w_ref[u, v, off:off + cin, :].astype(dt),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        off += cin
    y = (acc + b_ref[0]).astype(y_ref.dtype)
    y_ref[0] = y.reshape(h, wd, co)
    if cfg.stats:
        yf = y.astype(jnp.float32)
        s = jnp.sum(yf, axis=0)
        q = jnp.sum(yf * yf, axis=0)

        # grid is (gc, bsz): batch innermost so the (g)-indexed stat blocks
        # stay VMEM-resident across the whole accumulation
        first = pl.program_id(1) == 0

        @pl.when(first)
        def _():
            s_ref[0, :] = s
            q_ref[0, :] = q

        @pl.when(jnp.logical_not(first))
        def _():
            s_ref[0, :] = s_ref[0] + s
            q_ref[0, :] = q_ref[0] + q


def _fwd_call(cfg: _Cfg, *args):
    n = len(cfg.cins)
    if cfg.prelude:
        # per-batch vectors ride as [B, 1, C] so their (1, 1, C) blocks
        # satisfy Mosaic's (sublane, lane) block constraints
        args = (args[:n]
                + tuple(a[:, None, :] for a in args[n:3 * n])
                + args[3 * n:])
    gc = _fwd_split(cfg)
    co = cfg.cout // gc
    h, wd, k = cfg.h, cfg.w, cfg.k
    cin_t = sum(cfg.cins)
    dt = _dtype(cfg)

    in_specs = []
    for cin in cfg.cins:
        in_specs.append(pl.BlockSpec((1, h, wd, cin), lambda g, b: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    if cfg.prelude:
        for cin in list(cfg.cins) * 2:
            in_specs.append(pl.BlockSpec((1, 1, cin), lambda g, b: (b, 0, 0),
                                         memory_space=pltpu.VMEM))
    if cfg.skip:
        in_specs.append(pl.BlockSpec((1, h, wd, cfg.cins[0]),
                                     lambda g, b: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((k, k, cin_t, co), lambda g, b: (0, 0, 0, g),
                                 memory_space=pltpu.VMEM))
    # 1-D per-channel vectors ride as (1, C): XLA's 1-D layout tiling
    # (T(256)) conflicts with split (co,) Mosaic blocks
    args = args[:-1] + (args[-1][None],)
    in_specs.append(pl.BlockSpec((1, co), lambda g, b: (0, g),
                                 memory_space=pltpu.VMEM))

    out_shape = [jax.ShapeDtypeStruct((cfg.bsz, h, wd, cfg.cout), dt)]
    out_specs = [pl.BlockSpec((1, h, wd, co), lambda g, b: (b, 0, 0, g),
                              memory_space=pltpu.VMEM)]
    if cfg.stats:
        for _ in range(2):
            out_shape.append(jax.ShapeDtypeStruct((1, cfg.cout), jnp.float32))
            out_specs.append(pl.BlockSpec((1, co), lambda g, b: (0, g),
                                          memory_space=pltpu.VMEM))

    flops = 2 * cfg.bsz * h * wd * k * k * cin_t * cfg.cout
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(gc, cfg.bsz),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=cfg.bsz * h * wd * (cin_t + cfg.cout) * _isz(cfg),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*args)
    if cfg.stats:
        return out[0], out[1][0], out[2][0]
    return tuple(out)


# ---------------------------------------------------------------------------
# backward: dw + db  (grid over batch, accumulate into the weight block)
# ---------------------------------------------------------------------------


def _dw_kernel(cfg: _Cfg, *refs):
    n = len(cfg.cins)
    it = iter(refs)
    x_refs = [next(it) for _ in range(n)]
    a_refs = c_refs = [None] * n
    if cfg.prelude:
        a_refs = [next(it) for _ in range(n)]
        c_refs = [next(it) for _ in range(n)]
    skip_ref = next(it) if cfg.skip else None
    dy_ref = next(it)
    y_ref = ds_ref = dq_ref = None
    if cfg.stats:
        y_ref = next(it)
        ds_ref = next(it)
        dq_ref = next(it)
    dw_ref = next(it)
    db_ref = next(it)

    dt = _dtype(cfg)
    h, wd, k = cfg.h, cfg.w, cfg.k
    co = dy_ref.shape[-1]

    g = dy_ref[0].astype(jnp.float32)
    if cfg.stats:
        g = g + ds_ref[0] + 2.0 * dq_ref[0] * y_ref[0].astype(jnp.float32)
    db = jnp.sum(g.reshape(h * wd, co), axis=0)
    gb = g.astype(dt).reshape(h * wd, co)

    # grid is (gc, bsz): batch innermost so the (g)-indexed dw/db blocks
    # stay VMEM-resident across the whole batch accumulation
    first = pl.program_id(1) == 0
    parts = []
    off = 0
    for j in range(n):
        cin = cfg.cins[j]
        xa = _apply_prelude(cfg, x_refs[j], a_refs[j], c_refs[j],
                            skip_ref if j == 0 else None)
        xap = _pad2d(xa, k)
        for u in range(k):
            for v in range(k):
                xs = jax.lax.slice(xap, (u, v, 0), (u + h, v + wd, cin))
                d = jax.lax.dot_general(
                    xs.reshape(h * wd, cin), gb,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [cin, co]
                parts.append((u, v, off, cin, d))
        off += cin

    @pl.when(first)
    def _():
        for u, v, o, cin, d in parts:
            dw_ref[u, v, o:o + cin, :] = d
        db_ref[0, :] = db

    @pl.when(jnp.logical_not(first))
    def _():
        for u, v, o, cin, d in parts:
            dw_ref[u, v, o:o + cin, :] = dw_ref[u, v, o:o + cin, :] + d
        db_ref[0, :] = db_ref[0] + db


def _dw_split(cfg: _Cfg) -> int:
    hw = cfg.h * cfg.w
    cin = sum(cfg.cins)
    isz = _isz(cfg)
    pad = 2 * (cfg.k // 2)

    def bytes_at(s):
        co = cfg.cout // s
        return (
            2 * hw * cin * isz                          # x blocks
            + (cfg.h + pad) * (cfg.w + pad) * cin * isz  # padded copies
            + hw * cin * 4                               # f32 prelude transient
            + 2 * hw * co * isz * (2 if cfg.stats else 1)  # dy (+y) blocks
            + hw * co * 4                                # f32 g transient
            + hw * co * isz                              # gb cast
            + 2 * cfg.k * cfg.k * cin * co * 4           # dw block
            + cfg.k * cfg.k * cin * co * 4               # parts transients
            + (2 * hw * cfg.cins[0] * isz if cfg.skip else 0)
        )

    return _pick_split(cfg.cout, bytes_at)


def _dw_call(cfg: _Cfg, parts, preludes, skip, dy, y, ds, dq):
    n = len(cfg.cins)
    h, wd, k = cfg.h, cfg.w, cfg.k
    cin_t = sum(cfg.cins)
    gc = _dw_split(cfg)
    co = cfg.cout // gc

    args = list(parts)
    in_specs = [pl.BlockSpec((1, h, wd, c), lambda g, b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM) for c in cfg.cins]
    if cfg.prelude:
        for a, _ in preludes:
            args.append(a[:, None, :])
        for _, c in preludes:
            args.append(c[:, None, :])
        for c in list(cfg.cins) * 2:
            in_specs.append(pl.BlockSpec((1, 1, c), lambda g, b: (b, 0, 0),
                                         memory_space=pltpu.VMEM))
    if cfg.skip:
        args.append(skip)
        in_specs.append(pl.BlockSpec((1, h, wd, cfg.cins[0]),
                                     lambda g, b: (b, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    args.append(dy)
    in_specs.append(pl.BlockSpec((1, h, wd, co), lambda g, b: (b, 0, 0, g),
                                 memory_space=pltpu.VMEM))
    if cfg.stats:
        args += [y, ds[None], dq[None]]
        in_specs.append(pl.BlockSpec((1, h, wd, co),
                                     lambda g, b: (b, 0, 0, g),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, co), lambda g, b: (0, g),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, co), lambda g, b: (0, g),
                                     memory_space=pltpu.VMEM))

    out_shape = (
        jax.ShapeDtypeStruct((k, k, cin_t, cfg.cout), jnp.float32),
        jax.ShapeDtypeStruct((1, cfg.cout), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((k, k, cin_t, co), lambda g, b: (0, 0, 0, g),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, co), lambda g, b: (0, g), memory_space=pltpu.VMEM),
    )
    flops = 2 * cfg.bsz * h * wd * k * k * cin_t * cfg.cout
    dw, db = pl.pallas_call(
        functools.partial(_dw_kernel, cfg),
        grid=(gc, cfg.bsz),
        in_specs=in_specs,
        out_shape=out_shape,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=cfg.bsz * h * wd * (cin_t + cfg.cout) * _isz(cfg),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*args)
    return dw, db[0]


# ---------------------------------------------------------------------------
# backward: dx (+ prelude reductions) for ONE part
# ---------------------------------------------------------------------------


def _dx_kernel(cfg: _Cfg, part_idx, gc, *refs):
    """Grid (ci, bsz, gc): cout blocks innermost, accumulated into an f32
    scratch; the prelude epilogue runs on the last cout step. The outer ci
    dimension tiles the part's input channels (each ci block is an
    independent dx/da/dc slab — only the wt slice and x block differ)."""
    it = iter(refs)
    dy_ref = next(it)
    y_ref = ds_ref = dq_ref = None
    if cfg.stats:
        y_ref = next(it)
        ds_ref = next(it)
        dq_ref = next(it)
    x_ref = a_ref = c_ref = None
    if cfg.prelude:
        x_ref = next(it)
        a_ref = next(it)
        c_ref = next(it)
    wt_ref = next(it)
    dx_ref = next(it)
    da_ref = dc_ref = None
    if cfg.prelude:
        da_ref = next(it)
        dc_ref = next(it)
    dskip_ref = next(it) if (cfg.skip and part_idx == 0) else None
    acc_ref = next(it)

    dt = _dtype(cfg)
    h, wd, k = cfg.h, cfg.w, cfg.k
    cin = wt_ref.shape[-1]  # the ci-block slice of the part's channels
    co = dy_ref.shape[-1]

    g = dy_ref[0].astype(jnp.float32)
    if cfg.stats:
        g = g + ds_ref[0] + 2.0 * dq_ref[0] * y_ref[0].astype(jnp.float32)
    gp = _pad2d(g.astype(dt), k)
    acc = jnp.zeros((h * wd, cin), jnp.float32)
    for u in range(k):
        for v in range(k):
            gs = jax.lax.slice(gp, (u, v, 0), (u + h, v + wd, co))
            acc = acc + jax.lax.dot_general(
                gs.reshape(h * wd, co), wt_ref[u, v].astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    gi = pl.program_id(2)

    @pl.when(gi == 0)
    def _():
        acc_ref[:] = acc

    @pl.when(gi != 0)
    def _():
        acc_ref[:] = acc_ref[:] + acc

    @pl.when(gi == gc - 1)
    def _():
        dxa = acc_ref[:]
        if dskip_ref is not None:
            dskip_ref[0] = dxa.reshape(h, wd, cin).astype(dskip_ref.dtype)
        if cfg.prelude:
            xf = x_ref[0].astype(jnp.float32).reshape(h * wd, cin)
            p = xf * a_ref[0, 0] + c_ref[0, 0]
            dp = jnp.where(p > 0.0, dxa, 0.0)
            dx_ref[0] = (dp * a_ref[0, 0]).reshape(h, wd, cin).astype(
                dx_ref.dtype)
            da_ref[0, 0] = jnp.sum(dp * xf, axis=0)
            dc_ref[0, 0] = jnp.sum(dp, axis=0)
        else:
            dx_ref[0] = dxa.reshape(h, wd, cin).astype(dx_ref.dtype)


def _dx_split(cfg: _Cfg, cin: int) -> Tuple[int, int]:
    """(cout_split, cin_split) for the dx kernel. cout splitting alone
    bottoms out at 128 lanes; the c256 1x1 stages still exceed VMEM there,
    so the input channels tile too (independent dx slabs per ci block)."""
    hw = cfg.h * cfg.w
    isz = _isz(cfg)
    pad = 2 * (cfg.k // 2)

    def bytes_at(s, t):
        co = cfg.cout // s
        ci = cin // t
        return (
            2 * hw * co * isz * (2 if cfg.stats else 1)   # dy (+ y) blocks
            + hw * co * 4                             # f32 g transient
            + (cfg.h + pad) * (cfg.w + pad) * co * isz  # padded g
            + hw * ci * 4                             # f32 accumulator
            + hw * ci * 4                             # scratch acc_ref
            + 2 * hw * ci * isz * (1 if cfg.prelude else 0)  # x block
            + 2 * hw * ci * isz                       # dx out
            + (2 * hw * ci * isz if cfg.skip else 0)
            + 2 * cfg.k * cfg.k * co * ci * (4 + isz)
        )

    def ok(total, s):
        return total % s == 0 and (s == 1 or (total // s) % 128 == 0)

    best = (1, 1)
    for t in (1, 2, 4, 8):
        if not ok(cin, t):
            continue
        for s in (1, 2, 4, 8, 16):
            if not ok(cfg.cout, s):
                continue
            best = (s, t)
            if bytes_at(s, t) <= _VMEM_TARGET:
                return best
    return best


def _dx_call(cfg: _Cfg, part_idx, x, pre, wt, dy, y, ds, dq):
    h, wd, k = cfg.h, cfg.w, cfg.k
    cin = cfg.cins[part_idx]
    gc, tc = _dx_split(cfg, cin)
    co = cfg.cout // gc
    ci = cin // tc
    dt = _dtype(cfg)

    args = [dy]
    in_specs = [pl.BlockSpec((1, h, wd, co), lambda c, b, g: (b, 0, 0, g),
                             memory_space=pltpu.VMEM)]
    if cfg.stats:
        args += [y, ds[None], dq[None]]
        in_specs.append(pl.BlockSpec((1, h, wd, co),
                                     lambda c, b, g: (b, 0, 0, g),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, co), lambda c, b, g: (0, g),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, co), lambda c, b, g: (0, g),
                                     memory_space=pltpu.VMEM))
    if cfg.prelude:
        args += [x, pre[0][:, None, :], pre[1][:, None, :]]
        in_specs.append(pl.BlockSpec((1, h, wd, ci),
                                     lambda c, b, g: (b, 0, 0, c),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, ci), lambda c, b, g: (b, 0, c),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, ci), lambda c, b, g: (b, 0, c),
                                     memory_space=pltpu.VMEM))
    args.append(wt)
    in_specs.append(pl.BlockSpec((k, k, co, ci), lambda c, b, g: (0, 0, g, c),
                                 memory_space=pltpu.VMEM))

    out_shape = [jax.ShapeDtypeStruct((cfg.bsz, h, wd, cin), dt)]
    out_specs = [pl.BlockSpec((1, h, wd, ci), lambda c, b, g: (b, 0, 0, c),
                              memory_space=pltpu.VMEM)]
    if cfg.prelude:
        for _ in range(2):
            out_shape.append(
                jax.ShapeDtypeStruct((cfg.bsz, 1, cin), jnp.float32))
            out_specs.append(pl.BlockSpec((1, 1, ci),
                                          lambda c, b, g: (b, 0, c),
                                          memory_space=pltpu.VMEM))
    if cfg.skip and part_idx == 0:
        out_shape.append(jax.ShapeDtypeStruct((cfg.bsz, h, wd, cin), dt))
        out_specs.append(pl.BlockSpec((1, h, wd, ci),
                                      lambda c, b, g: (b, 0, 0, c),
                                      memory_space=pltpu.VMEM))

    flops = 2 * cfg.bsz * h * wd * k * k * cin * cfg.cout
    out = pl.pallas_call(
        functools.partial(_dx_kernel, cfg, part_idx, gc),
        grid=(tc, cfg.bsz, gc),
        in_specs=in_specs,
        out_shape=tuple(out_shape),
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((h * wd, ci), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=cfg.bsz * h * wd * (cin + cfg.cout) * _isz(cfg),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*args)
    return tuple(out)


# ---------------------------------------------------------------------------
# custom_vjp assembly
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _build(cfg: _Cfg):
    n = len(cfg.cins)

    def flatten(parts, preludes, skip, w, b):
        args = list(parts)
        if cfg.prelude:
            for a, _ in preludes:
                args.append(a)
            for _, c in preludes:
                args.append(c)
        if cfg.skip:
            args.append(skip)
        args += [w, b]
        return tuple(args)

    def unflatten(args):
        it = iter(args)
        parts = tuple(next(it) for _ in range(n))
        preludes = None
        if cfg.prelude:
            aa = [next(it) for _ in range(n)]
            cc = [next(it) for _ in range(n)]
            preludes = tuple(zip(aa, cc))
        skip = next(it) if cfg.skip else None
        w = next(it)
        b = next(it)
        return parts, preludes, skip, w, b

    @jax.custom_vjp
    def fn(*args):
        return _fwd_call(cfg, *args)

    def fwd(*args):
        out = _fwd_call(cfg, *args)
        y = out[0] if cfg.stats else None
        return out, (args, y)

    def bwd(res, cts):
        args, y = res
        parts, preludes, skip, w, b = unflatten(args)
        if cfg.stats:
            dy, ds, dq = cts
        else:
            (dy,), ds, dq = cts, None, None
        dw, db = _dw_call(cfg, parts, preludes, skip, dy, y, ds, dq)
        # flipped/transposed kernel for dx: [k,k,cout,cin_total]
        wt_full = w[::-1, ::-1].transpose(0, 1, 3, 2)
        grads_x, grads_a, grads_c, dskip = [], [], [], None
        off = 0
        for j in range(n):
            cin = cfg.cins[j]
            wt = jax.lax.slice(wt_full, (0, 0, 0, off),
                               (cfg.k, cfg.k, cfg.cout, off + cin))
            out = _dx_call(cfg, j, parts[j],
                           preludes[j] if cfg.prelude else None,
                           wt, dy, y, ds, dq)
            it = iter(out)
            grads_x.append(next(it))
            if cfg.prelude:
                grads_a.append(next(it)[:, 0, :])
                grads_c.append(next(it)[:, 0, :])
            if cfg.skip and j == 0:
                dskip = next(it)
            off += cin
        grads = list(grads_x)
        if cfg.prelude:
            grads += grads_a + grads_c
        if cfg.skip:
            grads.append(dskip)
        grads += [dw, db]
        return tuple(grads)

    fn.defvjp(fwd, bwd)
    return fn, flatten


def conv_bn_act(
    parts: Sequence[jax.Array],
    w: jax.Array,
    b: jax.Array,
    *,
    preludes: Optional[Sequence[Tuple[jax.Array, jax.Array]]] = None,
    skip: Optional[jax.Array] = None,
    stats: bool = False,
    interpret: Optional[bool] = None,
):
    """Fused ``conv(relu(x*A+C) [+skip], w) + b`` with optional BN-stat
    emission.

    Args:
      parts: input tensors [B,H,W,Cin_j] (a conv over their channel concat).
      w: f32 HWIO kernel [k,k,sum(Cin),Cout] (packed-space kernel).
      b: f32 bias [Cout] (zeros when the conv is bias-free).
      preludes: per-part (A, C) with shape [B,Cin_j] f32, applied as
        ``relu(x*A + C)``; None executes the conv on the raw inputs.
      skip: optional residual added AFTER the relu of part 0 (the reference's
        ``r + depth`` before the reduce conv, modules.py:97-99).
      stats: also return (sum, sum-of-squares) of the output over (B,H,W)
        per channel, f32 — the next layer's BatchNorm inputs.

    Returns ``y`` or ``(y, s, q)``.
    """
    parts = tuple(parts)
    if skip is not None:
        assert preludes is not None, "skip requires a prelude (relu(..)+skip)"
    bsz, h, wd, _ = parts[0].shape
    k = w.shape[0]
    cins = tuple(p.shape[-1] for p in parts)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cfg = _Cfg(
        k=k, bsz=bsz, h=h, w=wd, cins=cins, cout=w.shape[-1],
        prelude=preludes is not None, skip=skip is not None, stats=stats,
        dt=str(parts[0].dtype), interpret=bool(interpret),
    )
    fn, flatten = _build(cfg)
    w = w.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if preludes is not None:
        preludes = tuple(
            (a.astype(jnp.float32), c.astype(jnp.float32))
            for a, c in preludes)
    out = fn(*flatten(parts, preludes, skip, w, b))
    if stats:
        return out
    return out[0]
