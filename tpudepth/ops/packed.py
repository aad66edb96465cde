"""Space-to-depth "packed" execution for thin-channel conv stages.

The GuideDepth upsampling pyramid runs 3x3/1x1 convs with 4-32 channels at
half/full NYU resolution (``src/GuideDepth/model/modules.py:42-100``). On the
MXU these waste almost all 128 lanes: measured on v5e, a 3x3 16->16 conv at
480x640 costs 4.10 ms/batch16 while the mathematically identical packed
64->64 conv at 240x320 costs 0.73 ms (scripts/bench_s2d.py) — the packed form
pays 4x FLOPs for ~16x better lane utilization.

"Packed" layout: a [B, H, W, C] tensor is represented as
[B, H/by, W/bx, by*bx*C] where packed channel index = (sy*bx + sx)*C + c —
i.e. ``space_to_depth`` with sub-pixel position slowest, original channel
fastest. ``block`` everywhere is an int (square fold) or an ``(by, bx)``
tuple: the dense-packed conv's FLOP inflation equals the total fold ``by*bx``
(the packed kernel is 3 taps per axis for k=3 regardless of block), so the
cheapest fold that fills the 128 lanes wins — e.g. c16 stages fold (2,4) to
c128 at HALF the dense FLOPs of the square block-4 c256 form (PERF.md r3).
Every op below is an *exact* rearrangement of its unpacked counterpart (same
math, different summation order), so model parameters and checkpoints are
unchanged and torch golden parity is preserved.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

BlockSpec = Union[int, Tuple[int, int]]


def block_pair(block: BlockSpec) -> Tuple[int, int]:
    """Normalize a block spec to ``(by, bx)``; ints mean a square fold."""
    if isinstance(block, (tuple, list)):
        by, bx = block
        return int(by), int(bx)
    return int(block), int(block)


def block_total(block: BlockSpec) -> int:
    by, bx = block_pair(block)
    return by * bx


def space_to_depth(x: jax.Array, block: BlockSpec = 2) -> jax.Array:
    by, bx = block_pair(block)
    b, h, w, c = x.shape
    assert h % by == 0 and w % bx == 0, (h, w, block)
    x = x.reshape(b, h // by, by, w // bx, bx, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/by, W/bx, sy, sx, c
    return x.reshape(b, h // by, w // bx, by * bx * c)


def depth_to_space(x: jax.Array, block: BlockSpec = 2) -> jax.Array:
    by, bx = block_pair(block)
    b, hp, wp, cp = x.shape
    c = cp // (by * bx)
    x = x.reshape(b, hp, wp, by, bx, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/by, sy, W/bx, sx, c
    return x.reshape(b, hp * by, wp * bx, c)


def packed_concat(tensors: Sequence[jax.Array], block: BlockSpec = 2) -> jax.Array:
    """Channel concat in packed layout: interleaves per sub-pixel position so
    the result is the packing of ``concat(unpacked_tensors)``.

    PERF WARNING: the interleaving reshapes on the full activation force
    XLA:TPU into hostile layouts around neighbouring convs (measured 3.7x on
    a conv chain, PERF.md round 2). Prefer a PLAIN ``jnp.concatenate`` and
    push the channel reorder into the consuming conv's (tiny) kernel via
    :func:`concat_input_perm` — that is what GuidedUpsamplingBlock does."""
    b2 = block_total(block)
    parts = [t.reshape(*t.shape[:-1], b2, t.shape[-1] // b2) for t in tensors]
    cat = jnp.concatenate(parts, axis=-1)
    return cat.reshape(*cat.shape[:-2], b2 * cat.shape[-1])


@functools.lru_cache(maxsize=None)
def _concat_input_perm(splits: Tuple[int, ...], b2: int) -> np.ndarray:
    total = sum(splits)
    q = np.empty(b2 * total, np.int64)
    off_c = 0
    off_p = 0
    for cj in splits:
        for s in range(b2):
            q[s * total + off_c : s * total + off_c + cj] = (
                off_p + s * cj + np.arange(cj))
        off_c += cj
        off_p += b2 * cj
    return q


def concat_input_perm(splits: Tuple[int, ...], block: BlockSpec) -> np.ndarray:
    """Permutation ``q`` with ``packed_concat(parts)[..., i] ==
    plain_concat(parts)[..., q[i]]`` for packed parts with ``splits`` ORIGINAL
    channels each. Lets consumers of a packed concat take the cheap plain
    concat and re-index their own (small) weights instead of reshuffling the
    big activation tensor."""
    return _concat_input_perm(tuple(splits), block_total(block))


@functools.lru_cache(maxsize=None)
def _axis_pack_map(k: int, b: int) -> Tuple[np.ndarray, int]:
    """1D scatter map m[P, s, d, u] from an unpacked length-k kernel tap u
    between sub-positions s -> d to packed kernel position P (plus the packed
    zero-padding reproducing the unpacked conv's k//2 padding)."""
    half = k // 2
    offs = [d + u - half for d in range(b) for u in range(k)]
    pmin = min(o // b for o in offs)
    pmax = max(o // b for o in offs)
    kp = pmax - pmin + 1
    m = np.zeros((kp, b, b, k), np.float32)
    for d in range(b):
        for u in range(k):
            o = d + u - half
            m[o // b - pmin, o % b, d, u] = 1.0
    assert -pmin == pmax or k == 1, (pmin, pmax)
    return m, -pmin


@functools.lru_cache(maxsize=None)
def _pack_map(k: int, block: BlockSpec) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Constant 0/1 scatter map M[P, Q, s, d, u, v] from an unpacked [k,k]
    kernel tap (u, v) between sub-positions s=(sy,sx) -> d=(dy,dx) to packed
    kernel position (P, Q). Returns (M, (pad_y, pad_x)) with the packed
    kernel sized [kp_y, kp_x] and symmetric zero-padding reproducing the
    unpacked conv's k//2 zero-padding exactly. Separable over the axes."""
    by, bx = block_pair(block)
    my, pad_y = _axis_pack_map(k, by)
    mx, pad_x = _axis_pack_map(k, bx)
    # [Py,sy,dy,u] x [Qx,sx,dx,v] -> [P,Q, sy,sx, dy,dx, u,v]
    m = np.einsum("Pswu,Qtxv->PQstwxuv", my, mx)
    kp_y, kp_x = my.shape[0], mx.shape[0]
    b2 = by * bx
    return m.reshape(kp_y, kp_x, b2, b2, k, k), (pad_y, pad_x)


def pack_conv_kernel(
    w: jax.Array, block: BlockSpec = 2
) -> Tuple[jax.Array, Tuple[int, int]]:
    """Transform an unpacked HWIO kernel [k,k,Cin,Cout] into the packed-space
    kernel [kp_y,kp_x,b2*Cin,b2*Cout] (plus the packed zero-padding) so that

        conv(x, w, pad=k//2) == depth_to_space(conv(space_to_depth(x), wp, pad))

    exactly (the packed kernel is a sparse-structured dense rearrangement; no
    value changes). Zero-padding carries over exactly because every packed
    kernel entry that would read beyond one original pad row/col is zero.
    """
    k, _, cin, cout = w.shape
    m, pads = _pack_map(k, block_pair(block) if not isinstance(block, int) else block)
    b2 = block_total(block)
    # [kp,kp,s,d,u,v] x [u,v,ci,co] -> [kp,kp,s,ci,d,co]
    wp = jnp.einsum("PQsduv,uvio->PQsido", jnp.asarray(m, w.dtype), w)
    return wp.reshape(wp.shape[0], wp.shape[1], b2 * cin, b2 * cout), pads


def packed_conv(x: jax.Array, w: jax.Array, block: BlockSpec = 2,
                precision=None) -> jax.Array:
    """Packed-space conv equivalent to ``conv(unpacked_x, w, pad=k//2)``."""
    wp, (pad_y, pad_x) = pack_conv_kernel(w, block)
    return jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), [(pad_y, pad_y), (pad_x, pad_x)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )


def tile_channel(v: jax.Array, block: BlockSpec = 2) -> jax.Array:
    """Broadcast a per-original-channel vector [C] to packed channels
    [b2*C] in (s, c) layout."""
    return jnp.tile(v, block_total(block))


def packed_channel_mean(x: jax.Array, block: BlockSpec = 2) -> jax.Array:
    """Global spatial mean per ORIGINAL channel of a packed tensor: [B, C].
    Equals ``mean(unpacked, axis=(1,2))`` exactly (all pixels weighted
    uniformly)."""
    b2 = block_total(block)
    y = jnp.mean(x, axis=(1, 2))  # [B, b2*C]
    return jnp.mean(y.reshape(y.shape[0], b2, -1), axis=1)


def _take(arr, axis, sl):
    idx = [slice(None)] * arr.ndim
    idx[axis] = sl
    return arr[tuple(idx)]


def _shift(arr, axis, direction):
    """Edge-clamped +/-1 shift along ``axis``."""
    n = arr.shape[axis]
    if direction < 0:  # prev: [x0, x0..x_{n-2}]
        return jnp.concatenate(
            [_take(arr, axis, slice(0, 1)), _take(arr, axis, slice(0, n - 1))],
            axis=axis)
    return jnp.concatenate(
        [_take(arr, axis, slice(1, n)), _take(arr, axis, slice(n - 1, n))],
        axis=axis)


def _axis_up_taps(x, axis, b):
    """The ``b`` per-sub-position lines of exact-2x bilinear upsampling along
    ``axis`` folded by block ``b`` (each covers b/2 source lines). Taps match
    :func:`tpudepth.ops.image._upsample2x_axis` exactly (align_corners=False,
    edge-clamped): even = 0.25*prev + 0.75*x ; odd = 0.75*x + 0.25*next.

    Generic over even ``b``: fine line f = Q*b + t reads source line
    m = Q*(b/2) + t//2, so the sources split into g = b/2 interleaved groups
    (split via reshape, NOT stride-2 slice_in_dim: strided slices cost 3.3x
    here — 2.99 vs 0.91 ms fwd at [16,240,320,16] bf16,
    scripts/bench_up_pack.py). The cross-group neighbors at t=0 / t=b-1
    clamp on the ORIGINAL grid, so the clamped edge entry comes from the
    first/last group (y[-1] -> y[0] = group 0's first, y[n] -> y[n-1] =
    last group's last)."""
    if b == 1:
        raise ValueError("upsample2x output folded by 1 is not packed")
    if b == 2:
        return [0.25 * _shift(x, axis, -1) + 0.75 * x,
                0.75 * x + 0.25 * _shift(x, axis, +1)]
    assert b % 2 == 0, b
    g = b // 2
    n = x.shape[axis]
    assert n % g == 0, (axis, n, b)
    shp = list(x.shape)
    shp[axis:axis + 1] = [n // g, g]
    xg = x.reshape(shp)
    groups = [_take(xg, axis + 1, j) for j in range(g)]
    m = groups[0].shape[axis]
    outs = []
    for t in range(b):
        j = t // 2
        if t % 2 == 0:  # 0.25 * y[m-1] + 0.75 * y[m]
            if j > 0:
                prev = groups[j - 1]
            else:  # y[Q*g - 1] = last group's Q-1 row; clamp -> y[0]
                prev = jnp.concatenate(
                    [_take(groups[0], axis, slice(0, 1)),
                     _take(groups[g - 1], axis, slice(0, m - 1))], axis=axis)
            outs.append(0.25 * prev + 0.75 * groups[j])
        else:  # 0.75 * y[m] + 0.25 * y[m+1]
            if j < g - 1:
                nxt = groups[j + 1]
            else:  # y[Q*g + g] = group 0's Q+1 row; clamp -> y[n-1]
                nxt = jnp.concatenate(
                    [_take(groups[0], axis, slice(1, m)),
                     _take(groups[g - 1], axis, slice(m - 1, m))], axis=axis)
            outs.append(0.75 * groups[j] + 0.25 * nxt)
    return outs


def upsample2x_pack(x: jax.Array, block: BlockSpec) -> jax.Array:
    """``space_to_depth(upsample2x_bilinear(x), block)`` without
    materializing the upsampled tensor: [B,H,W,C] ->
    [B,2H/by,2W/bx,by*bx*C] packed at resolution (2H,2W). ``by``/``bx`` in
    {2, 4}; axes are separable so rectangular folds like (2,4) come for
    free. Channel order is s = sy*bx + sx, original channel fastest — the
    order :func:`pack_conv_kernel` consumes."""
    by, bx = block_pair(block)
    rows = _axis_up_taps(x, 1, by)
    outs = []
    for r in rows:
        outs.extend(_axis_up_taps(r, 2, bx))
    return jnp.concatenate(outs, axis=-1).astype(x.dtype)


def upsample2x_packed(x: jax.Array) -> jax.Array:
    """``space_to_depth(upsample2x_bilinear(x), 2)`` fused: [B,H,W,C] ->
    [B,H,W,4C] packed at resolution (2H,2W)."""
    return upsample2x_pack(x, 2)


def upsample2x_pack4(x: jax.Array) -> jax.Array:
    """``space_to_depth(upsample2x_bilinear(x), 4)`` fused: [B,H,W,C] ->
    [B,H/2,W/2,16C] packed (block=4) at resolution (2H,2W). H, W even."""
    return upsample2x_pack(x, 4)
