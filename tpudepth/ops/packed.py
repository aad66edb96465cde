"""Space-to-depth "packed" execution for thin-channel conv stages.

The GuideDepth upsampling pyramid runs 3x3/1x1 convs with 4-32 channels at
half/full NYU resolution (``src/GuideDepth/model/modules.py:42-100``). On the
MXU these waste almost all 128 lanes: measured on v5e, a 3x3 16->16 conv at
480x640 costs 4.10 ms/batch16 while the mathematically identical packed
64->64 conv at 240x320 costs 0.73 ms (scripts/bench_s2d.py) — the packed form
pays 4x FLOPs for ~16x better lane utilization.

"Packed" layout: a [B, H, W, C] tensor is represented as
[B, H/b, W/b, b*b*C] where packed channel index = (sy*b + sx)*C + c — i.e.
``space_to_depth`` with sub-pixel position slowest, original channel fastest.
Every op below is an *exact* rearrangement of its unpacked counterpart (same
math, different summation order), so model parameters and checkpoints are
unchanged and torch golden parity is preserved.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array, block: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (h, w, block)
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/b, W/b, sy, sx, c
    return x.reshape(b, h // block, w // block, block * block * c)


def depth_to_space(x: jax.Array, block: int = 2) -> jax.Array:
    b, hp, wp, cp = x.shape
    c = cp // (block * block)
    x = x.reshape(b, hp, wp, block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, H/b, sy, W/b, sx, c
    return x.reshape(b, hp * block, wp * block, c)


def packed_concat(tensors: Sequence[jax.Array], block: int = 2) -> jax.Array:
    """Channel concat in packed layout: interleaves per sub-pixel position so
    the result is the packing of ``concat(unpacked_tensors)``.

    PERF WARNING: the interleaving reshapes on the full activation force
    XLA:TPU into hostile layouts around neighbouring convs (measured 3.7x on
    a conv chain, PERF.md round 2). Prefer a PLAIN ``jnp.concatenate`` and
    push the channel reorder into the consuming conv's (tiny) kernel via
    :func:`concat_input_perm` — that is what GuidedUpsamplingBlock does."""
    b2 = block * block
    parts = [t.reshape(*t.shape[:-1], b2, t.shape[-1] // b2) for t in tensors]
    cat = jnp.concatenate(parts, axis=-1)
    return cat.reshape(*cat.shape[:-2], b2 * cat.shape[-1])


@functools.lru_cache(maxsize=None)
def concat_input_perm(splits: Tuple[int, ...], block: int) -> np.ndarray:
    """Permutation ``q`` with ``packed_concat(parts)[..., i] ==
    plain_concat(parts)[..., q[i]]`` for packed parts with ``splits`` ORIGINAL
    channels each. Lets consumers of a packed concat take the cheap plain
    concat and re-index their own (small) weights instead of reshuffling the
    big activation tensor."""
    b2 = block * block
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


@functools.lru_cache(maxsize=None)
def _pack_map(k: int, block: int) -> Tuple[np.ndarray, int]:
    """Constant 0/1 scatter map M[P, Q, s, d, u, v] from an unpacked [k,k]
    kernel tap (u, v) between sub-positions s=(sy,sx) -> d=(dy,dx) to packed
    kernel position (P, Q). Returns (M, pad) with the packed kernel sized
    [kp, kp] and symmetric zero-padding ``pad`` reproducing the unpacked
    conv's k//2 zero-padding exactly.
    """
    half = k // 2
    offs = [d + u - half for d in range(block) for u in range(k)]
    pmin = min(o // block for o in offs)
    pmax = max(o // block for o in offs)
    kp = pmax - pmin + 1
    b2 = block * block
    m = np.zeros((kp, kp, b2, b2, k, k), np.float32)
    for dy in range(block):
        for u in range(k):
            oy = dy + u - half
            py, sy = oy // block, oy % block
            for dx in range(block):
                for v in range(k):
                    ox = dx + v - half
                    px, sx = ox // block, ox % block
                    m[py - pmin, px - pmin,
                      sy * block + sx, dy * block + dx, u, v] = 1.0
    assert -pmin == pmax or k == 1, (pmin, pmax)
    return m, -pmin


def pack_conv_kernel(w: jax.Array, block: int = 2) -> Tuple[jax.Array, int]:
    """Transform an unpacked HWIO kernel [k,k,Cin,Cout] into the packed-space
    kernel [kp,kp,b2*Cin,b2*Cout] (plus the packed zero-padding) such that

        conv(x, w, pad=k//2) == depth_to_space(conv(space_to_depth(x), wp, pad))

    exactly (the packed kernel is a sparse-structured dense rearrangement; no
    value changes). Zero-padding carries over exactly because every packed
    kernel entry that would read beyond one original pad row/col is zero.
    """
    k, _, cin, cout = w.shape
    m, pad = _pack_map(k, block)
    b2 = block * block
    # [kp,kp,s,d,u,v] x [u,v,ci,co] -> [kp,kp,s,ci,d,co]
    wp = jnp.einsum("PQsduv,uvio->PQsido", jnp.asarray(m, w.dtype), w)
    kp = wp.shape[0]
    return wp.reshape(kp, kp, b2 * cin, b2 * cout), pad


def packed_conv(x: jax.Array, w: jax.Array, block: int = 2,
                precision=None) -> jax.Array:
    """Packed-space conv equivalent to ``conv(unpacked_x, w, pad=k//2)``."""
    wp, pad = pack_conv_kernel(w, block)
    return jax.lax.conv_general_dilated(
        x, wp.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision,
    )


def tile_channel(v: jax.Array, block: int = 2) -> jax.Array:
    """Broadcast a per-original-channel vector [C] to packed channels
    [b2*C] in (s, c) layout."""
    return jnp.tile(v, block * block)


def packed_channel_mean(x: jax.Array, block: int = 2) -> jax.Array:
    """Global spatial mean per ORIGINAL channel of a packed tensor: [B, C].
    Equals ``mean(unpacked, axis=(1,2))`` exactly (all pixels weighted
    uniformly)."""
    b2 = block * block
    y = jnp.mean(x, axis=(1, 2))  # [B, b2*C]
    return jnp.mean(y.reshape(y.shape[0], b2, -1), axis=1)


def upsample2x_packed(x: jax.Array) -> jax.Array:
    """``space_to_depth(upsample2x_bilinear(x), 2)`` without materializing the
    upsampled tensor: [B,H,W,C] -> [B,H,W,4C] packed at resolution (2H,2W).

    Taps match :func:`tpudepth.ops.image._upsample2x_axis` exactly
    (align_corners=False, edge-clamped):
      even = 0.25*prev + 0.75*x ; odd = 0.75*x + 0.25*next.
    """

    def shift(arr, axis, direction):
        n = arr.shape[axis]
        idx = [slice(None)] * arr.ndim
        if direction < 0:  # prev: [x0, x0..x_{n-2}]
            idx[axis] = slice(0, n - 1)
            first = [slice(None)] * arr.ndim
            first[axis] = slice(0, 1)
            return jnp.concatenate([arr[tuple(first)], arr[tuple(idx)]], axis=axis)
        idx[axis] = slice(1, n)
        last = [slice(None)] * arr.ndim
        last[axis] = slice(n - 1, n)
        return jnp.concatenate([arr[tuple(idx)], arr[tuple(last)]], axis=axis)

    even_h = 0.25 * shift(x, 1, -1) + 0.75 * x
    odd_h = 0.75 * x + 0.25 * shift(x, 1, +1)
    rows = []
    for r in (even_h, odd_h):  # sy = 0, 1
        rows.append(0.25 * shift(r, 2, -1) + 0.75 * r)  # sx = 0
        rows.append(0.75 * r + 0.25 * shift(r, 2, +1))  # sx = 1
    return jnp.concatenate(rows, axis=-1).astype(x.dtype)


def upsample2x_pack4(x: jax.Array) -> jax.Array:
    """``space_to_depth(upsample2x_bilinear(x), 4)`` fused:
    [B,H,W,C] -> [B,H/2,W/2,16C] packed (block=4) at resolution (2H,2W).

    Same two taps as :func:`upsample2x_packed` (align_corners=False,
    edge-clamped), but the 4x4 packing groups PAIRS of source pixels, so the
    kernel works on the block-2 view ``g[sy][sx]`` of x and each of the 16
    sub-positions (ty, tx) = (2*j + phase) combines the parity groups with
    +/-1 coarse shifts. Channel order is the direct block-4 order
    (s = ty*4 + tx, original channel fastest) — the order
    :func:`pack_conv_kernel` with block=4 consumes. H and W must be even.
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    x4 = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # parity groups g[sy][sx]: [B, H/2, W/2, C]
    g = [[x4[:, :, sy, :, sx, :] for sx in range(2)] for sy in range(2)]

    def take(arr, axis, sl):
        idx = [slice(None)] * arr.ndim
        idx[axis] = sl
        return arr[tuple(idx)]

    def row_taps(gs, ty, axis):
        """Fine line 4P+ty of up2x along ``axis`` from parity groups
        gs = (g0, g1): two-tap lerp. The cross-coarse neighbors (ty 0 and 3)
        clamp on the ORIGINAL grid, so the clamped edge entry comes from the
        OTHER parity group (y[-1] -> y[0] = g0's first, y[n] -> y[n-1] =
        g1's last)."""
        g0, g1 = gs
        if ty == 0:   # prev fine line = y[2P-1]: g1[P-1], edge -> g0[0]
            n = g1.shape[axis]
            prev = jnp.concatenate(
                [take(g0, axis, slice(0, 1)), take(g1, axis, slice(0, n - 1))],
                axis=axis)
            return 0.25 * prev + 0.75 * g0
        if ty == 1:   # cur = g0, next = g1 (same coarse row)
            return 0.75 * g0 + 0.25 * g1
        if ty == 2:   # cur = g1, prev = g0 (same coarse row)
            return 0.25 * g0 + 0.75 * g1
        # ty == 3: next fine line = y[2P+2]: g0[P+1], edge -> g1[n-1]
        n = g0.shape[axis]
        nxt = jnp.concatenate(
            [take(g0, axis, slice(1, n)), take(g1, axis, slice(n - 1, n))],
            axis=axis)
        return 0.75 * g1 + 0.25 * nxt

    outs = []
    for ty in range(4):
        # row-interpolate each column-parity group first
        r0 = row_taps((g[0][0], g[1][0]), ty, 1)  # sx = 0 columns
        r1 = row_taps((g[0][1], g[1][1]), ty, 1)  # sx = 1 columns
        for tx in range(4):
            outs.append(row_taps((r0, r1), tx, 2))
    return jnp.concatenate(outs, axis=-1).astype(x.dtype)
