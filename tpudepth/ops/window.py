"""Windowing utilities for the SAM / NewCRF attention decoders.

Torch-order parity with the reference's ``window_partition``/``window_reverse``
(``src/SAM.py:30-59``, ``src/newcrf_layers.py:30-59``), the Swin relative
position index (``src/SAM.py:86-100``) and the SW-MSA shift mask built by
``BasicCRFLayer`` (``src/newcrf_layers.py:331-350``).

All masks/indices are precomputed in numpy at trace time — resolutions are
static per config, so XLA sees only constants (no data-dependent shapes).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jax.Array, window_size: int) -> jax.Array:
    """(B, H, W, C) -> (B * nH * nW, ws, ws, C), row-major window order."""
    b, h, w, c = x.shape
    ws = window_size
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c)


def window_reverse(windows: jax.Array, window_size: int, h: int, w: int) -> jax.Array:
    """Inverse of :func:`window_partition`."""
    ws = window_size
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def relative_position_index(window_size: int) -> np.ndarray:
    """[N, N] indices into the (2*ws-1)^2 relative-position bias table.

    Bit-identical to the Swin construction at ``src/SAM.py:90-99``.
    """
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_flat = coords.reshape(2, -1)  # 2, N
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)  # N, N, 2
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1).astype(np.int32)  # N, N


@functools.lru_cache(maxsize=None)
def shifted_window_attention_mask(
    h: int, w: int, window_size: int, shift_size: int
) -> Optional[np.ndarray]:
    """[nW, N, N] additive mask (0 / -100) for SW-MSA after cyclic shift.

    Matches ``BasicCRFLayer.forward`` (``src/newcrf_layers.py:331-350``):
    the image is padded up to window multiples, labelled into 9 regions, and
    window pairs from different regions are masked with -100.

    Returns None when shift_size == 0 (no mask needed).
    """
    if shift_size == 0:
        return None
    ws = window_size
    hp = int(np.ceil(h / ws)) * ws
    wp = int(np.ceil(w / ws)) * ws
    img_mask = np.zeros((1, hp, wp, 1), dtype=np.float32)
    h_slices = (slice(0, -ws), slice(-ws, -shift_size), slice(-shift_size, None))
    w_slices = (slice(0, -ws), slice(-ws, -shift_size), slice(-shift_size, None))
    cnt = 0
    for hs in h_slices:
        for wslc in w_slices:
            img_mask[:, hs, wslc, :] = cnt
            cnt += 1
    # partition into windows (numpy mirror of window_partition)
    m = img_mask.reshape(1, hp // ws, ws, wp // ws, ws, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = m[:, None, :] - m[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return attn_mask


@functools.lru_cache(maxsize=None)
def window_valid_mask(
    h: int, w: int, window_size: int, shift_size: int = 0
) -> Optional[np.ndarray]:
    """[nW, N] 1/0 mask of which window tokens are REAL (not bottom/right
    padding), after the optional cyclic shift.

    The fused whole-block kernel (``ops/pallas/block_infer.py``) reads RAW
    padded inputs and runs LayerNorm in VMEM; multiplying the normalized
    tokens by this mask reproduces the reference's pad-AFTER-LayerNorm
    semantics exactly (``src/SAM.py:214-219`` pads the normalized tensor, so
    pad-token keys are ``bias``-only, not ``W @ LN(0)``).

    Returns None when no padding is needed (mask would be all-ones).
    """
    ws = window_size
    hp = int(np.ceil(h / ws)) * ws
    wp = int(np.ceil(w / ws)) * ws
    if hp == h and wp == w:
        return None
    valid = np.zeros((hp, wp), dtype=np.float32)
    valid[:h, :w] = 1.0
    if shift_size:
        valid = np.roll(valid, (-shift_size, -shift_size), axis=(0, 1))
    m = valid.reshape(hp // ws, ws, wp // ws, ws)
    return m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)


def pad_to_window_multiple(x: jax.Array, window_size: int) -> Tuple[jax.Array, int, int]:
    """Zero-pad NHWC bottom/right to window multiples (``src/SAM.py:214-219``)."""
    _, h, w, _ = x.shape
    ws = window_size
    pad_b = (ws - h % ws) % ws
    pad_r = (ws - w % ws) % ws
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    return x, h + pad_b, w + pad_r
