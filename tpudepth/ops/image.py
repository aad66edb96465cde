"""Image primitives with exact PyTorch interpolation semantics, NHWC layout.

The reference leans on ``F.interpolate`` in three flavors:

- bilinear, ``align_corners=True``  (U-Net ``Up``/``UpSample`` blocks,
  ``src/models/model_mobileV3.py:19``, ``src/model_mobileV3_large_SAM.py:50``)
- bilinear, ``align_corners=False`` (decoder ``upsample``,
  ``src/model_mobileV3_large_SAM.py:55-58``; GuideDepth pyramid ``x2``,
  ``src/GuideDepth/model/GuideDepth.py:49-55``; DAPPM,
  ``src/GuideDepth/model/DDRNet_23_slim.py:182-193``)
- nearest (default mode), GuideDepth guide pyramid
  (``src/GuideDepth/model/GuideDepth.py:46-47``)

plus ``nn.PixelShuffle(2)`` between SAM/CRF stages
(``src/model_mobileV3_large_SAM.py:116-120``), reflection-padded 3x3 average
pooling for the monodepth2 SSIM (``src/loss.py:63-69``), and
tf.image_gradients-style forward differences
(``src/GuideDepth/losses.py:95-115``).

TPU-first design note: resizes are expressed as two small dense
interpolation-matrix contractions (one per spatial axis) instead of gathers —
einsums map straight onto the MXU, fuse with neighbouring ops, and keep all
shapes static.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense [out, in] two-tap interpolation matrix built from _interp_taps."""
    lo, hi, frac = _interp_taps(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        m[i, lo[i]] += 1.0 - frac[i]
        m[i, hi[i]] += frac[i]
    return m


@functools.lru_cache(maxsize=None)
def _interp_taps(
    in_size: int, out_size: int, align_corners: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-tap bilinear interpolation (lo indices, hi indices, hi fractions),
    torch semantics.

    align_corners=True:  src = i * (in-1)/(out-1)
    align_corners=False: src = (i + 0.5) * in/out - 0.5, clamped to >= 0
    """
    lo = np.zeros(out_size, dtype=np.int32)
    hi = np.zeros(out_size, dtype=np.int32)
    frac = np.zeros(out_size, dtype=np.float32)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / max(out_size - 1, 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = max(src, 0.0)
        l = min(int(np.floor(src)), in_size - 1)
        lo[i] = l
        hi[i] = min(l + 1, in_size - 1)
        frac[i] = src - l
    return lo, hi, frac


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch mode='nearest' source indices: floor(i * in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def _upsample2x_axis(x: jax.Array, axis: int) -> jax.Array:
    """Exact 2x bilinear upsample (align_corners=False) along one axis as
    shift-weighted interleaving — pure elementwise VPU work, no matmul/gather
    and no layout copies (the einsum form forced ~7 ms relayout copies per
    full-res tensor on v5e).

    out[2j]   = 0.25*x[j-1] + 0.75*x[j]   (edge-clamped)
    out[2j+1] = 0.75*x[j]   + 0.25*x[j+1] (edge-clamped)
    """
    n = x.shape[axis]

    def take(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    prev = jnp.concatenate([take(0, 1), take(0, n - 1)], axis=axis)
    nxt = jnp.concatenate([take(1, n), take(n - 1, n)], axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return stacked.reshape(shape).astype(x.dtype)


def resize_bilinear(
    x: jax.Array,
    size: Tuple[int, int],
    align_corners: bool = False,
) -> jax.Array:
    """Bilinear resize of NHWC ``x`` to (H, W) = ``size`` (torch parity)."""
    h_out, w_out = int(size[0]), int(size[1])
    b, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    if not align_corners and h_out == 2 * h and w_out == 2 * w:
        return _upsample2x_axis(_upsample2x_axis(x, 1), 2)
    # Interpolation as dense-matrix contractions: the matrix has only two
    # nonzeros per row, but the MXU runs the dense matmul faster than XLA's
    # spatial-axis gathers (measured on v5e). Inputs keep their dtype: bf16
    # activations take the single-pass MXU path; f32 uses HIGHEST so parity
    # with torch holds to ~1e-4 (default would round operands to bf16).
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        prec = None
        xf = x
    else:
        prec = lax.Precision.HIGHEST
        xf = x.astype(jnp.float32)
    if h != h_out:
        mh = jnp.asarray(_interp_matrix(h, h_out, align_corners)).astype(xf.dtype)
        xf = jnp.einsum("oh,bhwc->bowc", mh, xf, precision=prec,
                        preferred_element_type=jnp.float32).astype(xf.dtype)
    if w != w_out:
        mw = jnp.asarray(_interp_matrix(w, w_out, align_corners)).astype(xf.dtype)
        xf = jnp.einsum("ow,bhwc->bhoc", mw, xf, precision=prec,
                        preferred_element_type=jnp.float32).astype(xf.dtype)
    return xf.astype(dtype)


def resize_nearest(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Nearest resize of NHWC ``x`` (torch mode='nearest' parity)."""
    h_out, w_out = int(size[0]), int(size[1])
    b, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    # integer-stride downsample == strided slice (floor(i*k) = i*k), which is
    # far cheaper than a gather on TPU
    if h != h_out:
        if h % h_out == 0:
            x = x[:, :: h // h_out]
        else:
            x = jnp.take(x, jnp.asarray(_nearest_index(h, h_out)), axis=1)
    if w != w_out:
        if w % w_out == 0:
            x = x[:, :, :: w // w_out]
        else:
            x = jnp.take(x, jnp.asarray(_nearest_index(w, w_out)), axis=2)
    return x


def upsample(x: jax.Array, scale_factor: int = 2, align_corners: bool = False) -> jax.Array:
    """Scale-factor bilinear upsample (``src/model_mobileV3_large_SAM.py:55-58``)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (h * scale_factor, w * scale_factor), align_corners)


def pixel_shuffle(x: jax.Array, upscale_factor: int) -> jax.Array:
    """NHWC pixel shuffle with torch channel-order parity.

    torch (NCHW): out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w]
    (``nn.PixelShuffle(2)`` at ``src/model_mobileV3_large_SAM.py:116``).
    """
    r = upscale_factor
    b, h, w, c = x.shape
    assert c % (r * r) == 0, f"channels {c} not divisible by {r * r}"
    c_out = c // (r * r)
    x = x.reshape(b, h, w, c_out, r, r)
    # (b, h, w, c, i, j) -> (b, h, i, w, j, c)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c_out)


def reflection_pad2d(x: jax.Array, pad: int) -> jax.Array:
    """NHWC reflection padding (``nn.ReflectionPad2d``, ``src/loss.py:69``)."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def avg_pool(
    x: jax.Array,
    window: int,
    stride: int = 1,
    padding: int = 0,
    count_include_pad: bool = True,
) -> jax.Array:
    """NHWC average pool, torch ``nn.AvgPool2d`` parity (count_include_pad=True
    default, as DAPPM relies on — ``src/GuideDepth/model/DDRNet_23_slim.py:118-132``).
    """
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        pads,
    )
    if count_include_pad:
        out = summed / float(window * window)
    else:
        ones = jnp.ones_like(x[..., :1], dtype=jnp.float32)
        counts = lax.reduce_window(
            ones, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), pads
        )
        out = summed / counts
    return out.astype(x.dtype)


def max_pool(x: jax.Array, window: int, stride: int) -> jax.Array:
    """NHWC max pool (``nn.MaxPool2d(2,2)`` U-Net bridge,
    ``src/models/model_mobileV3_Unet.py:79``)."""
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def global_avg_pool(x: jax.Array, keepdims: bool = False) -> jax.Array:
    """Mean over H, W — the TensorRT-friendly SE squeeze
    (``src/GuideDepth/model/modules.py:22``) and DAPPM's global scale."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


def image_gradients(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """tf.image.image_gradients-style forward differences on NHWC.

    Returns (dx, dy); dx has zeros in its last column, dy in its last row
    (``src/GuideDepth/losses.py:95-115``).
    """
    dx = jnp.concatenate(
        [x[:, :, 1:, :] - x[:, :, :-1, :], jnp.zeros_like(x[:, :, :1, :])], axis=2
    )
    dy = jnp.concatenate(
        [x[:, 1:, :, :] - x[:, :-1, :, :], jnp.zeros_like(x[:, :1, :, :])], axis=1
    )
    return dx, dy
