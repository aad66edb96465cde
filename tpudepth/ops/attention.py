"""Windowed multi-head cross-attention compute core.

This is the hot op of the SAM / NewCRF decoders: thousands of independent
7x7=49-token windows per image, each running a tiny MHA
(``src/SAM.py:111-144``, ``src/newcrf_layers.py:110-149``). The windows never
communicate — they batch perfectly over (batch x windows), which is exactly
how the XLA path and the Pallas kernel lay them out.

Two implementations with identical numerics:

- ``window_cross_attention`` — pure XLA einsum path (batched onto the MXU by
  the compiler). Reference implementation, always available.
- :mod:`tpudepth.ops.pallas.window_attn` — XLA einsum forward + fused Pallas
  BACKWARD (scores/softmax stay in VMEM during the bwd pass); default on TPU.
  A/B measured on v5e @480x640: inference identical to the XLA path by
  construction, SAM train step 137.6 vs 130.4 img/s (+5.5%), and the fused
  bwd is what lifted SAM training from round-1's 53 img/s.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
import jax.numpy as jnp

#: Trace-time flag: True while a training step is being traced. The pallas
#: kernel pair only wins when the fused backward is in play, so the default
#: dispatch keys off this instead of forcing every model to thread `train`
#: down to the attention call.
_TRAINING = contextvars.ContextVar("tpudepth_attn_training", default=False)


@contextlib.contextmanager
def training_mode(on: bool = True):
    """Mark subsequent (trace-time) attention calls as training-context."""
    token = _TRAINING.set(on)
    try:
        yield
    finally:
        _TRAINING.reset(token)


def is_training_trace() -> bool:
    """True while a training step is being traced (see ``training_mode``) —
    shared by the eval-only kernel dispatches (attention, fused MLP)."""
    return _TRAINING.get()


def _to_heads(t: jax.Array, heads: int) -> jax.Array:
    bw, n, c = t.shape
    return t.reshape(bw, n, heads, c // heads).transpose(0, 2, 1, 3)


def _from_heads(t: jax.Array) -> jax.Array:
    bw, h, n, d = t.shape
    return t.transpose(0, 2, 1, 3).reshape(bw, n, h * d)


def window_cross_attention_packed(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Channel-packed window attention: q/k/v and output are [BW, N, C].

    This is the call sites' natural layout (straight out of the QK/KV
    projections, straight into the output projection). On TPU inference it
    dispatches to the fused channel-packed Pallas kernel
    (:mod:`tpudepth.ops.pallas.window_attn_infer`) — no head-split transposes
    and no [BW, heads, N, N] probability round-trips through HBM, which
    profiling showed dominate the NewCRF eval path (PERF.md round 3). All
    other contexts (training, CPU, TPUDEPTH_ATTN overrides) split heads and
    defer to :func:`window_cross_attention`.
    """
    import os

    heads = bias.shape[0]
    env = os.environ.get("TPUDEPTH_ATTN")
    eval_on_tpu = jax.default_backend() == "tpu" and not _TRAINING.get()
    want_packed = use_pallas if use_pallas is not None else env not in ("xla", "fast")
    if eval_on_tpu and want_packed:
        from tpudepth.ops.pallas.window_attn_infer import window_attention_infer

        return window_attention_infer(q, k, v, bias, mask)
    out = window_cross_attention(
        _to_heads(q, heads), _to_heads(k, heads), _to_heads(v, heads),
        bias, mask, use_pallas=use_pallas,
    )
    return _from_heads(out)


def window_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
    *,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Attention over independent windows.

    Args:
      q: [BW, heads, N, D] queries, already scaled by D**-0.5.
      k: [BW, heads, N, D] keys.
      v: [BW, heads, N, D] values.
      bias: [heads, N, N] relative-position bias (broadcast over windows).
      mask: optional [nW, N, N] additive shift mask; BW must be a multiple of
        nW and windows are laid out [B, nW]-major, matching the reference's
        ``attn.view(B_//nW, nW, heads, N, N) + mask`` (``src/SAM.py:131-134``).

    Returns: [BW, heads, N, D] attention output.
    """
    import os

    env = os.environ.get("TPUDEPTH_ATTN")  # 'pallas'|'xla'|'fast' (A/B bench)
    if use_pallas is None:
        if env in ("pallas", "xla", "fast"):
            use_pallas = env == "pallas"
        else:
            use_pallas = jax.default_backend() == "tpu" and _TRAINING.get()
    if use_pallas:
        from tpudepth.ops.pallas.window_attn import window_attention

        return window_attention(q, k, v, bias, mask)
    if env != "xla" and jax.default_backend() == "tpu" and not _TRAINING.get():
        # inference on TPU: compute-dtype einsums (the f32-HIGHEST golden
        # path costs 6 bf16 MXU passes per matmul AND doubles HBM bytes —
        # measured the difference between NewCRF eval sitting below the
        # roofline and at it, PERF.md round 3). Softmax stays f32. The rest
        # of the model already runs default-precision bf16 at inference.
        return window_cross_attention_fast(q, k, v, bias, mask)
    return window_cross_attention_xla(q, k, v, bias, mask)


def window_cross_attention_fast(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Compute-dtype (bf16 in production) attention with f32 logits/softmax."""
    bw, heads, n, d = q.shape
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bw // nw, nw, heads, n, n) + mask[None, :, None].astype(
            jnp.float32
        )
        attn = attn.reshape(bw, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def window_cross_attention_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    bw, heads, n, d = q.shape
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    # HIGHEST keeps true-f32 MXU passes so this path is a golden reference on
    # TPU too (default TPU precision would round the operands to bf16).
    attn = jnp.einsum(
        "bhnd,bhmd->bhnm", qf, kf,
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bw // nw, nw, heads, n, n) + mask[None, :, None].astype(
            jnp.float32
        )
        attn = attn.reshape(bw, heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", attn, v.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(q.dtype)
