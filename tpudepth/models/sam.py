"""SAM cross window-attention block (flax, NHWC).

Re-design of the reference's "SAM" module (``src/SAM.py:247-308``): a Swin
W-MSA where the *query* comes from the decoder state and K/V from the encoder
feature (``q = self.q(x)``, ``kv = self.kv(v)`` with x=decoder, v=encoder —
``src/SAM.py:102-103,119-121`` via ``SAMBLOCK.forward(q, e)`` at
``src/SAM.py:304``). 7x7 non-shifted windows, relative-position bias, MLP FFN
(ratio 4), and the triple residual ``q_out + e_proj + q_proj``
(``src/SAM.py:308``).

Note: the reference defines an unused ``self.proj`` conv (``src/SAM.py:271``)
that never participates in forward; it is intentionally not replicated.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpudepth.models.layers import Conv, LayerNorm, Mlp
from tpudepth.ops.attention import window_cross_attention_packed
from tpudepth.ops.window import (
    pad_to_window_multiple,
    relative_position_index,
    window_partition,
    window_reverse,
)


class WindowCrossAttentionQKV(nn.Module):
    """SAM-style attention: q from x (decoder), k/v from v (encoder)."""

    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x_windows: jax.Array, v_windows: jax.Array) -> jax.Array:
        # x_windows, v_windows: [BW, N, C]
        bw, n, c = x_windows.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim**-0.5

        q = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x_windows)
        kv = nn.Dense(2 * c, dtype=self.dtype, param_dtype=jnp.float32, name="kv")(v_windows)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q * scale
        # q/k/v stay channel-packed [BW, N, C]; heads split inside the op.

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, heads),
            jnp.float32,
        )
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)

        out = window_cross_attention_packed(q, k, v, bias, use_pallas=self.use_pallas)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class SAMBlock(nn.Module):
    """Windowed cross-attention + FFN (``src/SAM.py:146-244``)."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, v: jax.Array) -> jax.Array:
        # x (query source / decoder), v (encoder): [B, H, W, C]
        b, h, w, c = x.shape
        ws = self.window_size

        shortcut = x
        xn = LayerNorm(dtype=self.dtype, name="norm1")(x)
        vn = LayerNorm(dtype=self.dtype, name="normv")(v)

        xn, hp, wp = pad_to_window_multiple(xn, ws)
        vn, _, _ = pad_to_window_multiple(vn, ws)

        xw = window_partition(xn, ws).reshape(-1, ws * ws, c)
        vw = window_partition(vn, ws).reshape(-1, ws * ws, c)

        attn = WindowCrossAttentionQKV(
            self.dim, self.num_heads, ws, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn",
        )(xw, vw)

        attn = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)
        attn = attn[:, :h, :w, :]

        x = attn + shortcut
        x = x + Mlp(
            int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp"
        )(LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x


class SAM(nn.Module):
    """SAM stage wrapper (``src/SAM.py:247-308``).

    forward(e=encoder feature, q=decoder state):
      project both to embed_dim with 3x3 convs, run the cross window-attention
      block with query=q / kv=e, LayerNorm, and return q_out + e_proj + q_proj.
    """

    input_dim: int
    embed_dim: int
    v_dim: int
    num_heads: int
    window_size: int = 7
    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, e: jax.Array, q: jax.Array) -> jax.Array:
        if self.v_dim != self.embed_dim:
            q = Conv(self.embed_dim, 3, padding=1, dtype=self.dtype, name="proj_q")(q)
        if self.input_dim != self.embed_dim:
            e = Conv(self.embed_dim, 3, padding=1, dtype=self.dtype, name="proj_e")(e)
        e_proj, q_proj = e, q

        q_out = SAMBlock(
            self.embed_dim, self.num_heads, self.window_size,
            dtype=self.dtype, use_pallas=self.use_pallas, name="sam_block",
        )(q, e)
        q_out = LayerNorm(dtype=self.dtype, name="norm_sam")(q_out)
        return q_out + e_proj + q_proj
