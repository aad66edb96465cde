"""NewCRF neural-window FC-CRF block (flax, NHWC).

Re-design of ``src/newcrf_layers.py``: a two-block stage where Q and K both
come from the projected *unary* (encoder feature) while the attention values
are the *decoder* state (``qk = self.qk(x)``, values from ``v`` —
``src/newcrf_layers.py:102,118-119,143-146``). Block 1 uses plain 7x7 windows;
block 2 uses a cyclic shift of window_size//2 with the SW-MSA additive mask
(``src/newcrf_layers.py:219-246,301-350``). The decoder value ``v`` is NOT
layer-normalized and is re-used by both blocks (``src/newcrf_layers.py:352-357``).
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
    shifted_window_attention_mask,
    window_partition,
    window_reverse,
)


class WindowAttentionQKfromX(nn.Module):
    """NewCRF attention: q,k from x (unary), raw v as values
    (``src/newcrf_layers.py:110-149``)."""

    dim: int
    num_heads: int
    window_size: int = 7
    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(
        self, x_windows: jax.Array, v_windows: jax.Array, mask: Optional[jax.Array]
    ) -> jax.Array:
        bw, n, c = x_windows.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim**-0.5

        qk = nn.Dense(2 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qk")(x_windows)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q * scale
        # values used raw, no projection (:143-144); q/k/v stay channel-packed
        # [BW, N, C] — head splitting happens inside the attention op.

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, heads),
            jnp.float32,
        )
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1)

        out = window_cross_attention_packed(
            q, k, v_windows, bias, mask, use_pallas=self.use_pallas
        )
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class CRFBlock(nn.Module):
    """One (optionally shifted) CRF block (``src/newcrf_layers.py:152-257``)."""

    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, v: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size

        shortcut = x
        xn = LayerNorm(dtype=self.dtype, name="norm1")(x)  # v is not normalized

        xn, hp, wp = pad_to_window_multiple(xn, ws)
        vp, _, _ = pad_to_window_multiple(v, ws)

        if ss > 0:
            xn = jnp.roll(xn, shift=(-ss, -ss), axis=(1, 2))
            vp = jnp.roll(vp, shift=(-ss, -ss), axis=(1, 2))
            mask_np = shifted_window_attention_mask(h, w, ws, ss)
            mask = jnp.asarray(mask_np)
        else:
            mask = None

        xw = window_partition(xn, ws).reshape(-1, ws * ws, c)
        vw = window_partition(vp, ws).reshape(-1, ws * ws, c)

        attn = WindowAttentionQKfromX(
            self.dim, self.num_heads, ws, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn",
        )(xw, vw, mask)

        attn = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)
        if ss > 0:
            attn = jnp.roll(attn, shift=(ss, ss), axis=(1, 2))
        attn = attn[:, :h, :w, :]

        x = shortcut + attn
        x = x + Mlp(
            int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp"
        )(LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x


class NewCRF(nn.Module):
    """NewCRF stage (``src/newcrf_layers.py:367-433``): project unary x and
    value v to embed_dim, run depth=2 CRF blocks (shift 0 then ws//2), final
    LayerNorm."""

    input_dim: int
    embed_dim: int
    v_dim: int
    num_heads: int
    window_size: int = 7
    depth: int = 2
    dtype: Optional[Any] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array, v: jax.Array) -> jax.Array:
        if self.input_dim != self.embed_dim:
            x = Conv(self.embed_dim, 3, padding=1, dtype=self.dtype, name="proj_x")(x)
        if self.v_dim != self.embed_dim:
            v = Conv(self.embed_dim, 3, padding=1, dtype=self.dtype, name="proj_v")(v)

        for i in range(self.depth):
            x = CRFBlock(
                self.embed_dim,
                self.num_heads,
                self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"block{i}",
            )(x, v)
        return LayerNorm(dtype=self.dtype, name="norm_crf")(x)
