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
    def __call__(self, x_windows: jax.Array, v_windows: jax.Array,
                 params_only: bool = False, skip_proj: bool = False):
        # x_windows, v_windows: [BW, N, C]
        bw, n, c = x_windows.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim**-0.5

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, heads),
            jnp.float32,
        )
        idx = relative_position_index(self.window_size).reshape(-1)
        nb = self.window_size ** 2  # == n on the window path; params_only may
        bias = table[idx].reshape(nb, nb, heads).transpose(2, 0, 1)  # pass full maps

        if params_only:
            # fused whole-block path: raw weights, nn.Dense-identical tree
            from tpudepth.models.layers import _DenseParams

            wq, bq = _DenseParams(c, name="q")(c)
            wkv, bkv = _DenseParams(2 * c, name="kv")(c)
            wproj, bproj = _DenseParams(c, name="proj")(c)
            return dict(wq=wq, bq=bq, wkv=wkv, bkv=bkv, wproj=wproj,
                        bproj=bproj, bias=bias, scale=scale)

        q = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x_windows)
        kv = nn.Dense(2 * c, dtype=self.dtype, param_dtype=jnp.float32, name="kv")(v_windows)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q * scale
        # q/k/v stay channel-packed [BW, N, C]; heads split inside the op.

        out = window_cross_attention_packed(q, k, v, bias, use_pallas=self.use_pallas)
        if skip_proj:
            # fused-epilogue path: the out-projection runs inside the block's
            # tail kernel; declare its params through the same "proj" child.
            from tpudepth.models.layers import _DenseParams

            return out, _DenseParams(c, name="proj")(c)
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

        if self._use_rowblock(c, w):
            return self._rowblock(x, v)
        if self._use_fused_block(c):
            return self._fused_block(x, v)

        shortcut = x
        xn = LayerNorm(dtype=self.dtype, name="norm1")(x)
        vn = LayerNorm(dtype=self.dtype, name="normv")(v)

        xn, hp, wp = pad_to_window_multiple(xn, ws)
        vn, _, _ = pad_to_window_multiple(vn, ws)

        xw = window_partition(xn, ws).reshape(-1, ws * ws, c)
        vw = window_partition(vn, ws).reshape(-1, ws * ws, c)

        use_epi = self._use_fused_epilogue(b * h * w, c)
        attn = WindowCrossAttentionQKV(
            self.dim, self.num_heads, ws, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn",
        )(xw, vw, skip_proj=use_epi)
        if use_epi:
            attn, (wproj, bproj) = attn

        attn = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)
        attn = attn[:, :h, :w, :]

        if use_epi:
            # proj + residual + LN2 + FFN + residual in one flat-row kernel
            # (ops/pallas/epilogue_infer.py) — row-wise, so running the proj
            # after window_reverse/crop is value-identical to the unfused
            # proj-on-windows order.
            from tpudepth.ops.pallas.epilogue_infer import block_epilogue_infer

            ln2 = LayerNorm(dtype=self.dtype, name="norm2")(x, params_only=True)
            w1, b1, w2, b2 = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                                 name="mlp")(x, params_only=True)
            out = block_epilogue_infer(
                attn.reshape(b * h * w, c),
                shortcut.reshape(b * h * w, c).astype(attn.dtype),
                wproj, bproj, ln2[0], ln2[1], w1, b1, w2, b2)
            return out.reshape(b, h, w, c)

        x = attn + shortcut
        x = x + Mlp(
            int(c * self.mlp_ratio), c, dtype=self.dtype, name="mlp"
        )(LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x

    def _use_fused_epilogue(self, m: int, c: int) -> bool:
        """Default-on for TPU eval: the flat-row block-tail kernel
        (``ops/pallas/epilogue_infer.py``) — proj + residual + LN2 + FFN +
        residual with every intermediate in VMEM, full-height MXU tiles.
        ``TPUDEPTH_EPILOGUE=xla`` opts out."""
        import os

        from tpudepth.ops.attention import is_training_trace

        if (jax.default_backend() != "tpu" or is_training_trace()
                or os.environ.get("TPUDEPTH_EPILOGUE") == "xla"
                or self.use_pallas is False):
            return False
        from tpudepth.ops.pallas.epilogue_infer import epilogue_available

        return epilogue_available(m, c, int(c * self.mlp_ratio))

    def _use_fused_block(self, c: int) -> bool:
        """Opt-IN (``TPUDEPTH_BLOCK=fused``): the whole-block kernel is
        correct on-chip (rel-err 2e-2 bf16) but measured SLOWER than the
        default attn+FFN kernel pair — 429.9 vs 542.4 img/s @480x640 bs8 —
        because per-window [56,C] dots starve the MXU that the flat-layout
        kernels keep full (PERF.md round 5 quantified negative)."""
        import os

        from tpudepth.ops.attention import is_training_trace

        if (jax.default_backend() != "tpu" or is_training_trace()
                or os.environ.get("TPUDEPTH_BLOCK") != "fused"
                or self.use_pallas is False):
            return False
        from tpudepth.ops.pallas.block_infer import block_infer_available

        return block_infer_available(c, self.num_heads, int(c * self.mlp_ratio))

    def _use_rowblock(self, c: int, w: int) -> bool:
        """Window-ROW whole-block kernel (``ops/pallas/rowblock_infer.py``):
        image-layout spatial blocks (no HBM partition/reverse copies) with
        flat full-height projections. Opt-IN for SAM (``TPUDEPTH_BLOCK=row``)
        — the same-process min-of-reps A/B measured 14.44 vs the kernel
        pair's 14.13-14.38 ms/batch @480x640 bs8: SAM has no shifted
        blocks, so the copies the row kernel removes are smaller than its
        in-kernel windowize-relayout cost (PERF.md round 5; NewCRF, where
        the cyclic shifts double the copy traffic, defaults to row)."""
        import os

        from tpudepth.ops.attention import is_training_trace

        if (jax.default_backend() != "tpu" or is_training_trace()
                or os.environ.get("TPUDEPTH_BLOCK") != "row"
                or self.use_pallas is False):
            return False
        from tpudepth.ops.pallas.rowblock_infer import (
            _roundup, rowblock_available)

        return rowblock_available(c, self.num_heads, int(c * self.mlp_ratio),
                                  _roundup(w, self.window_size))

    def _rowblock(self, x: jax.Array, v: jax.Array) -> jax.Array:
        """TPU-inference path: the whole SAM block as one window-row kernel
        reading/writing the raw unpadded image layout (no pad, partition,
        reverse, or crop copies at all — SAM windows are never shifted)."""
        from tpudepth.ops.pallas.rowblock_infer import sam_rowblock_infer

        b, h, w, c = x.shape
        ws = self.window_size
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        ln1, lnv, ap, ln2, (w1, b1, w2, b2) = self._declare_params(x, v)
        xp, hp, wp = pad_to_window_multiple(x.astype(dt), ws)
        vp, _, _ = pad_to_window_multiple(v.astype(dt), ws)
        y = sam_rowblock_infer(
            xp, vp, ln1, lnv, ap["wq"], ap["bq"],
            ap["wkv"], ap["bkv"], ap["bias"], ap["wproj"], ap["bproj"],
            ln2, w1, b1, w2, b2, scale=ap["scale"], window_size=ws,
            valid_hw=(h, w))
        return y[:, :h, :w, :]

    def _declare_params(self, x: jax.Array, v: jax.Array):
        """Declare every block param through the SAME submodule names the
        unfused path uses (tree equality asserted in tests) and return the
        raw values for the fused kernel."""
        b, h, w, c = x.shape
        ws = self.window_size
        ln1 = LayerNorm(dtype=self.dtype, name="norm1")(x, params_only=True)
        lnv = LayerNorm(dtype=self.dtype, name="normv")(v, params_only=True)
        ap = WindowCrossAttentionQKV(
            self.dim, self.num_heads, ws, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn",
        )(x.reshape(b, h * w, c), v.reshape(b, h * w, c), params_only=True)
        ln2 = LayerNorm(dtype=self.dtype, name="norm2")(x, params_only=True)
        mlp = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                  name="mlp")(x, params_only=True)
        return ln1, lnv, ap, ln2, mlp

    def _fused_block(self, x: jax.Array, v: jax.Array) -> jax.Array:
        """TPU-inference path: the whole block (LN1/LNv -> q/kv projections ->
        windowed attention -> proj -> residual -> LN2 -> FFN -> residual) runs
        as ONE Pallas kernel per window tile (``ops/pallas/block_infer.py``) —
        only raw windows and the output touch HBM. Params are declared through
        the same submodules as the unfused path (identical tree)."""
        from tpudepth.ops.pallas.block_infer import sam_block_infer
        from tpudepth.ops.window import window_valid_mask

        b, h, w, c = x.shape
        ws = self.window_size
        n = ws * ws
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        ln1, lnv, ap, ln2, (w1, b1, w2, b2) = self._declare_params(x, v)

        xp, hp, wp = pad_to_window_multiple(x, ws)
        vp, _, _ = pad_to_window_multiple(v, ws)
        xw = window_partition(xp, ws).reshape(-1, n, c).astype(dt)
        vw = window_partition(vp, ws).reshape(-1, n, c)
        valid = window_valid_mask(h, w, ws)

        yw = sam_block_infer(
            xw, vw, ln1, lnv, ap["wq"], ap["bq"], ap["wkv"], ap["bkv"],
            ap["bias"], ap["wproj"], ap["bproj"], ln2, w1, b1, w2, b2,
            valid, scale=ap["scale"],
        )
        y = window_reverse(yw.reshape(-1, ws, ws, c), ws, hp, wp)
        return y[:, :h, :w, :]


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
