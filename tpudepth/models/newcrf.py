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
        self, x_windows: jax.Array, v_windows: jax.Array,
        mask: Optional[jax.Array] = None, params_only: bool = False,
        skip_proj: bool = False,
    ):
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
        nb = self.window_size ** 2
        bias = table[idx].reshape(nb, nb, heads).transpose(2, 0, 1)

        if params_only:
            # fused whole-block path: raw weights, nn.Dense-identical tree
            from tpudepth.models.layers import _DenseParams

            wqk, bqk = _DenseParams(2 * c, name="qk")(c)
            wproj, bproj = _DenseParams(c, name="proj")(c)
            return dict(wqk=wqk, bqk=bqk, wproj=wproj, bproj=bproj,
                        bias=bias, scale=scale)

        qk = nn.Dense(2 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qk")(x_windows)
        q, k = jnp.split(qk, 2, axis=-1)
        q = q * scale
        # values used raw, no projection (:143-144); q/k/v stay channel-packed
        # [BW, N, C] — head splitting happens inside the attention op.

        out = window_cross_attention_packed(
            q, k, v_windows, bias, mask, use_pallas=self.use_pallas
        )
        if skip_proj:
            # fused-epilogue path: the out-projection runs inside the block's
            # tail kernel; declare its params through the same "proj" child.
            from tpudepth.models.layers import _DenseParams

            return out, _DenseParams(c, name="proj")(c)
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
    def __call__(self, x: jax.Array, v: jax.Array,
                 padded_io: Optional[tuple] = None) -> jax.Array:
        """``padded_io=(h, w)``: x/v are already zero-padded to window
        multiples (true content extent h x w) and the PADDED output is
        returned — the NewCRF stage chains its two blocks without the
        intermediate crop/re-pad copies (rowblock path only)."""
        if padded_io is not None:
            return self._rowblock(x, v, padded_io)
        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size

        if self._use_rowblock(c, w):
            return self._rowblock(x, v)
        if self._use_fused_block(c):
            return self._fused_block(x, v)

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

        use_epi = self._use_fused_epilogue(b * h * w, c)
        attn = WindowAttentionQKfromX(
            self.dim, self.num_heads, ws, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn",
        )(xw, vw, mask, skip_proj=use_epi)
        if use_epi:
            attn, (wproj, bproj) = attn

        attn = window_reverse(attn.reshape(-1, ws, ws, c), ws, hp, wp)
        if ss > 0:
            attn = jnp.roll(attn, shift=(ss, ss), axis=(1, 2))
        attn = attn[:, :h, :w, :]

        if use_epi:
            # proj + residual + LN2 + FFN + residual in one flat-row kernel
            # (ops/pallas/epilogue_infer.py); proj after reverse/unroll/crop
            # is value-identical to the unfused proj-on-windows order.
            from tpudepth.ops.pallas.epilogue_infer import block_epilogue_infer

            ln2 = LayerNorm(dtype=self.dtype, name="norm2")(x, params_only=True)
            w1, b1, w2, b2 = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                                 name="mlp")(x, params_only=True)
            out = block_epilogue_infer(
                attn.reshape(b * h * w, c),
                shortcut.reshape(b * h * w, c).astype(attn.dtype),
                wproj, bproj, ln2[0], ln2[1], w1, b1, w2, b2)
            return out.reshape(b, h, w, c)

        x = shortcut + attn
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
        """Opt-IN (``TPUDEPTH_BLOCK=fused``): correct on-chip (rel-err 8e-3)
        but measured SLOWER than the default attn+FFN kernel pair — 274.1 vs
        385.0 img/s @480x640 bs8 — per-window [56,C] dots starve the MXU
        (PERF.md round 5 quantified negative)."""
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
        reads window rows straight out of the image layout (no HBM
        partition/reverse copies) while keeping projections/FFN on flat
        full-height MXU tiles. DEFAULT for NewCRF TPU eval — device-true
        xplane totals 19.58 vs the attn+epilogue kernel pair's 19.84
        ms/batch @480x640 bs8 (+1.3%, confirmed by the same-process
        min-of-reps scan A/B; PERF.md round 5). ``TPUDEPTH_BLOCK=pair``
        (or ``fused``) opts out."""
        import os

        from tpudepth.ops.attention import is_training_trace

        if (jax.default_backend() != "tpu" or is_training_trace()
                or os.environ.get("TPUDEPTH_BLOCK", "row") != "row"
                or self.use_pallas is False):
            return False
        from tpudepth.ops.pallas.rowblock_infer import (
            _roundup, rowblock_available)

        return rowblock_available(c, self.num_heads, int(c * self.mlp_ratio),
                                  _roundup(w, self.window_size))

    def _rowblock(self, x: jax.Array, v: jax.Array,
                  padded_io: Optional[tuple] = None) -> jax.Array:
        """TPU-inference path: the whole CRF block as one window-row kernel.
        Shifted blocks keep the XLA roll/unroll copies (wrap-around is not
        expressible as a block index map). With ``padded_io`` the pad/crop
        copies move to the stage level (the valid-mask semantics only need
        pad POSITIONS zeroed on the q/k/v streams, which `LN(x) * valid`
        does in-kernel, so a previous block's finite pad-position garbage
        in x is harmless)."""
        from tpudepth.ops.pallas.rowblock_infer import crf_rowblock_infer

        b, hh, ww, c = x.shape
        ws, ss = self.window_size, self.shift_size
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        ln1, ap, ln2, (w1, b1, w2, b2) = self._declare_params(x, v)
        x = x.astype(dt)
        v = v.astype(dt)

        if padded_io is not None:
            h, w = padded_io
            xp, vp = x, v
        else:
            h, w = hh, ww
            xp, _, _ = pad_to_window_multiple(x, ws)
            vp, _, _ = pad_to_window_multiple(v, ws)

        if ss > 0:
            xr = jnp.roll(xp, (-ss, -ss), axis=(1, 2))
            vr = jnp.roll(vp, (-ss, -ss), axis=(1, 2))
            mask = jnp.asarray(shifted_window_attention_mask(h, w, ws, ss))
            yr = crf_rowblock_infer(
                xr, vr, ln1, ap["wqk"], ap["bqk"], ap["bias"], ap["wproj"],
                ap["bproj"], ln2, w1, b1, w2, b2, mask, scale=ap["scale"],
                window_size=ws, valid_hw=(h, w, ss))
            y = jnp.roll(yr, (ss, ss), axis=(1, 2))
        else:
            y = crf_rowblock_infer(
                xp, vp, ln1, ap["wqk"], ap["bqk"], ap["bias"], ap["wproj"],
                ap["bproj"], ln2, w1, b1, w2, b2, None, scale=ap["scale"],
                window_size=ws, valid_hw=(h, w, 0))
        if padded_io is not None:
            return y
        return y[:, :h, :w, :]

    def _declare_params(self, x: jax.Array, v: jax.Array):
        """Declare every block param through the SAME submodule names the
        unfused path uses (tree equality asserted in tests) and return the
        raw values for the fused kernel."""
        b, h, w, c = x.shape
        ws = self.window_size
        ln1 = LayerNorm(dtype=self.dtype, name="norm1")(x, params_only=True)
        ap = WindowAttentionQKfromX(
            self.dim, self.num_heads, ws, dtype=self.dtype,
            use_pallas=self.use_pallas, name="attn",
        )(x.reshape(b, h * w, c), v.reshape(b, h * w, c), params_only=True)
        ln2 = LayerNorm(dtype=self.dtype, name="norm2")(x, params_only=True)
        mlp = Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype,
                  name="mlp")(x, params_only=True)
        return ln1, ap, ln2, mlp

    def _fused_block(self, x: jax.Array, v: jax.Array) -> jax.Array:
        """TPU-inference path: LN1 -> qk projection -> (shifted) windowed
        attention on raw values -> proj -> residual -> LN2 -> FFN -> residual
        as ONE Pallas kernel per window tile (``ops/pallas/block_infer.py``).
        Params declared through the same submodules as the unfused path."""
        from tpudepth.ops.pallas.block_infer import crf_block_infer
        from tpudepth.ops.window import window_valid_mask

        b, h, w, c = x.shape
        ws, ss = self.window_size, self.shift_size
        n = ws * ws
        dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        ln1, ap, ln2, (w1, b1, w2, b2) = self._declare_params(x, v)

        xp, hp, wp = pad_to_window_multiple(x, ws)
        vp, _, _ = pad_to_window_multiple(v, ws)
        mask = None
        if ss > 0:
            xp = jnp.roll(xp, shift=(-ss, -ss), axis=(1, 2))
            vp = jnp.roll(vp, shift=(-ss, -ss), axis=(1, 2))
            mask = jnp.asarray(shifted_window_attention_mask(h, w, ws, ss))
        xw = window_partition(xp, ws).reshape(-1, n, c).astype(dt)
        vw = window_partition(vp, ws).reshape(-1, n, c)
        valid = window_valid_mask(h, w, ws, ss)

        yw = crf_block_infer(
            xw, vw, ln1, ap["wqk"], ap["bqk"], ap["bias"], ap["wproj"],
            ap["bproj"], ln2, w1, b1, w2, b2, mask, valid, scale=ap["scale"],
        )
        y = window_reverse(yw.reshape(-1, ws, ws, c), ws, hp, wp)
        if ss > 0:
            y = jnp.roll(y, shift=(ss, ss), axis=(1, 2))
        return y[:, :h, :w, :]


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

        blocks = [
            CRFBlock(
                self.embed_dim,
                self.num_heads,
                self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"block{i}",
            )
            for i in range(self.depth)
        ]
        import os

        b, h, w, c = x.shape
        if (blocks and blocks[0]._use_rowblock(self.embed_dim, w)
                and os.environ.get("TPUDEPTH_STAGE_CHAIN") == "on"):
            # stage-level padded IO: pad x/v ONCE, chain the window-row
            # block kernels on the padded layout (no crop/re-pad between
            # blocks), crop once at the end. Opt-IN quantified negative:
            # same-process A/B measured it ~1% SLOWER than per-block
            # pad/crop (19.84-20.01 vs 19.58-19.76 ms/batch @480x640 bs8)
            # — XLA's crop+pad+roll fusions were already single copies, and
            # chaining denies XLA the zero-pad constant folding it applies
            # to freshly padded kernel inputs (PERF.md round 5).
            dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
            xp, _, _ = pad_to_window_multiple(x.astype(dt), self.window_size)
            vp, _, _ = pad_to_window_multiple(v.astype(dt), self.window_size)
            for blk in blocks:
                xp = blk(xp, vp, padded_io=(h, w))
            x = xp[:, :h, :w, :]
        else:
            for blk in blocks:
                x = blk(x, v)
        return LayerNorm(dtype=self.dtype, name="norm_crf")(x)
