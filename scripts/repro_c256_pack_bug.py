#!/usr/bin/env python
"""Minimal repro hunt for the block-4 / c256 packed-conv TPU miscompute
(PERF.md round 2: double-packing the full-res GUB stage was exact on CPU
f32/bf16 and green on golden tests, but produced non-finite losses on the
real chip; reverted undiagnosed — VERDICT r2 item 2).

Strategy: run a sweep of packed-conv configurations on THIS process's
backend and compare each against the mathematically identical plain conv
computed on the same backend in f32-HIGHEST (and against numpy on host).
Configs sweep the suspected triggers: packing block (2 vs 4 vs 2x2 nested),
channel count (16..64 -> packed 64..1024), dtype (f32 vs bf16), spatial
extent, and conv chains (conv -> relu -> conv, the GUB shape).

Usage:
  python scripts/repro_c256_pack_bug.py            # on TPU via axon
  TPUDEPTH_PLATFORM=cpu python scripts/repro_c256_pack_bug.py   # CPU control
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpudepth.ops.packed import (
        depth_to_space,
        pack_conv_kernel,
        space_to_depth,
    )

    backend = jax.default_backend()
    print(f"backend: {backend}", flush=True)
    rng = np.random.default_rng(0)

    def plain_conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )

    import functools

    @functools.partial(jax.jit, static_argnames="block")
    def packed_once(x, w, block):
        wp, (py, px) = pack_conv_kernel(w, block)
        xp = space_to_depth(x, block)
        yp = jax.lax.conv_general_dilated(
            xp, wp.astype(x.dtype), (1, 1), [(py, py), (px, px)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return depth_to_space(yp, block)

    @jax.jit
    def packed_nested(x, w):
        """Pack twice with block=2 (the round-2 'double pack' formulation):
        kernel packed at block 2, then that packed kernel packed again."""
        wp1, pad1 = pack_conv_kernel(w, 2)
        # second packing treats the once-packed conv as a plain k x k conv
        # with its own padding; only valid when pad1 == (kp1 - 1) // 2
        wp2, (py2, px2) = pack_conv_kernel(wp1, 2)
        xp = space_to_depth(space_to_depth(x, 2), 2)
        yp = jax.lax.conv_general_dilated(
            xp, wp2.astype(x.dtype), (1, 1), [(py2, py2), (px2, px2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return depth_to_space(depth_to_space(yp, 2), 2)

    @functools.partial(jax.jit, static_argnames="block")
    def chain_packed(x, w1, w2, block):
        """conv -> relu -> conv in packed space (the GUB pattern), unpacking
        only at the end."""
        wp1, (py1, px1) = pack_conv_kernel(w1, block)
        wp2, (py2, px2) = pack_conv_kernel(w2, block)
        xp = space_to_depth(x, block)
        y = jax.lax.conv_general_dilated(
            xp, wp1.astype(x.dtype), (1, 1), [(py1, py1), (px1, px1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, wp2.astype(x.dtype), (1, 1), [(py2, py2), (px2, px2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return depth_to_space(y, block)

    def chain_plain(x, w1, w2):
        return plain_conv(jax.nn.relu(plain_conv(x, w1)), w2)

    failures = []

    def check(tag, got, want, tol):
        got = np.asarray(got, np.float64)
        want = np.asarray(want, np.float64)
        if not np.isfinite(got).all():
            failures.append((tag, "NON-FINITE",
                             int((~np.isfinite(got)).sum())))
            print(f"  {tag}: NON-FINITE x{int((~np.isfinite(got)).sum())}",
                  flush=True)
            return
        err = np.abs(got - want).max()
        rel = err / max(np.abs(want).max(), 1e-9)
        status = "FAIL" if rel > tol else "ok"
        if status == "FAIL":
            failures.append((tag, "MISMATCH", float(rel)))
        print(f"  {tag}: max_abs={err:.3e} rel={rel:.3e} {status}", flush=True)

    # keep the sweep small on TPU: remote compiles cost 20-60 s each.
    # (16,16) at 480x640 is the GUB full-res stage (block4 -> c256 packed).
    sweep = [((64, 64), (16, 16)), ((480, 640), (16, 16)),
             ((480, 640), (16, 64))]
    if len(sys.argv) > 1 and sys.argv[1] == "--full":
        sweep = [(hw, cc) for hw in [(64, 64), (480, 640)]
                 for cc in [(16, 16), (16, 64), (64, 64)]]
    for (h, w_), (cin, cout) in sweep:
        x32 = rng.standard_normal((2, h, w_, cin)).astype(np.float32)
        k1 = (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
        k2 = (rng.standard_normal((3, 3, cout, cin)) * 0.1).astype(np.float32)
        want = np.asarray(plain_conv(jnp.asarray(x32), jnp.asarray(k1)))
        want_chain = np.asarray(chain_plain(
            jnp.asarray(x32), jnp.asarray(k1), jnp.asarray(k2)))
        # f32 tol is loose because TPU rounds f32 matmul operands to bf16 by
        # default (the packed variants run default precision; the reference
        # `want` is HIGHEST)
        for dt, tol in [(jnp.float32, 2e-2), (jnp.bfloat16, 5e-2)]:
            x = jnp.asarray(x32, dt)
            w1 = jnp.asarray(k1, dt)
            w2 = jnp.asarray(k2, dt)
            name = f"{h}x{w_} c{cin}->c{cout} {dt.__name__}"
            print(f"{name}:", flush=True)
            check("block2      ", packed_once(x, w1, 2), want, tol)
            if h % 4 == 0 and w_ % 4 == 0:
                check("block4      ", packed_once(x, w1, 4), want, tol)
                check("nested2x2   ", packed_nested(x, w1), want, tol)
                check("chain-block4", chain_packed(x, w1, w2, 4),
                      want_chain, tol * 4)
            check("chain-block2", chain_packed(x, w1, w2, 2),
                  want_chain, tol * 4)

    # ---- gradient checks (the round-2 failure was non-finite TRAIN losses,
    # so the forward-only sweep above may not trigger it) -------------------
    print("\n---- gradients (chain, sum-of-squares loss) ----", flush=True)

    def loss_of(fn, *args):
        return jnp.sum(fn(*args).astype(jnp.float32) ** 2)

    @functools.partial(jax.jit, static_argnames="block")
    def grads_packed(x, w1, w2, block):
        return jax.grad(
            lambda a, b, c: loss_of(chain_packed, a, b, c, block),
            argnums=(0, 1, 2))(x, w1, w2)

    @jax.jit
    def grads_plain(x, w1, w2):
        return jax.grad(lambda a, b, c: loss_of(chain_plain, a, b, c),
                        argnums=(0, 1, 2))(x, w1, w2)

    for h, w_ in [(64, 64), (480, 640)]:
        cin = cout = 16
        x32 = rng.standard_normal((2, h, w_, cin)).astype(np.float32) * 0.1
        k1 = (rng.standard_normal((3, 3, cin, cout)) * 0.1).astype(np.float32)
        k2 = (rng.standard_normal((3, 3, cout, cin)) * 0.1).astype(np.float32)
        ref = grads_plain(jnp.asarray(x32), jnp.asarray(k1), jnp.asarray(k2))
        for dt, tol in [(jnp.float32, 2e-2), (jnp.bfloat16, 8e-2)]:
            x, w1, w2 = (jnp.asarray(a, dt) for a in (x32, k1, k2))
            for blk in (2, 4):
                got = grads_packed(x, w1, w2, blk)
                for nm, g, r in zip(("dx", "dw1", "dw2"), got, ref):
                    check(f"grad-b{blk} {nm} {h}x{w_} {dt.__name__}",
                          g, r, tol)

    print("\n==== SUMMARY ====", flush=True)
    if failures:
        for tag, kind, val in failures:
            print(f"REPRO: {tag} -> {kind} ({val})")
    else:
        print(f"no failures on backend={backend}")


if __name__ == "__main__":
    main()
