#!/usr/bin/env python
"""Spike: fused (prelude-BN-relu -> 3x3 conv -> bias -> BN-stat accumulate)
pallas kernel at the packed GUB stage-3 shape [16,120,160,256], vs the XLA
equivalent. Correctness on CPU (interpret) + device time on TPU via the
scan-differential protocol.

Usage: python scripts/spike_gubconv.py [cpu|tpu]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if MODE == "cpu":
    os.environ["TPUDEPTH_PLATFORM"] = "cpu"
from tpudepth.core.runtime import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(x_ref, scale_ref, shift_ref, w_ref, b_ref, out_ref, sum_ref, sq_ref):
    # x: [1, H, W, Cin]; w: [3, 3, Cin, Cout]; out: [1, H, W, Cout]
    _, h, wd, cin = x_ref.shape
    cout = out_ref.shape[-1]
    dt = x_ref.dtype
    x = x_ref[0]
    # prelude: bn affine + relu in f32, rounded back to input dtype
    xa = jax.nn.relu(
        x.astype(jnp.float32) * scale_ref[:].astype(jnp.float32)
        + shift_ref[:].astype(jnp.float32)
    ).astype(dt)
    # zero-pad H and W by 1 (value-level concat)
    zrow = jnp.zeros((1, wd, cin), dt)
    xa = jnp.concatenate([zrow, xa, zrow], axis=0)
    zcol = jnp.zeros((h + 2, 1, cin), dt)
    xa = jnp.concatenate([zcol, xa, zcol], axis=1)
    acc = jnp.zeros((h * wd, cout), jnp.float32)
    for u in range(3):
        for v in range(3):
            xs = jax.lax.slice(xa, (u, v, 0), (u + h, v + wd, cin))
            xs = xs.reshape(h * wd, cin)
            acc = acc + jax.lax.dot_general(
                xs, w_ref[u, v],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y = (acc + b_ref[:].astype(jnp.float32)).astype(out_ref.dtype)
    out_ref[0] = y.reshape(h, wd, cout)
    yf = y.astype(jnp.float32)
    s = jnp.sum(yf, axis=0)
    q = jnp.sum(yf * yf, axis=0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        sum_ref[:] = s
        sq_ref[:] = q

    @pl.when(pl.program_id(0) != 0)
    def _():
        sum_ref[:] = sum_ref[:] + s
        sq_ref[:] = sq_ref[:] + q


def fused_conv(x, scale, shift, w, b, interpret=False):
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    grid = (bsz,)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
            jax.ShapeDtypeStruct((cout,), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, wd, cin), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((cin,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wd * 9 * cin * cout,
            bytes_accessed=(bsz * h * wd * (cin + cout)) * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(x, scale, shift, w, b)


def xla_ref(x, scale, shift, w, b):
    dt = x.dtype
    xa = jax.nn.relu(
        x.astype(jnp.float32) * scale.astype(jnp.float32)
        + shift.astype(jnp.float32)
    ).astype(dt)
    y = jax.lax.conv_general_dilated(
        xa, w.astype(dt), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(dt)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))


def scan_time(fn, args, k1=10, k2=60):
    # Thread the input through the carry (perf.py protocol) so XLA cannot
    # hoist the loop-invariant computation out of the scan.
    @functools.partial(jax.jit, static_argnums=(1,))
    def run_k(a, k):
        x0, rest = a[0], a[1:]
        def body(c, _):
            o = fn(c, *rest)
            bump = sum(oi.astype(jnp.float32).mean() for oi in o)
            return c + (bump * 0).astype(c.dtype), None
        return jax.lax.scan(body, x0, None, length=k)[0].astype(jnp.float32).mean()

    ts = {}
    for k in (k1, k2):
        float(run_k(args, k))
        t0 = time.perf_counter()
        float(run_k(args, k))
        ts[k] = time.perf_counter() - t0
    return (ts[k2] - ts[k1]) / (k2 - k1)


def main():
    bsz, h, wd, cin, cout = (4, 120, 160, 256, 256) if MODE == "cpu" else (16, 120, 160, 256, 256)
    rng = np.random.default_rng(0)
    dt = jnp.float32 if MODE == "cpu" else jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((bsz, h, wd, cin)).astype(np.float32)).astype(dt)
    scale = jnp.asarray(rng.standard_normal((cin,)).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal((cin,)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, cin, cout)) * 0.02).astype(np.float32)).astype(dt)
    b = jnp.asarray((rng.standard_normal((cout,)) * 0.1).astype(np.float32))

    if MODE == "cpu":
        y0, s0, q0 = xla_ref(x, scale, shift, w, b)
        y1, s1, q1 = fused_conv(x, scale, shift, w, b, interpret=True)
        print("y rel", float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))) / jnp.max(jnp.abs(y0.astype(jnp.float32)))))
        print("s rel", float(jnp.max(jnp.abs(s0 - s1)) / jnp.max(jnp.abs(s0))))
        print("q rel", float(jnp.max(jnp.abs(q0 - q1)) / jnp.max(jnp.abs(q0))))
        return

    t_xla = scan_time(xla_ref, (x, scale, shift, w, b))
    print(f"xla   conv+stats: {t_xla*1e3:.3f} ms", flush=True)
    t_pal = scan_time(fused_conv, (x, scale, shift, w, b))
    print(f"pallas conv+stats: {t_pal*1e3:.3f} ms", flush=True)
    # numerics on chip
    y0, s0, q0 = jax.jit(xla_ref)(x, scale, shift, w, b)
    y1, s1, q1 = jax.jit(fused_conv)(x, scale, shift, w, b)
    print("y rel", float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))) / jnp.max(jnp.abs(y0.astype(jnp.float32)))))
    print("s rel", float(jnp.max(jnp.abs(s0 - s1)) / jnp.max(jnp.abs(s0))))


if __name__ == "__main__":
    main()
