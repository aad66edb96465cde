#!/usr/bin/env python
"""Micro-bench: old specialized upsample2x_pack4 (HEAD, parity-group
reshape) vs the generic rect upsample2x_pack(x, 4) (strided-slice taps) at
the full-res stage-3 input shape [16,240,320,16] bf16, fwd and fwd+vjp.

Run `git show HEAD:tpudepth/ops/packed.py > /tmp/packed_old.py` first.
"""
import functools
import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudepth.core.runtime import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

spec = importlib.util.spec_from_file_location("packed_old", "/tmp/packed_old.py")
packed_old = importlib.util.module_from_spec(spec)
spec.loader.exec_module(packed_old)

from tpudepth.ops.packed import upsample2x_pack


def timeit(fn, x, k1=2, k2=22):
    @functools.partial(jax.jit, static_argnames="k")
    def run_k(x, k):
        def body(carry, _):
            y = fn(carry[..., :16])
            return carry + 0.0 * y.sum(), jnp.float32(0)
        out, _ = jax.lax.scan(body, x, None, length=k)
        return out

    times = {}
    for k in (k1, k2):
        out = run_k(x, k)
        float(out.reshape(-1)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        out = run_k(x, k)
        float(out.reshape(-1)[0].astype(jnp.float32))
        times[k] = time.perf_counter() - t0
    return (times[k2] - times[k1]) / (k2 - k1) * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, 240, 320, 16)), jnp.bfloat16)

    old = packed_old.upsample2x_pack4
    new = functools.partial(upsample2x_pack, block=4)
    # numerics identical?
    a = np.asarray(old(x.astype(jnp.float32)))
    b = np.asarray(new(x.astype(jnp.float32)))
    print("max abs diff:", np.abs(a - b).max())

    for name, fn in [("old pack4", old), ("new generic", new)]:
        ms = timeit(fn, x)
        vf = lambda z: fn(z).astype(jnp.float32).sum()
        g = jax.grad(lambda z: vf(z))
        ms_g = timeit(lambda z: g(z).astype(jnp.bfloat16), x)
        print(f"{name:12s}: fwd {ms:6.3f} ms   grad {ms_g:6.3f} ms")


if __name__ == "__main__":
    main()
