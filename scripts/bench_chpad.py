#!/usr/bin/env python
"""Do 128-lane-padded convs beat the H-in-lanes conv emitter + its copies?

The train-step profile (PERF.md round 2) shows XLA choosing a spatial-lanes
strategy for the packed c64 3x3 convs at 240x320, paying ~16 ms/step in
layout copies. This microbench compares a 4-deep conv(+bias+relu) chain:
  A: c64 -> c64 as-is
  B: channels zero-padded to 128 around each conv (pad/slice at chain ends)
fwd and fwd+bwd, scan differential.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    bs, h, w, c = 16, 240, 320, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((bs, h, w, c)), jnp.bfloat16)
    ws = [jnp.asarray(rng.random((3, 3, c, c)) - 0.5, jnp.bfloat16) * 0.1
          for _ in range(4)]

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def chain_a(ws, x):
        for w in ws:
            x = jax.nn.relu(conv(x, w) + 0.01)
        return x

    def chain_b(ws, x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 128 - c)))
        for w in ws:
            wp = jnp.pad(w, ((0, 0), (0, 0), (0, 128 - c), (0, 128 - c)))
            xp = jax.nn.relu(conv(xp, wp) + 0.01)
        return xp[..., :c]

    def scan_time(fn, carry0, k1=3, k2=19):
        @functools.partial(jax.jit, static_argnames="k")
        def run(c0, k):
            def body(c0, _):
                return fn(c0), None
            c0, _ = jax.lax.scan(body, c0, None, length=k)
            return c0

        times = {}
        for k in (k1, k2):
            out = run(carry0, k)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
            t0 = time.perf_counter()
            out = run(carry0, k)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
            times[k] = time.perf_counter() - t0
        return (times[k2] - times[k1]) / (k2 - k1)

    res = {}
    for name, chain in (("c64", chain_a), ("pad128", chain_b)):
        t_fwd = scan_time(lambda z, ch=chain: ch(ws, z), x)
        g = jax.grad(lambda wlist, z, ch=chain: jnp.sum(ch(wlist, z).astype(jnp.float32) * 1e-6), argnums=0)
        t_bwd = scan_time(
            lambda wlist, ch=chain: jax.tree_util.tree_map(
                lambda a, b: a - 0.0 * b, wlist, g(wlist, x)),
            ws)
        res[f"{name}_fwd_ms"] = round(t_fwd * 1e3, 3)
        res[f"{name}_fwdbwd_ms"] = round(t_bwd * 1e3, 3)
        print(name, res, flush=True)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
