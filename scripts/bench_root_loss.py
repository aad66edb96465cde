#!/usr/bin/env python
"""Device cost of the root training recipe's loss (VERDICT r1 item 9).

Root recipe (``src/train.py:94-100``): target = per-batch min-max DepthNorm,
loss = 1.0*SSIM(3x3 avg-pool) + 0.1*L1. Measures, at the root stack's
480x640 bs8 operating point, the marginal device time of (a) the target
transform, (b) the loss forward, (c) loss forward+backward — against the
full SAM train step (~58 ms) to decide whether a fused kernel is warranted.

Scan-differential timing (see bench.py for why naive timing lies here).
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

    from tpudepth.losses import depth_norm_minmax, l1_loss, ssim

    bs, h, w = 8, 480, 640
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.random((bs, h, w, 1)), jnp.float32)
    dep = jnp.asarray(rng.random((bs, h, w, 1)) * 0.9 + 0.05, jnp.float32)

    def scan_time(fn, carry0, k1=3, k2=19):
        @functools.partial(jax.jit, static_argnames="k")
        def run(c, k):
            def body(c, _):
                return fn(c), None

            c, _ = jax.lax.scan(body, c, None, length=k)
            return c

        times = {}
        for k in (k1, k2):
            out = run(carry0, k)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            t0 = time.perf_counter()
            out = run(carry0, k)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            times[k] = time.perf_counter() - t0
        return (times[k2] - times[k1]) / (k2 - k1)

    def root_loss(p, target):
        return 1.0 * ssim(p, target) + 0.1 * l1_loss(p, target)

    # (a) target transform alone
    t_tgt = scan_time(lambda d: depth_norm_minmax(d) + 0 * jnp.mean(d), dep)
    # (b) loss forward (target fixed)
    target = depth_norm_minmax(dep)
    t_fwd = scan_time(lambda p: p + 0 * root_loss(p, target), pred)
    # (c) loss forward + backward
    g = jax.grad(lambda p: root_loss(p, target))
    t_bwd = scan_time(lambda p: p - 0.0 * g(p), pred)

    # (d) fused pallas kernel, fwd and fwd+bwd
    from tpudepth.ops.pallas.fused_root_loss import fused_root_loss

    t_ffwd = scan_time(lambda p: p + 0 * fused_root_loss(p, target, 1.0, 0.1),
                       pred)
    gf = jax.grad(lambda p: fused_root_loss(p, target, 1.0, 0.1))
    t_fbwd = scan_time(lambda p: p - 0.0 * gf(p), pred)

    print(json.dumps({
        "hw": [h, w], "bs": bs,
        "target_ms": round(t_tgt * 1e3, 3),
        "loss_fwd_ms": round(t_fwd * 1e3, 3),
        "loss_fwd_bwd_ms": round(t_bwd * 1e3, 3),
        "fused_fwd_ms": round(t_ffwd * 1e3, 3),
        "fused_fwd_bwd_ms": round(t_fbwd * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
