#!/usr/bin/env python
"""Quick CPU (interpret-mode) exactness check: fused Pallas GUB stage vs the
plain jnp packed path — forward (train/eval), batch stats, and gradients."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["TPUDEPTH_PLATFORM"] = "cpu"
from tpudepth.core.runtime import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from tpudepth.models.guidedepth import GuidedUpsamplingBlock
from tpudepth.ops.packed import space_to_depth

rng = np.random.default_rng(0)


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = np.max(np.abs(a - b))
    return d / max(np.max(np.abs(a)), 1e-12)


for blk in (2, (4, 4)):
    guide = jnp.asarray(rng.random((2, 16, 24, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((2, 16, 24, 16)), jnp.float32)
    gp, dp = space_to_depth(guide, blk), space_to_depth(depth, blk)
    ref_m = GuidedUpsamplingBlock(16, 16, 8, fused=False)
    fus_m = GuidedUpsamplingBlock(16, 16, 8, fused=True)
    variables = ref_m.init(jax.random.PRNGKey(0), gp, dp, train=False,
                           packed=blk)

    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        ref = ref_m.apply(variables, gp, dp, train=train, packed=blk, **kw)
        got = fus_m.apply(variables, gp, dp, train=train, packed=blk, **kw)
        if train:
            ref, ref_st = ref
            got, got_st = got
            key = lambda kv: jax.tree_util.keystr(kv[0])
            for (ka, a), (kb, b) in zip(
                    sorted(jax.tree_util.tree_leaves_with_path(ref_st), key=key),
                    sorted(jax.tree_util.tree_leaves_with_path(got_st), key=key)):
                r = rel(a, b)
                assert r < 1e-5, (ka, r)
        r = rel(ref, got)
        print(f"blk={blk} train={train}: out rel {r:.2e}")
        assert r < 1e-5, r

    # gradients (train mode, loss = mean(out^2) + mean-depth-ish mix)
    def loss_fn(m):
        def f(params, g, d):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                g, d, train=True, packed=blk, mutable=["batch_stats"])
            return jnp.mean(out * out) + 0.1 * jnp.mean(jnp.abs(out))
        return f

    gr = jax.grad(loss_fn(ref_m), argnums=(0, 1, 2))(
        variables["params"], gp, dp)
    gf = jax.grad(loss_fn(fus_m), argnums=(0, 1, 2))(
        variables["params"], gp, dp)
    # conv-bias grads under train-mode BN are analytically ZERO (the mean
    # subtraction cancels them) so both paths give roundoff there — compare
    # every leaf against the GLOBAL gradient scale, not per-leaf maxima.
    leaves_r = jax.tree_util.tree_leaves(gr)
    gscale = max(float(jnp.max(jnp.abs(a))) for a in leaves_r)
    worst = 0.0
    worst_k = None
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gr), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(gf), key=key)):
        r = float(jnp.max(jnp.abs(a - b))) / gscale
        if r > worst:
            worst, worst_k = r, jax.tree_util.keystr(ka)
    print(f"blk={blk} grads: worst global-rel {worst:.2e} at {worst_k}")
    assert worst < 1e-5, (worst_k, worst)

print("OK")
