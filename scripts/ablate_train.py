#!/usr/bin/env python
"""Train-step cost attribution for GuideDepth @480x640 bs16 bf16 (v5e).

Scan-differential times for: fwd / fwd+loss / fwd+loss+grad / full step,
across model variants (packed stages rule). Guides the next PERF.md item.
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
    import optax

    from tpudepth.core.config import TrainConfig
    from tpudepth.data.augment import augment_batch
    from tpudepth.models.guidedepth import GuideDepth
    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import LossRecipe, TrainState, make_optimizer

    bs, h, w = 16, 480, 640
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((bs, h, w, 3)), jnp.float32)
    dep = jnp.asarray(rng.random((bs, h, w, 1)) * 0.9 + 0.05, jnp.float32)
    recipe = LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0)

    def scan_time(fn, carry0, k1=3, k2=11):
        @functools.partial(jax.jit, static_argnames="k")
        def run(c, k):
            def body(c, _):
                return fn(c), None

            c, _ = jax.lax.scan(body, c, None, length=k)
            return c

        times = {}
        for k in (k1, k2):
            out = run(carry0, k)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
            t0 = time.perf_counter()
            out = run(carry0, k)
            float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype(jnp.float32))
            times[k] = time.perf_counter() - t0
        return (times[k2] - times[k1]) / (k2 - k1)

    results = {}
    for variant, kwargs in (
        ("packed128", dict(packed=True, packed_max_channels=128)),
        ("packed256", dict(packed=True, packed_max_channels=256)),
        ("unpacked", dict(packed=False)),
    ):
        model = GuideDepth(dtype=jnp.bfloat16, **kwargs)
        variables = init_model(model, jax.random.PRNGKey(0), img[:1])
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        imgb = img.astype(jnp.bfloat16)

        # fwd only
        def fwd(c):
            y = model.apply({"params": params, "batch_stats": stats}, c, train=False)
            return c + jnp.mean(y).astype(c.dtype) * 0

        t_fwd = scan_time(fwd, imgb)

        # fwd + loss
        target = recipe.target(dep)

        def fwdloss(c):
            y = model.apply({"params": params, "batch_stats": stats}, c, train=False)
            l = recipe.loss(y.astype(jnp.float32), target)
            return c + l.astype(c.dtype) * 0

        t_fl = scan_time(fwdloss, imgb)

        # fwd + loss + grad (no optimizer, no aug)
        def lossfn(pp, c):
            y, mut = model.apply({"params": pp, "batch_stats": stats}, c,
                                 train=True, mutable=["batch_stats"])
            return recipe.loss(y.astype(jnp.float32), target)

        def fwdgrad(carry):
            pp, c = carry
            g = jax.grad(lossfn)(pp, c)
            pp = jax.tree_util.tree_map(lambda a, b: a - 0.0 * b.astype(a.dtype), pp, g)
            return (pp, c)

        t_grad = scan_time(fwdgrad, (params, imgb))

        # full step (aug + grad + adam + BN update)
        cfg = TrainConfig(model="GuideDepth")
        tx = make_optimizer(cfg, steps_per_epoch=100)
        state0 = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                            batch_stats=stats, opt_state=tx.init(params), tx=tx,
                            apply_fn=model.apply)

        def full(carry):
            st, key = carry
            key, sub = jax.random.split(key)
            im, de = augment_batch(sub, img, dep)
            tgt = recipe.target(de.astype(jnp.float32))

            def lf(pp):
                y, mut = model.apply({"params": pp, "batch_stats": st.batch_stats},
                                     im.astype(jnp.bfloat16), train=True,
                                     mutable=["batch_stats"])
                return recipe.loss(y.astype(jnp.float32), tgt), mut["batch_stats"]

            (l, bs_new), g = jax.value_and_grad(lf, has_aux=True)(st.params)
            return (st.apply_gradients(grads=g, new_batch_stats=bs_new), key)

        t_full = scan_time(full, (state0, jax.random.PRNGKey(0)))

        results[variant] = {
            "fwd_ms": round(t_fwd * 1e3, 2),
            "fwd_loss_ms": round(t_fl * 1e3, 2),
            "fwd_grad_ms": round(t_grad * 1e3, 2),
            "full_ms": round(t_full * 1e3, 2),
            "train_img_s": round(bs / t_full, 1),
        }
        print(variant, json.dumps(results[variant]), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
