#!/usr/bin/env python
"""Sweep GuideDepth packing thresholds on the real chip (round 3).

Variants: baseline (full-res block4), + quarter-stage block2
(packed_max_channels=256), + half-stage block4
(packed_block4_max_channels=512), both. Scan-differential train timing at
480x640 bs16 bf16, alhashim recipe (bench.py protocol).
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

    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
    from tpudepth.data.augment import augment_batch
    from tpudepth.models.guidedepth import GuideDepth
    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import LossRecipe, TrainState, make_optimizer

    bs, h, w = 16, 480, 640
    mesh = create_mesh()
    sharding = batch_sharding(mesh)
    rng = np.random.default_rng(0)
    image = rng.random((bs, h, w, 3)).astype(np.float32)
    depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)
    img = jax.device_put(jnp.asarray(image), sharding)
    dep = jax.device_put(jnp.asarray(depth), sharding)
    recipe = LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0)

    variants = {
        "b4full (default)": dict(),
        "+quarter b2": dict(packed_max_channels=256),
        "+half b4": dict(packed_block4_max_channels=512),
        "+both": dict(packed_max_channels=256,
                      packed_block4_max_channels=512),
    }
    for name, kw in variants.items():
        model = GuideDepth(dtype=jnp.bfloat16, **kw)
        variables = init_model(model, jax.random.PRNGKey(0),
                               jnp.asarray(image[:1]))
        tx = make_optimizer(TrainConfig(model="GuideDepth"),
                            steps_per_epoch=100)
        state0 = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]), tx=tx,
            apply_fn=model.apply)
        state0 = jax.device_put(state0, replicated(mesh))

        def one_step(state, key):
            im, de = augment_batch(key, img, dep)
            target = recipe.target(de.astype(jnp.float32))

            def loss_fn(params):
                v = {"params": params, "batch_stats": state.batch_stats}
                pred, mut = model.apply(v, im.astype(jnp.bfloat16),
                                        train=True, mutable=["batch_stats"])
                return (recipe.loss(pred.astype(jnp.float32), target),
                        mut["batch_stats"])

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads=grads,
                                         new_batch_stats=stats), loss

        @functools.partial(jax.jit, static_argnames="k")
        def run_k(state, key, k):
            def body(carry, _):
                st, ky = carry
                ky, sub = jax.random.split(ky)
                st, loss = one_step(st, sub)
                return (st, ky), loss

            (_, _), losses = jax.lax.scan(body, (state, key), None, length=k)
            return losses[-1]

        key = jax.random.PRNGKey(0)
        times = {}
        loss_v = None
        for k in (2, 12):
            loss_v = float(run_k(state0, key, k))
            t0 = time.perf_counter()
            loss_v = float(run_k(state0, key, k))
            times[k] = time.perf_counter() - t0
        step_t = (times[12] - times[2]) / 10
        print(json.dumps({"variant": name,
                          "train_img_per_s": round(bs / step_t, 1),
                          "ms_per_step": round(step_t * 1e3, 2),
                          "finite": bool(np.isfinite(loss_v))}), flush=True)


if __name__ == "__main__":
    main()
