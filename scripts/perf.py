#!/usr/bin/env python
"""Uniform perf harness: train + inference device throughput for any registry
model at any resolution, using the scan-differential protocol (see bench.py
for why naive host timing lies on this environment).

Usage:
  python scripts/perf.py GuideDepth 480 640 16          # train+infer
  python scripts/perf.py sam 480 640 8 --infer-only
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_step_time(run_k, carry0, key, k1=2, k2=10, reps=3):
    """Scan-differential device time with outlier protection: each k is
    timed `reps` times and the MINIMUM is differenced. A single timed fetch
    is vulnerable to one-off tunnel hiccups in T(k1), which INFLATE the
    differential (observed: a 479.8 img/s single-shot reading against a
    404-409 device-true xplane/min-of-3 value — PERF.md round 5)."""
    import jax
    import jax.numpy as jnp

    times = {}
    for k in (k1, k2):
        out = run_k(carry0, key, k)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(leaf.reshape(-1)[0].astype(jnp.float32))  # compile + settle
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run_k(carry0, key, k)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(leaf.reshape(-1)[0].astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[k2] - times[k1]) / (k2 - k1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model")
    p.add_argument("height", type=int)
    p.add_argument("width", type=int)
    p.add_argument("batch", type=int)
    p.add_argument("--infer-only", action="store_true")
    p.add_argument("--train-only", action="store_true")
    p.add_argument("--recipe", default="alhashim", choices=["alhashim", "root"],
                   help="training loss recipe (root = SSIM+0.1*L1 on min-max "
                        "targets, what the root CLI uses for these models)")
    p.add_argument("--packed-blocks", default="",
                   help="per-stage pack-block override for the GuideDepth "
                        "family, e.g. '2x4,4x8,8x8' ('-' entry = auto rule)")
    args = p.parse_args()

    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
    from tpudepth.data.augment import augment_batch
    from tpudepth.models import build_model
    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import LossRecipe, TrainState, make_optimizer

    bs, h, w = args.batch, args.height, args.width
    mesh = create_mesh()
    kwargs = {}
    if args.packed_blocks:
        kwargs["packed_blocks"] = tuple(
            None if s == "-" else tuple(int(v) for v in s.split("x"))
            for s in args.packed_blocks.split(","))
    model = build_model(args.model, dtype=jnp.bfloat16, **kwargs)
    rng = np.random.default_rng(0)
    image = rng.random((bs, h, w, 3)).astype(np.float32)
    depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)
    variables = init_model(model, jax.random.PRNGKey(0), jnp.asarray(image[:1]))
    sharding = batch_sharding(mesh)
    img = jax.device_put(jnp.asarray(image), sharding)
    dep = jax.device_put(jnp.asarray(depth), sharding)
    results = {"model": args.model, "hw": [h, w], "batch": bs,
               "recipe": args.recipe}
    if args.packed_blocks:
        results["packed_blocks"] = args.packed_blocks

    if not args.train_only:
        imgb = img.astype(jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames="k")
        def run_fwd(x, key, k):
            def body(c, _):
                y = model.apply(variables, c, train=False)
                return c + jnp.mean(y).astype(c.dtype) * 0, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c

        t = scan_step_time(run_fwd, imgb, jax.random.PRNGKey(0))
        results["infer_ms_per_batch"] = round(t * 1e3, 2)
        results["infer_img_per_s"] = round(bs / t, 1)

    if not args.infer_only:
        if args.recipe == "root":
            recipe = LossRecipe(kind="root")
        else:
            recipe = LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0)
        cfg = TrainConfig(model=args.model)
        tx = make_optimizer(cfg, steps_per_epoch=100)
        state0 = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]), tx=tx, apply_fn=model.apply,
        )
        state0 = jax.device_put(state0, replicated(mesh))

        def one_step(state, key):
            im, de = augment_batch(key, img, dep)
            target = recipe.target(de.astype(jnp.float32))

            def loss_fn(params):
                from tpudepth.ops.attention import training_mode

                v = {"params": params, "batch_stats": state.batch_stats}
                with training_mode():
                    pred, mut = model.apply(v, im.astype(jnp.bfloat16), train=True,
                                            mutable=["batch_stats"])
                pred = pred.astype(jnp.float32)
                tgt = target
                if pred.shape[1:3] != tgt.shape[1:3]:
                    from tpudepth.ops.image import resize_bilinear

                    tgt = resize_bilinear(tgt, pred.shape[1:3])
                return recipe.loss(pred, tgt), mut["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            return state.apply_gradients(grads=grads, new_batch_stats=stats), loss

        @functools.partial(jax.jit, static_argnames="k")
        def run_train(state, key, k):
            def body(carry, _):
                st, ky = carry
                ky, sub = jax.random.split(ky)
                st, loss = one_step(st, sub)
                return (st, ky), loss

            (state, _), losses = jax.lax.scan(body, (state, key), None, length=k)
            return losses[-1]

        t = scan_step_time(run_train, state0, jax.random.PRNGKey(0))
        results["train_ms_per_step"] = round(t * 1e3, 2)
        results["train_img_per_s"] = round(bs / t, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
