#!/usr/bin/env python
"""Roofline accounting for the headline configs (VERDICT r2 item 3).

For each (model, resolution, batch, recipe) config this builds the SAME
train / inference steps as scripts/perf.py, asks XLA for the compiled
program's FLOP count and HBM bytes accessed
(``jit(...).lower().compile().cost_analysis()``), measures device step time
with the scan-differential protocol, and reports achieved TFLOP/s, GB/s and
the fraction of v5e peak (197 TFLOP/s bf16, 819 GB/s HBM) — i.e. whether a
config is compute- or bandwidth-bound and how far from the roofline it sits.

Usage: python scripts/roofline.py [config ...] where config is
model:HxW:bs[:recipe[:remat]] (default: the PERF.md headline set).
``remat`` = 'stages' (per-GUB jax.checkpoint, GuideDepth family) or 'full'
(checkpoint the whole forward). TPUDEPTH_ROOFLINE_TRAIN_ONLY=1 skips the
inference rows (remat only changes the backward).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peaks: 197 TFLOP/s bf16, 819 GB/s HBM (public TPU v5e specs).
PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0

DEFAULT_CONFIGS = [
    "GuideDepth:480x640:16:alhashim",
    "GuideDepth:240x320:32:alhashim",
    "sam:480x640:8:root",
    "newcrf:480x640:8:root",
]


def cost_of(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"  cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0, 0.0


def main():
    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from scripts.perf import scan_step_time
    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
    from tpudepth.data.augment import augment_batch
    from tpudepth.models import build_model
    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import LossRecipe, TrainState, make_optimizer

    configs = sys.argv[1:] or DEFAULT_CONFIGS
    mesh = create_mesh()
    sharding = batch_sharding(mesh)

    for spec in configs:
        parts = spec.split(":")
        name, hw, bs = parts[0], parts[1], int(parts[2])
        recipe_kind = parts[3] if len(parts) > 3 else "alhashim"
        remat_mode = parts[4] if len(parts) > 4 else ""
        h, w = (int(v) for v in hw.split("x"))
        kwargs = {"remat_stages": True} if remat_mode == "stages" else {}
        model = build_model(name, dtype=jnp.bfloat16, **kwargs)
        apply_fn = model.apply
        if remat_mode == "full":
            _ckpt = jax.checkpoint(
                lambda v, im, m=model: m.apply(v, im, train=True,
                                               mutable=["batch_stats"]))

            def apply_fn(v, im, train, mutable, _c=_ckpt):
                return _c(v, im)
        rng = np.random.default_rng(0)
        image = rng.random((bs, h, w, 3)).astype(np.float32)
        depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)
        variables = init_model(model, jax.random.PRNGKey(0),
                               jnp.asarray(image[:1]))
        img = jax.device_put(jnp.asarray(image), sharding)
        dep = jax.device_put(jnp.asarray(depth), sharding)

        if recipe_kind == "root":
            recipe = LossRecipe(kind="root")
        else:
            recipe = LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0)
        tx = make_optimizer(TrainConfig(model=name), steps_per_epoch=100)
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
                    pred, mut = apply_fn(v, im.astype(jnp.bfloat16),
                                         train=True,
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

        # single-step program for cost_analysis (the scan program would
        # report k-fold costs)
        train_step = jax.jit(one_step).lower(state0, jax.random.PRNGKey(1)).compile()
        flops, byts = cost_of(train_step)

        @functools.partial(jax.jit, static_argnames="k")
        def run_train(state, key, k):
            def body(carry, _):
                st, ky = carry
                ky, sub = jax.random.split(ky)
                st, loss = one_step(st, sub)
                return (st, ky), loss

            (_, _), losses = jax.lax.scan(body, (state, key), None, length=k)
            return losses[-1]

        t = scan_step_time(run_train, state0, jax.random.PRNGKey(0))
        tflops = flops / t / 1e12
        gbs = byts / t / 1e9
        out = {
            "config": spec,
            "train_ms_per_step": round(t * 1e3, 2),
            "train_img_per_s": round(bs / t, 1),
            "gflops_per_step": round(flops / 1e9, 1),
            "gbytes_per_step": round(byts / 1e9, 3),
            "achieved_tflops": round(tflops, 2),
            "achieved_gbs": round(gbs, 1),
            "pct_peak_flops": round(100 * tflops / PEAK_TFLOPS, 1),
            "pct_peak_bw": round(100 * gbs / PEAK_GBS, 1),
            "arithmetic_intensity": round(flops / max(byts, 1.0), 1),
            # bound = which peak the program is closer to saturating
            "bound": "bandwidth" if gbs / PEAK_GBS > tflops / PEAK_TFLOPS
            else "compute",
        }

        if os.environ.get("TPUDEPTH_ROOFLINE_TRAIN_ONLY"):
            print(json.dumps(out), flush=True)
            continue

        # inference forward
        imgb = img.astype(jnp.bfloat16)

        def fwd(x):
            return model.apply(variables, x, train=False)

        fwd_c = jax.jit(fwd).lower(imgb).compile()
        fflops, fbytes = cost_of(fwd_c)

        @functools.partial(jax.jit, static_argnames="k")
        def run_fwd(x, key, k):
            def body(c, _):
                y = model.apply(variables, c, train=False)
                return c + jnp.mean(y).astype(c.dtype) * 0, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            return c

        tf_ = scan_step_time(run_fwd, imgb, jax.random.PRNGKey(0))
        out.update({
            "infer_ms_per_batch": round(tf_ * 1e3, 2),
            "infer_img_per_s": round(bs / tf_, 1),
            "infer_gflops": round(fflops / 1e9, 1),
            "infer_gbytes": round(fbytes / 1e9, 3),
            "infer_pct_peak_flops": round(100 * fflops / tf_ / 1e12 / PEAK_TFLOPS, 1),
            "infer_pct_peak_bw": round(100 * fbytes / tf_ / 1e9 / PEAK_GBS, 1),
        })
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
