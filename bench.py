#!/usr/bin/env python
"""Benchmark: GuideDepth full train step throughput at NYU 480x640, bf16.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no numbers (BASELINE.md); the recorded baseline
is the reference PyTorch GuideDepth implementation measured on this machine's
CPU (the only hardware it can run on here): 0.174 train img/s (bs=4, fp32)
and 2.41 inference FPS at 480x640 — see BASELINE.md. ``vs_baseline`` is
tpudepth-TPU train img/s divided by that torch-CPU train img/s.
"""

import json
import sys
import time

# Reference torch-CPU GuideDepth training throughput measured on this host
# (2026-08-16, torch 2.13 CPU, bs=4 fp32 Adam+L1): see BASELINE.md.
REFERENCE_TRAIN_IMG_PER_S = 0.174


def main():
    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
    from tpudepth.models import build_model
    from tpudepth.train.trainer import (
        LossRecipe,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w = 480, 640

    mesh = create_mesh()
    model = build_model("GuideDepth", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    image = rng.random((bs, h, w, 3)).astype(np.float32)
    depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)

    from tpudepth.models.registry import init_model
    variables = init_model(model, jax.random.PRNGKey(0), jnp.asarray(image[:1]))
    cfg = TrainConfig(model="GuideDepth")
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated(mesh))
    sharding = batch_sharding(mesh)
    img = jax.device_put(jnp.asarray(image), sharding)
    dep = jax.device_put(jnp.asarray(depth), sharding)

    step = make_train_step(
        model,
        LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0),
        compute_dtype=jnp.bfloat16,
    )

    key = jax.random.PRNGKey(0)
    # warmup / compile
    state, loss = step(state, img, dep, key)
    jax.block_until_ready(loss)

    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        state, loss = step(state, img, dep, key)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n
    img_per_s = bs / dt
    n_chips = len(jax.devices())

    print(
        json.dumps(
            {
                "metric": "guidedepth_train_images_per_sec_per_chip_480x640_bf16",
                "value": round(img_per_s / n_chips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_s / n_chips / REFERENCE_TRAIN_IMG_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
