#!/usr/bin/env python
"""Benchmark: GuideDepth full train step throughput at NYU 480x640, bf16.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Timing is a scan differential: the train step runs k1 and k2 times inside a
single jitted ``lax.scan`` program, each followed by one real value fetch;
device time/step = (T(k2) - T(k1)) / (k2 - k1). This removes BOTH the
per-dispatch overhead and the device->host roundtrip — necessary on this
environment because the axon tunnel's ``block_until_ready`` returns before
remote execution finishes, which makes naive loop timing report dispatch
cost only (observed 50x inflation).

The reference repo publishes no numbers (BASELINE.md); the recorded baseline
is the reference PyTorch GuideDepth measured on this machine's CPU (the only
hardware it runs on here): 0.174 train img/s (bs=4, fp32). ``vs_baseline`` =
tpudepth img/s/chip / that number.

That comparator is soft (torch-CPU), so the line also carries
``pct_v5e_roofline``: achieved img/s divided by the HBM-bandwidth-bound
throughput for THIS compiled program on v5e — bytes/step from the compiled
step's ``cost_analysis()`` over the 819 GB/s nominal peak (the program is
bandwidth-bound at ~8% of FLOP peak; PERF.md "roofline accounting"). 1.0
means the hardware bound, not a soft baseline, is what limits the number.
``cost_analysis`` bytes overcount true traffic (fusion operands re-counted
at logical size), which UNDERestimates the bound — so the field can read
slightly above 1.0 and should be read as "at the roofline", not as
headroom. The xplane-measured utilization (PERF.md) is the honest figure;
this field is the automated per-run proxy. The TIME side of the protocol is
device-true: an xplane per-op profile of the NewCRF eval step sums to within
0.7% of the scan-differential measurement (PERF.md round 5) — only the
cost-analysis BYTE denominator is approximate.
"""

import functools
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
    from tpudepth.data.augment import augment_batch
    from tpudepth.models import build_model
    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import LossRecipe, TrainState, make_optimizer

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    h, w = 480, 640

    mesh = create_mesh()
    model = build_model("GuideDepth", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    image = rng.random((bs, h, w, 3)).astype(np.float32)
    depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)

    variables = init_model(model, jax.random.PRNGKey(0), jnp.asarray(image[:1]))
    cfg = TrainConfig(model="GuideDepth")
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
    state0 = jax.device_put(state0, replicated(mesh))
    sharding = batch_sharding(mesh)
    img = jax.device_put(jnp.asarray(image), sharding)
    dep = jax.device_put(jnp.asarray(depth), sharding)
    recipe = LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0)

    def one_step(state, key):
        im, de = augment_batch(key, img, dep)
        target = recipe.target(de.astype(jnp.float32))

        def loss_fn(params):
            v = {"params": params, "batch_stats": state.batch_stats}
            pred, mut = model.apply(
                v, im.astype(jnp.bfloat16), train=True, mutable=["batch_stats"]
            )
            return recipe.loss(pred.astype(jnp.float32), target), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads, new_batch_stats=stats), loss

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(state, key, k):
        def body(carry, _):
            st, ky = carry
            ky, sub = jax.random.split(ky)
            st, loss = one_step(st, sub)
            return (st, ky), loss

        (state, _), losses = jax.lax.scan(body, (state, key), None, length=k)
        return state, losses[-1]

    key = jax.random.PRNGKey(0)
    k1, k2 = 2, 12
    times = {}
    for k in (k1, k2):
        _, loss = run_k(state0, key, k)
        float(loss)  # compile + settle
        # min-of-3: a single timed fetch is vulnerable to one-off tunnel
        # hiccups in T(k1), which INFLATE the differential (PERF.md round 5
        # measurement-protocol hardening; a hiccup produced one 479.8 img/s
        # reading against a 404-409 device-true xplane value for NewCRF).
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _, loss = run_k(state0, key, k)
            assert np.isfinite(float(loss))  # one real roundtrip
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    step_time = (times[k2] - times[k1]) / (k2 - k1)

    # bytes/step for the roofline bound: scan-differential of cost_analysis
    # over the SAME two programs the timing used (compiling a separate
    # single-step program for this costs a 10+ min remote grad compile)
    step_bytes = 0.0
    try:
        byts = {}
        for k in (k1, k2):
            ca = run_k.lower(state0, key, k).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            byts[k] = float(ca.get("bytes accessed", 0.0))
        # XLA cost_analysis counts a while/scan BODY once (no trip-count
        # multiply — measured: k=2 and k=12 report identical bytes), so the
        # k-differential degenerates to 0 and the body cost IS the per-step
        # cost; keep the differential as a guard against a future semantics
        # change.
        diff = (byts[k2] - byts[k1]) / (k2 - k1)
        step_bytes = diff if diff > 1e9 else byts[k2]
    except Exception as e:  # backend without cost_analysis: field reads 0
        print(f"cost_analysis unavailable: {e!r}", file=sys.stderr)
    img_per_s = bs / step_time
    n_chips = len(jax.devices())

    # v5e nominal HBM peak 819 GB/s: the bandwidth-bound step time for this
    # program's byte traffic, and achieved/bound (>=1.0 == at the roofline).
    pct_roofline = 0.0
    if step_bytes:
        bound_img_per_s = bs / (step_bytes / 819e9)
        pct_roofline = img_per_s / bound_img_per_s

    print(
        json.dumps(
            {
                "metric": "guidedepth_train_images_per_sec_per_chip_480x640_bf16",
                "value": round(img_per_s / n_chips, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_s / n_chips / REFERENCE_TRAIN_IMG_PER_S, 1),
                "pct_v5e_roofline": round(pct_roofline, 3),
                "gbytes_per_step": round(step_bytes / 1e9, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
