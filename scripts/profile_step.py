#!/usr/bin/env python
"""Capture a device profile of the GuideDepth train step and print the top
HLO ops by self time (guides PERF.md optimization rounds).

Usage: python scripts/profile_step.py [batch] [steps]
"""

import functools
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
    from tpudepth.models import build_model
    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import (
        LossRecipe, TrainState, make_optimizer, make_train_step,
    )

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    h, w = 480, 640

    mesh = create_mesh()
    model = build_model("GuideDepth", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    image = rng.random((bs, h, w, 3)).astype(np.float32)
    depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)
    variables = init_model(model, jax.random.PRNGKey(0), jnp.asarray(image[:1]))
    cfg = TrainConfig(model="GuideDepth")
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx, apply_fn=model.apply,
    )
    state = jax.device_put(state, replicated(mesh))
    sharding = batch_sharding(mesh)
    img = jax.device_put(jnp.asarray(image), sharding)
    dep = jax.device_put(jnp.asarray(depth), sharding)
    step = make_train_step(
        model, LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0),
        mesh=mesh,
    )

    # warm up / compile outside the trace
    state, loss = step(state, img, dep, jax.random.PRNGKey(0))
    print("warm loss", float(loss), flush=True)

    logdir = "/tmp/tpudepth_profile"
    with jax.profiler.trace(logdir):
        for i in range(1, nsteps + 1):
            state, loss = step(state, img, dep, jax.random.PRNGKey(i))
        float(loss)

    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane captured")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [planes[-1]], "hlo_stats", params={})
    table = json.loads(data) if isinstance(data, (str, bytes)) else data
    # hlo_stats: gviz table json; columns include category, self time (us)
    cols = [c["label"] for c in table["cols"]]
    rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]
    i_cat = cols.index("HLO Category")
    i_self = next(i for i, c in enumerate(cols) if "Total Self Time (us)" in c or c == "Self time (us)")
    i_name = next(i for i, c in enumerate(cols) if "HLO Op Name" in c or "Name" in c)
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r[i_cat], [0.0, 0])
        by_cat[r[i_cat]][0] += float(r[i_self] or 0)
        by_cat[r[i_cat]][1] += 1
    total = sum(v[0] for v in by_cat.values())
    print(f"\n== HLO categories ({nsteps} steps, total {total/1e3:.2f} ms) ==")
    for cat, (t, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  n={n:4d}  {cat}")
    rows.sort(key=lambda r: -float(r[i_self] or 0))
    print("\n== top 25 ops by self time ==")
    for r in rows[:25]:
        print(f"  {float(r[i_self] or 0)/1e3:8.2f} ms  {r[i_cat][:24]:24s} {str(r[i_name])[:90]}")


if __name__ == "__main__":
    main()
