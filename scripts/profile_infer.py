#!/usr/bin/env python
"""Profile an inference forward (bf16 eval path, as infer/engine.py runs it)
and print HLO categories + top ops by self time.

Usage: python scripts/profile_infer.py [model] [batch] [reps]
"""

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

    from tpudepth.models import build_model
    from tpudepth.models.registry import init_model

    name = sys.argv[1] if len(sys.argv) > 1 else "mobilev3_newcrf"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    h, w = 480, 640

    model = build_model(name, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((bs, h, w, 3)).astype(np.float32))
    variables = init_model(model, jax.random.PRNGKey(0), image[:1])

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)

    out = fwd(variables, image)
    print("warm out", float(jnp.mean(out.astype(jnp.float32))), flush=True)

    logdir = "/tmp/tpudepth_profile_infer"
    with jax.profiler.trace(logdir):
        for _ in range(reps):
            out = fwd(variables, image)
        float(jnp.mean(out.astype(jnp.float32)))

    planes = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                              recursive=True), key=os.path.getmtime)
    if not planes:
        print("no xplane captured")
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [planes[-1]], "hlo_stats", params={})
    table = json.loads(data) if isinstance(data, (str, bytes)) else data
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
    print(f"\n== HLO categories ({reps} reps, total {total/1e3:.2f} ms) ==")
    for cat, (t, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {t/1e3:9.2f} ms  {100*t/total:5.1f}%  n={n:4d}  {cat}")
    rows.sort(key=lambda r: -float(r[i_self] or 0))
    print("\n== top 30 ops by self time ==")
    for r in rows[:30]:
        print(f"  {float(r[i_self] or 0)/1e3:8.2f} ms  {str(r[i_cat])[:24]:24s} {str(r[i_name])[:100]}")


if __name__ == "__main__":
    main()
