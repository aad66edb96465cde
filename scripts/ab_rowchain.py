#!/usr/bin/env python
"""Same-process A/B: NewCRF eval with stage-level padded chain vs per-block
row kernels vs the kernel pair — eliminates the run-to-run device drift seen
across separate perf.py invocations (PERF.md round 5)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudepth.core.runtime import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from tpudepth.models import build_model
from tpudepth.models.registry import init_model


def scan_time(fwd_builder, x, k1=2, k2=10):
    def run(xx, k):
        def body(c, _):
            y = fwd_builder(c)
            return c + jnp.mean(y).astype(c.dtype) * 0, None
        c, _ = jax.lax.scan(body, xx, None, length=k)
        return c
    f1 = jax.jit(lambda xx: run(xx, k1))
    f2 = jax.jit(lambda xx: run(xx, k2))
    float(jnp.sum(f1(x)))
    float(jnp.sum(f2(x)))
    ts = []
    for f in (f1, f2):
        t0 = time.perf_counter()
        for _ in range(4):
            float(jnp.sum(f(x)))
        ts.append((time.perf_counter() - t0) / 4)
    return (ts[1] - ts[0]) / (k2 - k1)


def main():
    bs = 8
    name = sys.argv[1] if len(sys.argv) > 1 else "newcrf"
    model = build_model(name, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((bs, 480, 640, 3)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    variables = init_model(model, jax.random.PRNGKey(0), x[:1])

    modes = [("row_rauto", {"TPUDEPTH_BLOCK": "row"}),
             ("row_r1", {"TPUDEPTH_BLOCK": "row",
                         "TPUDEPTH_ROWBLOCK_R": "1"}),
             ("pair", {"TPUDEPTH_BLOCK": "pair"}),
             ("chain", {"TPUDEPTH_BLOCK": "row",
                        "TPUDEPTH_STAGE_CHAIN": "on"})]
    if name == "sam":  # SAM has no shifted blocks / stage chain / r
        modes = [m for m in modes if m[0] in ("row_r1", "pair")]
    for rep in range(2):
        for mode_name, env in modes:
            os.environ.pop("TPUDEPTH_STAGE_CHAIN", None)
            os.environ.pop("TPUDEPTH_ROWBLOCK_R", None)
            os.environ.update(env)
            t = scan_time(lambda c: model.apply(variables, c, train=False), x)
            print(f"rep{rep} {mode_name}: {t*1e3:.2f} ms/batch "
                  f"{bs/t:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
