#!/usr/bin/env python
"""Same-process A/B: polynomial erf vs the A&S rational erf on the default
eval paths (kernel pair for SAM, window-row for NewCRF) — clean attribution
of the transcendental cut (PERF.md round 5)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudepth.core.runtime import apply_platform_override

apply_platform_override()

import time

import jax.numpy as jnp
import numpy as np
import jax

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
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((bs, 480, 640, 3)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    for name in ("newcrf", "sam"):
        model = build_model(name, dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.PRNGKey(0), x[:1])
        for rep in range(2):
            for erf in ("poly", "as"):
                if erf == "as":
                    os.environ["TPUDEPTH_ERF"] = "as"
                else:
                    os.environ.pop("TPUDEPTH_ERF", None)
                t = scan_time(
                    lambda c: model.apply(variables, c, train=False), x)
                print(f"{name} rep{rep} erf={erf}: {t*1e3:.2f} ms/batch "
                      f"{bs/t:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
