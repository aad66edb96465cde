#!/usr/bin/env python
"""On-chip exactness: rowblock path vs the default kernel-pair eval path.

Traces the full SAM / NewCRF forward twice on the real TPU — once with
TPUDEPTH_BLOCK=row, once with the default attn+epilogue pair — on the same
weights/batch, and prints the bf16 relative max error (expected: low-1e-2
reassociation noise, matching the round-4/5 on-chip comparisons).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudepth.core.runtime import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from tpudepth.models import build_model
from tpudepth.models.registry import init_model


def main():
    rng = np.random.default_rng(0)
    for name in ("newcrf", "sam"):
        model = build_model(name, dtype=jnp.bfloat16)
        image = jnp.asarray(rng.random((2, 480, 640, 3)).astype(np.float32))
        variables = init_model(model, jax.random.PRNGKey(0), image[:1])

        outs = {}
        for mode in ("pair", "row"):
            os.environ["TPUDEPTH_BLOCK"] = mode  # 'pair' | 'row'

            @jax.jit
            def fwd(v, x):
                return model.apply(v, x, train=False)

            outs[mode] = np.asarray(fwd(variables, image).astype(jnp.float32))
            print(name, mode, "mean", float(outs[mode].mean()), flush=True)
        ref = outs["pair"]
        err = np.max(np.abs(outs["row"] - ref)) / np.max(np.abs(ref))
        print(f"{name}: rel-max-err row vs pair = {err:.2e}", flush=True)
        assert np.isfinite(outs["row"]).all()


if __name__ == "__main__":
    main()
