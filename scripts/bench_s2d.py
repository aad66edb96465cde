#!/usr/bin/env python
"""Microbench: thin-channel conv vs space-to-depth-packed equivalent.

Hypothesis (PERF.md roadmap #1/#3): a 3x3 conv at C in {16,32} channels and
full/half NYU resolution wastes MXU lanes; repacking 2x2 spatial blocks into
channels (4x channels, 1/4 spatial, 4x FLOPs in the dense packed kernel)
nets ~4x because lane utilization rises ~16x.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_time(fn, x, k1=3, k2=13):
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames="k")
    def run(x, k):
        def body(c, _):
            y = fn(c)
            # fold output back into the carry so the scan can't be collapsed
            return c + y.reshape(-1)[0].astype(c.dtype) * 0, None

        c, _ = jax.lax.scan(body, x, None, length=k)
        return c

    times = {}
    for k in (k1, k2):
        float(run(x, k).reshape(-1)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        float(run(x, k).reshape(-1)[0].astype(jnp.float32))
        times[k] = time.perf_counter() - t0
    return (times[k2] - times[k1]) / (k2 - k1)


def main():
    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    results = {}

    def conv(cin, cout, k=3):
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.bfloat16)

        def f(x):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return f

    cases = {
        # full-res stage-3 GUB conv, unpacked vs 2x2-packed
        "c16_480x640": ((16, 480, 640, 16), conv(16, 16)),
        "c64_240x320": ((16, 240, 320, 64), conv(64, 64)),
        # half-res stage-2
        "c32_240x320": ((16, 240, 320, 32), conv(32, 32)),
        "c128_120x160": ((16, 120, 160, 128), conv(128, 128)),
        # 1x1 convs (expand//2 bottlenecks)
        "c16to8_1x1_480x640": ((16, 480, 640, 16), conv(16, 8, 1)),
        "c64to32_1x1_240x320": ((16, 240, 320, 64), conv(64, 32, 1)),
        # guide conv 3->16 full res vs packed 12->64
        "c3to16_480x640": ((16, 480, 640, 3), conv(3, 16)),
        "c12to64_240x320": ((16, 240, 320, 12), conv(12, 64)),
    }
    for name, (shape, f) in cases.items():
        x = jnp.asarray(rng.random(shape), jnp.bfloat16)
        t = scan_time(f, x)
        results[name] = round(t * 1e3, 3)
        print(name, results[name], "ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
