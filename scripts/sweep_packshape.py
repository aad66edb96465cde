#!/usr/bin/env python
"""Micro-bench: dense packed-conv shapes for the full-res GUB stage-3 at
480x640 bs16 — which fold's conv does XLA run fastest?

Candidates (all exact foldings of the same logical 3x3 c16 conv at 480x640):
  b4   : [16,120,160,256] x [3,3,256,256]  (16x FLOP inflation)
  r24  : [16,240,160,128] x [3,3,128,128]  ((2,4) fold, 8x)
  r42  : [16,120,320,128] x [3,3,128,128]  ((4,2) fold, 8x)
  b2   : [16,240,320, 64] x [3,3, 64, 64]  (4x; known-slow: relayout copies)

Scan-differential device timing (see bench.py).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpudepth.core.runtime import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def time_case(name, h, w, c, k1=2, k2=12):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((16, h, w, c)), jnp.bfloat16)
    ker = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(x, ker, k):
        def body(carry, _):
            y = conv(carry, ker)
            # keep carry-dependent so the scan can't be hoisted
            return carry + 0.0 * y, jnp.float32(0)
        out, _ = jax.lax.scan(body, x, None, length=k)
        return out

    times = {}
    for k in (k1, k2):
        out = run_k(x, ker, k)
        float(out.reshape(-1)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        out = run_k(x, ker, k)
        float(out.reshape(-1)[0].astype(jnp.float32))
        times[k] = time.perf_counter() - t0
    ms = (times[k2] - times[k1]) / (k2 - k1) * 1e3
    gflop = 2 * 9 * c * c * 16 * h * w / 1e9
    print(f"{name:5s} [{h:4d},{w:4d},{c:4d}]: {ms:7.3f} ms  "
          f"{gflop:6.1f} GFLOP  {gflop / ms:6.1f} TFLOP/s")


def main():
    print(jax.devices())
    if "--stage3" in sys.argv or len(sys.argv) == 1:
        # stage 3: logical 3x3 c16 conv at 480x640
        time_case("b4", 120, 160, 256)
        time_case("r24", 240, 160, 128)
        time_case("r42", 120, 320, 128)
        time_case("b2", 240, 320, 64)
    if "--stage2" in sys.argv:
        # stage 2: logical 3x3 c32 conv at 240x320
        time_case("s2.b2", 120, 160, 128)   # current default
        time_case("s2.r42", 60, 160, 256)   # (4,2) fold
        time_case("s2.r22w", 120, 160, 128, k1=2, k2=22)  # rerun, more steps
    if "--stage1" in sys.argv:
        # stage 1: logical 3x3 c64 conv at 120x160
        time_case("s1.un", 120, 160, 64)    # current default (unpacked)
        time_case("s1.r21", 60, 160, 128)   # (2,1) fold
        time_case("s1.r12", 120, 80, 128)   # (1,2) fold
        time_case("s1.b2", 60, 80, 256)     # (2,2) fold


if __name__ == "__main__":
    main()
