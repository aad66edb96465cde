#!/usr/bin/env python
"""Parse a jax.profiler xplane.pb directly (the tensorboard-plugin-profile
converter is broken in this image — stale protos and a missing
`xspace_to_tools_data` symbol). Aggregates "XLA Ops" line events by a crude
HLO-category classifier and prints totals + top ops.

Usage: python scripts/xplane.py <logdir-or-xplane.pb> [topn]
"""

import glob
import os
import re
import sys
from collections import defaultdict


def load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if os.path.isdir(path):
        planes = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"),
                                  recursive=True), key=os.path.getmtime)
        if not planes:
            raise SystemExit(f"no xplane.pb under {path}")
        path = planes[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def classify(name):
    n = name.lower()
    if "convolution" in n or n.startswith("conv") or "%conv" in n:
        return "conv"
    if "dot" in n or "einsum" in n:
        return "dot"
    if n.startswith("copy") or ".copy" in n or "transpose" in n and "fusion" not in n:
        return "copy/transpose"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "custom-call" in n or "tpu_custom_call" in n:
        return "custom-call (pallas)"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion"
    return "other"


def aggregate(xs):
    """Return (op_totals_us, total_us) from all 'XLA Ops' lines."""
    ops = defaultdict(float)
    for plane in xs.planes:
        meta = plane.event_metadata
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                if m is None:
                    continue
                ops[m.name] += ev.duration_ps / 1e6  # ps -> us
    return ops


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpudepth_profile"
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    ops = aggregate(load_xspace(path))
    total = sum(ops.values())
    by_cat = defaultdict(lambda: [0.0, 0])
    for name, us in ops.items():
        c = classify(name)
        by_cat[c][0] += us
        by_cat[c][1] += 1
    print(f"== XLA Ops total {total/1e3:.2f} ms ==")
    for cat, (t, n) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"  {t/1e3:9.2f} ms  {100*t/max(total,1e-9):5.1f}%  n={n:4d}  {cat}")
    print(f"\n== top {topn} ops ==")
    for name, us in sorted(ops.items(), key=lambda kv: -kv[1])[:topn]:
        print(f"  {us/1e3:8.2f} ms  {classify(name):20s} {name[:110]}")


if __name__ == "__main__":
    main()
