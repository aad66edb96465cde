#!/usr/bin/env python
"""Host input-pipeline throughput at NYU full resolution (480x640).

Measures what the single host core can feed per second in each loader mode,
against the device consumption rate (PERF.md: 131 img/s/chip train at
480x640). The raw+cache mode is the production default
(``get_training_testing_data``): steady state is a uint8 stack + async
device_put, with /255 and depth scaling fused into the jitted train step
on device.

Usage: python scripts/bench_input.py [n_images] [height] [width]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def epoch_rate(loader, n_img, warm=False):
    it = iter(loader)
    if warm:
        next(it)
        it = iter(loader)
    t0 = time.perf_counter()
    seen = 0
    for b in it:
        seen += b["image"].shape[0]
    dt = time.perf_counter() - t0
    return seen / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 480
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    from tpudepth.data import make_synthetic_zip
    from tpudepth.data.nyu import DataLoader, NYUDepthDataset, load_zip_to_mem

    zp = make_synthetic_zip("/tmp/bench_input.zip", n_train=n, n_test=2,
                            image_hw=(h, w))
    data, train_pairs, _ = load_zip_to_mem(zp)
    bs = 16
    results = {"n": n, "hw": [h, w], "batch": bs}

    # 1. float mode, native C++ decode (round-1 default)
    ds = NYUDepthDataset(data, train_pairs)
    results["float_native_img_s"] = round(
        epoch_rate(DataLoader(ds, bs, shuffle=False), n), 1)

    # 2. raw mode, no cache (native raw decode; half the decode-output traffic)
    ds = NYUDepthDataset(data, train_pairs, raw=True)
    results["raw_native_img_s"] = round(
        epoch_rate(DataLoader(ds, bs, shuffle=False), n), 1)

    # 3. raw + cache: epoch 0 (decode + fill), epoch 1+ (pure uint8 stack)
    ds = NYUDepthDataset(data, train_pairs, raw=True, cache_decoded=True)
    loader = DataLoader(ds, bs, shuffle=False)
    results["raw_cache_fill_img_s"] = round(epoch_rate(loader, n), 1)
    results["raw_cache_hit_img_s"] = round(epoch_rate(loader, n), 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
