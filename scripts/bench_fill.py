#!/usr/bin/env python
"""Cache-fill (epoch-0) host rates: full-res vs DCT-scaled half-res decode,
plus background-fill overlap (VERDICT r2 item 7 evidence).

The fill epoch is the one-time cost of the decode-once cache
(``NYUDepthDataset(cache_decoded=True)``). Round-3 additions measured here:

1. ``decode_hw``: JPEGs decode directly at 1/2 resolution via libjpeg DCT
   scaling and PNG depth box-averages natively (``data/native/decoder.cpp``),
   so half-res training (the reference's default config,
   ``src/GuideDepth/main.py:72-87``) never decodes full-res pixels.
2. ``background_fill``: a daemon thread fills the cache while the process
   compiles/trains (native decode releases the GIL), so by the time the
   first jit compile (~1-4 min on this tunnel) finishes, the cache is warm.

Usage: python scripts/bench_fill.py [n_images]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fill_rate(ds, n, bs=16):
    from tpudepth.data.nyu import DataLoader

    loader = DataLoader(ds, bs, shuffle=False)
    t0 = time.perf_counter()
    seen = 0
    for b in loader:
        seen += b["image"].shape[0]
    return seen / (time.perf_counter() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    from tpudepth.data import make_synthetic_zip
    from tpudepth.data.nyu import NYUDepthDataset, load_zip_to_mem

    zp = make_synthetic_zip("/tmp/bench_fill.zip", n_train=n, n_test=2,
                            image_hw=(480, 640))
    data, pairs, _ = load_zip_to_mem(zp)
    out = {"n": n}

    ds = NYUDepthDataset(data, pairs, raw=True, cache_decoded=True,
                         cache_dir="", background_fill=False)
    out["fill_full_res_img_s"] = round(fill_rate(ds, n), 1)

    ds = NYUDepthDataset(data, pairs, raw=True, cache_decoded=True,
                         cache_dir="", decode_hw=(240, 320),
                         background_fill=False)
    out["fill_half_res_dct_img_s"] = round(fill_rate(ds, n), 1)
    out["hit_half_res_img_s"] = round(fill_rate(ds, n), 1)

    # Background fill: construct the dataset (thread starts), sleep a
    # compile-sized interval doing nothing, then measure how much of the
    # first epoch is already cached.
    ds = NYUDepthDataset(data, pairs, raw=True, cache_decoded=True,
                         cache_dir="", decode_hw=(240, 320),
                         background_fill=True)
    time.sleep(3.0)
    filled = sum(1 for v in ds._cache if v is not None) if ds._cache else 0
    out["bg_filled_after_3s"] = filled
    out["bg_epoch0_img_s"] = round(fill_rate(ds, n), 1)

    # Cross-run default disk cache (round 4): first dataset instance fills
    # the derived memmap cache; a FRESH instance (a new process's view — the
    # memmaps are re-opened from disk, no state shared) must feed epoch 0 at
    # cache-hit speed even though its RAM cache is cold. This is the
    # warm-compile/cold-data case the RAM cache cannot cover.
    import shutil
    import tempfile

    cache_root = tempfile.mkdtemp(prefix="tpudepth_fillbench_")
    try:
        ds = NYUDepthDataset(data, pairs, raw=True, cache_decoded=True,
                             cache_dir=cache_root, background_fill=False)
        out["disk_fill_full_res_img_s"] = round(fill_rate(ds, n), 1)
        ds2 = NYUDepthDataset(data, pairs, raw=True, cache_decoded=True,
                              cache_dir=cache_root, background_fill=False)
        out["disk_second_process_epoch0_img_s"] = round(fill_rate(ds2, n), 1)
    finally:
        shutil.rmtree(cache_root, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
