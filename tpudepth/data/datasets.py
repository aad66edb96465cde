"""``datasets.get_dataloader`` facade.

The reference's GuideDepth stack imports ``data.datasets.get_dataloader``
(``src/GuideDepth/training.py:42-55``, ``evaluate.py:60-66``,
``inference.py:111-123``) from a package that was never vendored into the
snapshot. This module re-derives that API from its call sites: split-aware
loaders over the zip datasets with the resolution applied, returning
{'image','depth'} batches.

TPU-first: the train split gets the SAME fast pipeline as
``get_training_testing_data`` — raw integer batches (device-side /255) with
a decode-once RAM cache, upgraded to a cross-run memmap cache by DEFAULT
(derived ``~/.cache/tpudepth_data`` path, budget-capped; override with
``cache_dir``/``TPUDEPTH_CACHE_DIR``, disable with ``TPUDEPTH_CACHE_DIR=""``)
keyed by zip identity (size+mtime) + shard slice so a regenerated zip never
serves stale pixels. The disk default closes the warm-compile/cold-data
case: a SECOND process skips the decode epoch entirely (PERF.md round 4).
Val/test splits stay in float mode (metrics consume host floats).
"""

from __future__ import annotations

from typing import Optional

from tpudepth.core.config import RESOLUTIONS
from tpudepth.data.nyu import (
    DATASET_LAYOUTS,
    DataLoader,
    NYUDepthDataset,
    _available_ram_gb,
    load_zip_to_mem,
)

_CACHE = {}


def get_dataloader(
    dataset: str,
    path: str,
    split: str = "train",
    augmentation: str = "alhashim",
    batch_size: int = 8,
    resolution: str = "half",
    workers: int = 2,
    sharding=None,
    shard: int = 0,
    num_shards: int = 1,
    raw: Optional[bool] = None,
    cache: Optional[bool] = None,
    cache_dir: Optional[str] = None,
    decode_hw: Optional[tuple] = None,
) -> DataLoader:
    """Call-site-compatible with the reference's missing
    ``datasets.get_dataloader`` (``src/GuideDepth/training.py:42-48``).

    ``split``: 'train' shuffles per epoch; 'val'/'test' keep csv order.
    Host-side augmentation is intentionally absent — flip/channel-swap run on
    device inside the train step (:mod:`tpudepth.data.augment`).
    """
    from tpudepth.data.diskcache import dataset_cache_key

    train_csv, test_csv, depth_scale = DATASET_LAYOUTS[dataset]
    if path not in _CACHE:
        _CACHE[path] = load_zip_to_mem(path, train_csv, test_csv)
    data, train_pairs, test_pairs = _CACHE[path]
    pairs = train_pairs if split == "train" else test_pairs
    is_train = split == "train"
    if raw is None:
        raw = is_train
    if cache is None:
        cache = is_train
    shard_pairs = list(pairs)[shard::num_shards] if num_shards > 1 else pairs
    if decode_hw is None and raw and is_train:
        # decode directly at the configured training resolution when it
        # exactly divides the file dims (DCT-scaled JPEG / box-avg PNG)
        decode_hw = RESOLUTIONS.get(dataset, {}).get(resolution)
    ds = NYUDepthDataset(data, pairs, shard=shard, num_shards=num_shards,
                         decode_workers=max(workers, 2),
                         depth_post_scale=depth_scale,
                         raw=raw, cache_decoded=cache,
                         max_cache_gb=_available_ram_gb() * 0.5,
                         cache_dir=cache_dir,
                         cache_key=dataset_cache_key(path, shard_pairs),
                         decode_hw=decode_hw if raw else None)
    return DataLoader(
        ds,
        batch_size,
        shuffle=is_train,
        drop_last=is_train,
        sharding=sharding,
    )
