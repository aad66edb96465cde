"""``datasets.get_dataloader`` facade.

The reference's GuideDepth stack imports ``data.datasets.get_dataloader``
(``src/GuideDepth/training.py:42-55``, ``evaluate.py:60-66``,
``inference.py:111-123``) from a package that was never vendored into the
snapshot. This module re-derives that API from its call sites: split-aware
loaders over the zip datasets with the resolution applied, returning
{'image','depth'} batches.
"""

from __future__ import annotations

from typing import Optional

from tpudepth.core.config import RESOLUTIONS
from tpudepth.data.nyu import (
    DATASET_LAYOUTS,
    DataLoader,
    NYUDepthDataset,
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
) -> DataLoader:
    """Call-site-compatible with the reference's missing
    ``datasets.get_dataloader`` (``src/GuideDepth/training.py:42-48``).

    ``split``: 'train' shuffles per epoch; 'val'/'test' keep csv order.
    Host-side augmentation is intentionally absent — flip/channel-swap run on
    device inside the train step (:mod:`tpudepth.data.augment`).
    """
    train_csv, test_csv, depth_scale = DATASET_LAYOUTS[dataset]
    if path not in _CACHE:
        _CACHE[path] = load_zip_to_mem(path, train_csv, test_csv)
    data, train_pairs, test_pairs = _CACHE[path]
    pairs = train_pairs if split == "train" else test_pairs
    ds = NYUDepthDataset(data, pairs, shard=shard, num_shards=num_shards,
                         decode_workers=max(workers, 2),
                         depth_post_scale=depth_scale)
    return DataLoader(
        ds,
        batch_size,
        shuffle=(split == "train"),
        drop_last=(split == "train"),
        sharding=sharding,
    )
