"""NYU-Depth-V2 (Alhashim 50K layout) zip-in-memory data pipeline.

Capability parity with ``src/data.py``, rebuilt for TPU feeding:

- The whole zip is read into a ``{name: bytes}`` dict up front
  (``src/data.py:48-53``) — the 4.1 GB NYU zip fits host RAM and removes all
  disk I/O from the steady state.
- Pair lists come from ``data/nyu2_train.csv`` / ``data/nyu2_test.csv``
  (``src/data.py:54-55``) and are shuffled deterministically with the exact
  ``sklearn.utils.shuffle(random_state=0)`` permutation (``src/data.py:69-71``)
  — replicated via ``np.random.RandomState(0).permutation`` (verified
  identical in tests).
- Decode semantics of ``ToTensor.to_tensor`` (``src/data.py:124-155``):
  8-bit images -> float/255; mode 'I' (int32) and 'I;16' (uint16) depth maps
  keep raw values (no /255).
- Unlike the reference's per-sample, 0-worker DataLoader (``src/data.py:179``),
  batches are decoded by a thread pool and transferred to device
  asynchronously with double-buffering; flip/channel-swap augmentation is
  applied *on device* inside the jitted train step
  (:mod:`tpudepth.data.augment`) so the host only ever decodes.
- ``shard`` / ``num_shards`` slice the pair list per host for multi-host DP
  (new capability; the reference is single-process).
"""

from __future__ import annotations

import io
import os
import threading
import zipfile
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def reference_shuffle(items: List, seed: int = 0) -> List:
    """The ``sklearn.utils.shuffle(x, random_state=seed)`` permutation without
    the sklearn dependency (parity asserted in tests)."""
    perm = np.random.RandomState(seed).permutation(len(items))
    return [items[i] for i in perm]


def load_zip_to_mem(
    zip_path: str, csv_name: str = "data/nyu2_train.csv", test_csv: str = "data/nyu2_test.csv"
) -> Tuple[Dict[str, bytes], List[List[str]], List[List[str]]]:
    """Read the whole zip into memory and parse the train/test pair CSVs."""
    with zipfile.ZipFile(zip_path) as zf:
        data = {name: zf.read(name) for name in zf.namelist()}
    train = [
        row.split(",")
        for row in data[csv_name].decode("utf-8").split("\n")
        if len(row) > 0
    ]
    test = [
        row.split(",")
        for row in data[test_csv].decode("utf-8").split("\n")
        if len(row) > 0
    ]
    train = reference_shuffle(train, 0)
    test = reference_shuffle(test, 0)
    return data, train, test


def _decode(buf: bytes) -> np.ndarray:
    """PIL decode with reference ToTensor dtype semantics
    (``src/data.py:124-155``)."""
    img = Image.open(io.BytesIO(buf))
    mode = img.mode
    arr = np.asarray(img)
    if mode in ("I", "I;16"):
        out = arr.astype(np.float32)
    else:
        out = arr.astype(np.float32) / 255.0
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def _decode_raw(buf: bytes) -> np.ndarray:
    """PIL decode keeping native integer pixels: uint8 for 8-bit sources,
    uint16 for 16-bit/'I' depth maps. The float conversion (/255 for 8-bit,
    raw values for 16-bit — the ToTensor semantics above) happens on device
    inside the jitted train step, which on this single-core host is the
    difference between a host-bound and a device-bound input pipeline."""
    img = Image.open(io.BytesIO(buf))
    mode = img.mode
    arr = np.asarray(img)
    if mode in ("I", "I;16"):
        out = arr.astype(np.uint16)
    else:
        out = arr.astype(np.uint8)
    if out.ndim == 2:
        out = out[:, :, None]
    return out


def _box_down(arr: np.ndarray, s: int) -> np.ndarray:
    """Exact s x s box average (integer, round-to-nearest) — the PIL-fallback
    equivalent of the native decoder's scaled path."""
    h, w, c = arr.shape
    a = arr.reshape(h // s, s, w // s, s, c).astype(np.uint32)
    a = a.sum(axis=(1, 3))
    return ((a + s * s // 2) // (s * s)).astype(arr.dtype)


class NYUDepthDataset:
    """In-memory (rgb, depth) pair dataset (``depthDatasetMemory``,
    ``src/data.py:77-98``) with threaded batch decode."""

    def __init__(
        self,
        data: Dict[str, bytes],
        pairs: Sequence[Sequence[str]],
        shard: int = 0,
        num_shards: int = 1,
        decode_workers: int = 8,
        use_native: bool = True,
        cache_decoded: bool = False,
        max_cache_gb: float = 48.0,
        depth_post_scale: float = 1.0,
        raw: bool = False,
        cache_dir: Optional[str] = None,
        cache_key: Optional[str] = None,
        decode_hw: Optional[Tuple[int, int]] = None,
        background_fill: bool = True,
    ):
        if num_shards > 1:
            pairs = list(pairs)[shard::num_shards]
        self.data = data
        self.pairs = list(pairs)
        # KITTI stores depth as 16-bit png with meters = value/256
        # (standard KITTI depth-completion convention; the reference's kitti
        # branch relies on its missing upstream data package for this).
        self.depth_post_scale = depth_post_scale
        # raw mode: batches keep native integer pixels (uint8/uint16) and the
        # /255 + depth scaling moves into the jitted train step on device.
        self.raw = raw
        self._pool = ThreadPoolExecutor(max_workers=decode_workers)
        self._native_shapes = None  # ((h,w,c), (h,w,c)) for (rgb, depth)
        self._native_bits = None  # (rgb_bit_depth, depth_bit_depth)
        # Reduced-resolution decode (raw mode only): when the requested
        # (h, w) divides the file dims by 2/4/8, JPEGs decode directly at
        # 1/s via libjpeg DCT scaling (~s^2 cheaper on this single-core
        # host) and PNG depth box-averages s x s — the decoded-once cache
        # then stores 1/s^2 the bytes. Note the two downscales are not
        # bit-identical to a bilinear resize of the full decode (DCT-domain
        # scaling vs box filter); both are valid decodes for training.
        self._scale = 1
        if use_native and self.pairs:
            self._probe_native()
        if decode_hw is not None and self._native_shapes is not None:
            assert raw, "decode_hw requires the raw pipeline"
            (ih, iw, ic), (dh, dw, dc) = self._native_shapes
            for s in (2, 4, 8):
                if (ih, iw) == (decode_hw[0] * s, decode_hw[1] * s) and (
                        dh, dw) == (decode_hw[0] * s, decode_hw[1] * s):
                    self._scale = s
                    self._native_shapes = (
                        (decode_hw[0], decode_hw[1], ic),
                        (decode_hw[0], decode_hw[1], dc))
                    break
        # Optional decode-once cache: at TPU train rates the per-epoch JPEG
        # decode is the host bottleneck (PERF.md); pixels are stored in their
        # native integer dtype (uint8 rgb, uint8/uint16 depth).
        self._cache = None
        self._disk = None
        if cache_dir is None:
            cache_dir = os.environ.get("TPUDEPTH_CACHE_DIR")
        if cache_dir is None and cache_decoded and self._native_shapes is not None:
            # Cross-run DEFAULT (round 4): without a disk cache, every new
            # process pays a full decode epoch — fine when the first jit
            # compile hides it, but the persistent compile cache makes warm
            # runs compile in seconds, putting a cold-data epoch-0 back below
            # the device rate (126.5 vs 169.4 img/s at 480x640; PERF.md).
            # Default to a derived per-machine path, budget-capped: engage
            # only when the decoded dataset fits in half the free disk (or
            # TPUDEPTH_CACHE_BUDGET_GB). TPUDEPTH_CACHE_DIR="" opts out.
            cache_dir = self._default_cache_dir()
        if cache_dir and self.pairs and self._native_shapes is not None:
            # memmap-backed cache shared across runs: the decode epoch is a
            # one-time per-machine cost (tpudepth/data/diskcache.py)
            from tpudepth.data.diskcache import RawDiskCache, dataset_cache_key

            (ih, iw, ic), (dh, dw, dc) = self._native_shapes
            dep_dtype = np.uint16 if self._native_bits[1] == 16 else np.uint8
            key = cache_key or dataset_cache_key("", self.pairs)
            if self._scale > 1:  # scaled pixels live in their own cache dir
                key = f"{key}_s{self._scale}"
            try:
                self._disk = RawDiskCache(
                    cache_dir, key,
                    len(self.pairs), (ih, iw, ic), (dh, dw, dc), dep_dtype)
            except OSError:
                self._disk = None
        if self._disk is None and cache_decoded and self.pairs:
            img0, dep0 = self.get_raw(0)
            bytes_per_sample = img0.nbytes + dep0.nbytes
            total_gb = bytes_per_sample * len(self.pairs) / 1e9
            if total_gb <= max_cache_gb:
                self._cache = {}
            # else: silently fall back to streaming decode
        # Overlap the decode-once cache fill with everything else the process
        # does (jit compiles cost minutes on this setup; the native decode
        # releases the GIL): a daemon thread fills unseen indices in order.
        self._fill_stop = False
        if background_fill and (self._disk is not None or self._cache is not None):
            threading.Thread(target=self._background_fill, daemon=True).start()

    def _default_cache_dir(self) -> Optional[str]:
        """Derived cross-run cache path (``~/.cache/tpudepth_data``) iff the
        decoded dataset fits the budget: min(half the free disk at that path,
        TPUDEPTH_CACHE_BUDGET_GB when set)."""
        import shutil

        (ih, iw, ic), (dh, dw, dc) = self._native_shapes
        dep_itemsize = 2 if (self._native_bits and self._native_bits[1] == 16) else 1
        need = len(self.pairs) * (ih * iw * ic + dh * dw * dc * dep_itemsize)
        root = os.path.join(
            os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
            "tpudepth_data")
        try:
            os.makedirs(root, exist_ok=True)
            budget = shutil.disk_usage(root).free * 0.5
        except OSError:
            return None
        env_gb = os.environ.get("TPUDEPTH_CACHE_BUDGET_GB")
        if env_gb:
            budget = min(budget, float(env_gb) * 1e9)
        return root if need <= budget else None

    def _background_fill(self, chunk: int = 32):
        """Fill the raw cache front-to-back in chunks; no-op on cached rows.
        Runs on a daemon thread — harmless overlap on a single core because
        the native decode releases the GIL and the OS timeslices."""
        try:
            n = len(self.pairs)
            for start in range(0, n, chunk):
                if self._fill_stop:
                    return
                idx = [i for i in range(start, min(start + chunk, n))
                       if not self._has_cached(i)]
                if idx:
                    self.get_batch_raw(idx)
        except Exception:
            return  # best-effort: the foreground path still decodes on miss

    def _has_cached(self, i: int) -> bool:
        if self._disk is not None:
            return self._disk.has(i)
        if self._cache is not None:
            return i in self._cache
        return True

    def _probe_native(self):
        """Learn the dataset's (uniform) image dims so batches can decode
        through the C++ multithreaded decoder (tpudepth/data/native)."""
        try:
            from tpudepth.data import native

            rgb = native.probe(self.data[self.pairs[0][0]])
            dep = native.probe(self.data[self.pairs[0][1]])
            if rgb and dep:
                self._native_shapes = (rgb[:3], dep[:3])
                self._native_bits = (rgb[3], dep[3])
        except Exception:
            self._native_shapes = None
            self._native_bits = None

    def __len__(self) -> int:
        return len(self.pairs)

    def get(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Float sample with reference ToTensor + depth scaling applied."""
        if self._disk is not None or self._cache is not None:
            img_raw, dep_raw = self.get_raw(idx)  # cache-filling raw path
            return self._to_float(img_raw), self._to_float(dep_raw, depth=True)
        rgb_name, depth_name = self.pairs[idx][0], self.pairs[idx][1]
        img = _decode(self.data[rgb_name])
        dep = _decode(self.data[depth_name])
        if self.depth_post_scale != 1.0:
            dep = dep * self.depth_post_scale
        return img, dep

    def get_raw(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Native-integer sample (uint8 rgb, uint8/uint16 depth), unscaled."""
        if self._disk is not None:
            hit = self._disk.get(idx)
            if hit is not None:
                return hit
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        rgb_name, depth_name = self.pairs[idx][0], self.pairs[idx][1]
        img = _decode_raw(self.data[rgb_name])
        dep = _decode_raw(self.data[depth_name])
        if self._scale > 1:
            img = _box_down(img, self._scale)
            dep = _box_down(dep, self._scale)
        if self._disk is not None:
            self._disk.put(idx, img, dep)
        elif self._cache is not None:
            self._cache[idx] = (img, dep)
        return img, dep

    def _to_float(self, arr: np.ndarray, depth: bool = False) -> np.ndarray:
        out = arr.astype(np.float32)
        if arr.dtype == np.uint8:
            out /= 255.0
        if depth and self.depth_post_scale != 1.0:
            out *= np.float32(self.depth_post_scale)
        return out

    def get_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        if self.raw:
            return self.get_batch_raw(indices)
        if self._cache is not None:
            outs = list(self._pool.map(self.get, indices))
            return {
                "image": np.stack([o[0] for o in outs]),
                "depth": np.stack([o[1] for o in outs]),
            }
        if self._native_shapes is not None:
            from tpudepth.data import native

            (ih, iw, ic), (dh, dw, dc) = self._native_shapes
            rgb_bufs = [self.data[self.pairs[i][0]] for i in indices]
            dep_bufs = [self.data[self.pairs[i][1]] for i in indices]
            images = native.decode_batch(rgb_bufs, ih, iw, ic)
            depths = native.decode_batch(dep_bufs, dh, dw, dc)
            if images is not None and depths is not None:
                if self.depth_post_scale != 1.0:
                    depths = depths * np.float32(self.depth_post_scale)
                return {"image": images, "depth": depths}
        outs = list(self._pool.map(self.get, indices))
        images = np.stack([o[0] for o in outs])
        depths = np.stack([o[1] for o in outs])
        return {"image": images, "depth": depths}

    def get_batch_raw(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Batch of native-integer pixels. Steady-state cost on a cache hit is
        one uint8 stack (pure memcpy); the device does /255 and depth scaling
        (``make_train_step``'s conversion block)."""
        if self._disk is not None and all(self._disk.has(i) for i in indices):
            idx = np.asarray(list(indices))
            return {"image": self._disk.images[idx],
                    "depth": self._disk.depths[idx]}
        if self._cache is not None and all(i in self._cache for i in indices):
            return {
                "image": np.stack([self._cache[i][0] for i in indices]),
                "depth": np.stack([self._cache[i][1] for i in indices]),
            }
        if self._native_shapes is not None:
            from tpudepth.data import native

            (ih, iw, ic), (dh, dw, dc) = self._native_shapes
            ibits, dbits = self._native_bits
            rgb_bufs = [self.data[self.pairs[i][0]] for i in indices]
            dep_bufs = [self.data[self.pairs[i][1]] for i in indices]
            images = native.decode_batch_raw(rgb_bufs, ih, iw, ic, ibits,
                                             scale_denom=self._scale)
            depths = native.decode_batch_raw(dep_bufs, dh, dw, dc, dbits,
                                             scale_denom=self._scale)
            if images is not None and depths is not None:
                if self._disk is not None:
                    for j, i in enumerate(indices):
                        self._disk.put(i, images[j], depths[j])
                elif self._cache is not None:
                    for j, i in enumerate(indices):
                        self._cache[i] = (images[j], depths[j])
                return {"image": images, "depth": depths}
        outs = list(self._pool.map(self.get_raw, indices))
        return {
            "image": np.stack([o[0] for o in outs]),
            "depth": np.stack([o[1] for o in outs]),
        }


class DataLoader:
    """Batched iterator with optional shuffling and device prefetch.

    TPU-first: while batch N is on device computing, batch N+1 is being
    decoded on host threads and batch N's transfer overlaps via
    ``jax.device_put`` async dispatch.
    """

    def __init__(
        self,
        dataset: NYUDepthDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        sharding=None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(idx)
        nb = len(self)
        return [idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        import jax

        batches = self._batch_indices()
        pool = ThreadPoolExecutor(max_workers=self.prefetch)
        futures = []
        n_ahead = min(self.prefetch, len(batches))
        for b in batches[:n_ahead]:
            futures.append(pool.submit(self.dataset.get_batch, b))
        for i, _ in enumerate(batches):
            batch = futures[i].result()
            nxt = i + n_ahead
            if nxt < len(batches):
                futures.append(pool.submit(self.dataset.get_batch, batches[nxt]))
            if self.sharding is not None:
                batch = {
                    k: jax.device_put(v, self.sharding) for k, v in batch.items()
                }
            yield batch
        pool.shutdown(wait=False)


#: csv pair-list names and depth decode scale per dataset family.
#: nyu*: Alhashim layout, 8-bit depth already /255 by the decoder
#: (``src/data.py:54-55,132,153``); kitti: 16-bit png, meters = value/256
#: (standard KITTI convention — the reference's kitti path lives in its
#: missing upstream data package, re-derived here).
DATASET_LAYOUTS = {
    "nyu": ("data/nyu2_train.csv", "data/nyu2_test.csv", 1.0),
    "nyu_reduced": ("data/nyu2_train.csv", "data/nyu2_test.csv", 1.0),
    "kitti": ("data/kitti_train.csv", "data/kitti_test.csv", 1.0 / 256.0),
}


def _available_ram_gb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def get_training_testing_data(
    batch_size: int,
    zip_path: str = "CSVdata.zip",
    sharding=None,
    shard: int = 0,
    num_shards: int = 1,
    dataset: str = "nyu_reduced",
    raw: Optional[bool] = None,
    cache: Optional[bool] = None,
    cache_dir: Optional[str] = None,
    decode_hw: Optional[Tuple[int, int]] = None,
) -> Tuple[DataLoader, DataLoader]:
    """``getTrainingTestingData`` parity (``src/data.py:171-179``): train
    loader shuffled, test loader in csv order.

    TPU-first defaults: the TRAIN loader feeds raw integer batches (uint8
    rgb / native-depth) with a decode-once RAM cache when it fits in half the
    host's available memory — on this single-core host the device-side /255
    is what keeps the input pipeline above the device train rate (PERF.md).
    ``cache_dir`` (or env TPUDEPTH_CACHE_DIR) upgrades it to a memmap cache
    shared across runs, keyed by zip identity + shard slice. The val loader
    stays in float mode (metrics consume host floats).
    """
    train_csv, test_csv, depth_scale = DATASET_LAYOUTS[dataset]
    data, train_pairs, test_pairs = load_zip_to_mem(zip_path, train_csv, test_csv)
    if raw is None:
        raw = True
    if cache is None:
        cache = True  # NYUDepthDataset falls back to streaming when too big
    from tpudepth.data.diskcache import dataset_cache_key

    shard_pairs = (list(train_pairs)[shard::num_shards]
                   if num_shards > 1 else train_pairs)
    train = NYUDepthDataset(data, train_pairs, shard, num_shards,
                            depth_post_scale=depth_scale, raw=raw,
                            cache_decoded=cache,
                            max_cache_gb=_available_ram_gb() * 0.5,
                            cache_dir=cache_dir,
                            cache_key=dataset_cache_key(zip_path, shard_pairs),
                            decode_hw=decode_hw if raw else None)
    test = NYUDepthDataset(data, test_pairs, depth_post_scale=depth_scale)
    return (
        DataLoader(train, batch_size, shuffle=True, sharding=sharding),
        DataLoader(test, batch_size, shuffle=False, drop_last=False, sharding=sharding),
    )


def get_testing_data(
    batch_size: int, zip_path: str = "testData.zip", sharding=None
) -> DataLoader:
    """``getTestingData`` parity (``src/data.py:203-206``)."""
    with zipfile.ZipFile(zip_path) as zf:
        data = {name: zf.read(name) for name in zf.namelist()}
    pairs = [
        row.split(",")
        for row in data["data/nyu2_test.csv"].decode("utf-8").split("\n")
        if len(row) > 0
    ]
    pairs = reference_shuffle(pairs, 0)
    ds = NYUDepthDataset(data, pairs)
    return DataLoader(ds, batch_size, shuffle=True, drop_last=False, sharding=sharding)
