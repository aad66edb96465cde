"""Synthetic CSVdata.zip-layout fixture generator.

Produces a tiny zip mimicking the Alhashim NYU-50K layout consumed by
``src/data.py:48-55`` (``data/nyu2_train.csv`` + ``data/nyu2_test.csv`` pair
lists, JPEG RGB + PNG depth): used by unit tests, the ``--data synthetic``
CLI path, and bench warm-up so nothing requires the 4.1 GB dataset.
"""

from __future__ import annotations

import io
import os
import zipfile
from typing import Tuple

import numpy as np


def make_synthetic_zip(
    path: str,
    n_train: int = 16,
    n_test: int = 8,
    image_hw: Tuple[int, int] = (480, 640),
    depth_hw: Tuple[int, int] = None,
    depth_mode: str = "L",  # 'L' (8-bit /255) or 'I;16' (raw uint16)
    seed: int = 0,
) -> str:
    """Write a synthetic dataset zip; returns ``path``.

    Depth maps are smooth gradients plus noise so losses/metrics are
    well-conditioned; 8-bit depth follows the reference's /255 convention
    (``src/data.py:132,153``).
    """
    from PIL import Image

    depth_hw = depth_hw or image_hw
    rng = np.random.default_rng(seed)

    def encode_rgb(h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (xx / w * 255),
                (yy / h * 255),
                rng.uniform(0, 255, (h, w)),
            ],
            axis=-1,
        ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "JPEG", quality=90)
        return buf.getvalue()

    def encode_depth(h, w):
        yy, xx = np.mgrid[0:h, 0:w]
        d = 0.3 + 0.6 * (xx / w) * (yy / h) + rng.uniform(0, 0.05, (h, w))
        buf = io.BytesIO()
        if depth_mode == "L":
            Image.fromarray((d * 255).astype(np.uint8), "L").save(buf, "PNG")
        else:
            Image.fromarray((d * 1000).astype(np.uint16)).save(buf, "PNG")
        return buf.getvalue()

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ih, iw = image_hw
    dh, dw = depth_hw
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        train_rows, test_rows = [], []
        for split, n, rows in (("train", n_train, train_rows), ("test", n_test, test_rows)):
            for i in range(n):
                rgb = f"data/nyu2_{split}/{i:05d}_rgb.jpg"
                dep = f"data/nyu2_{split}/{i:05d}_depth.png"
                zf.writestr(rgb, encode_rgb(ih, iw))
                zf.writestr(dep, encode_depth(dh, dw))
                rows.append(f"{rgb},{dep}")
        zf.writestr("data/nyu2_train.csv", "\n".join(train_rows) + "\n")
        zf.writestr("data/nyu2_test.csv", "\n".join(test_rows) + "\n")
    return path


def make_synthetic_kitti_zip(
    path: str,
    n_train: int = 8,
    n_test: int = 4,
    image_hw: Tuple[int, int] = (384, 1280),
    max_depth: float = 80.0,
    seed: int = 0,
) -> str:
    """KITTI-layout fixture: ``data/kitti_{train,test}.csv`` pair lists,
    JPEG RGB + 16-bit PNG depth with meters = value/256 (the standard KITTI
    convention the re-derived kitti reader implements; the reference's kitti
    branch lives in its missing upstream data package —
    ``src/GuideDepth/training.py:13-16,42-55``).

    Depth is dense and >= 2 m so log-based metrics stay finite.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    h, w = image_hw

    def encode_rgb():
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(xx / w * 255), (yy / h * 255), rng.uniform(0, 255, (h, w))], axis=-1
        ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "JPEG", quality=90)
        return buf.getvalue()

    def encode_depth():
        yy, xx = np.mgrid[0:h, 0:w]
        meters = 2.0 + (max_depth * 0.9 - 2.0) * (xx / w) * (yy / h)
        meters = meters + rng.uniform(0, 0.5, (h, w))
        buf = io.BytesIO()
        Image.fromarray(np.round(meters * 256.0).astype(np.uint16)).save(buf, "PNG")
        return buf.getvalue()

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        for split, n in (("train", n_train), ("test", n_test)):
            rows = []
            for i in range(n):
                rgb = f"data/kitti_{split}/{i:05d}_rgb.jpg"
                dep = f"data/kitti_{split}/{i:05d}_depth.png"
                zf.writestr(rgb, encode_rgb())
                zf.writestr(dep, encode_depth())
                rows.append(f"{rgb},{dep}")
            zf.writestr(f"data/kitti_{split}.csv", "\n".join(rows) + "\n")
    return path


def ensure_synthetic_zip(path: str = "/tmp/tpudepth_synth.zip", **kw) -> str:
    if not os.path.exists(path):
        make_synthetic_zip(path, **kw)
    return path


def ensure_synthetic_kitti_zip(path: str = "/tmp/tpudepth_synth_kitti.zip", **kw) -> str:
    if not os.path.exists(path):
        make_synthetic_kitti_zip(path, **kw)
    return path
