"""KITTI protocol coverage: resolutions, crops, evaluator mode."""

import numpy as np

import jax.numpy as jnp

from tpudepth.core.config import (
    CROPS,
    MAX_DEPTHS,
    RESOLUTIONS,
    EvalConfig,
    kitti_alhashim_crop,
)
from tpudepth.eval.evaluator import AlhashimEvaluator


def test_kitti_tables_match_reference():
    # src/GuideDepth/evaluate.py:14-35
    assert MAX_DEPTHS["kitti"] == 80.0
    assert RESOLUTIONS["kitti"]["full"] == (384, 1280)
    assert RESOLUTIONS["kitti"]["half"] == (192, 640)
    assert RESOLUTIONS["kitti"]["tu_small"] == (128, 416)
    assert RESOLUTIONS["kitti"]["tu_big"] == (228, 912)
    assert CROPS["kitti"] == (128, 381, 45, 1196)


def test_kitti_alhashim_crop_fractions():
    # src/GuideDepth/evaluate.py:123-124 for a 384x1280 gt
    got = kitti_alhashim_crop(384, 1280)
    want = np.array(
        [0.3324324 * 384, 0.91351351 * 384, 0.0359477 * 1280, 0.96405229 * 1280]
    ).astype(np.int32)
    assert got == tuple(want)


def test_kitti_evaluator_uses_fractional_crop(tmp_path):
    """For dataset='kitti' + alhashim mode, the evaluator recomputes the crop
    from the gt size (src/GuideDepth/evaluate.py:118-124)."""
    cfg = EvalConfig(dataset="kitti", resolution="half", eval_mode="alhashim")
    assert cfg.max_depth == 80.0

    h, w = 96, 320  # small stand-in gt size
    rng = np.random.default_rng(0)

    def forward(image):
        return jnp.full((image.shape[0], *cfg.image_size, 1), 80.0 / 5.0)

    batches = [
        {
            "image": rng.random((1, h, w, 3)).astype(np.float32),
            "depth": np.full((1, h, w, 1), 5.0 / 80.0, np.float32),
        }
    ]
    ev = AlhashimEvaluator(forward, cfg)
    avg = ev.evaluate(batches)
    # constant-correct prediction: near-perfect metrics inside the crop
    assert avg.delta1 > 0.99
    assert avg.rmse < 1e-3
