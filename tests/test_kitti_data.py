"""KITTI ingestion end-to-end: 16-bit png /256 reader, alhashim-crop eval,
'tu' eval mode, fused-loss guard at KITTI full res, and a tiny train run.

The reference's kitti support lives in its missing upstream data package
(``src/GuideDepth/training.py:13-16,42-55``); the reader here re-derives the
standard KITTI depth convention (meters = uint16 png value / 256).
"""

import io
import zipfile

import numpy as np
import pytest

import jax.numpy as jnp

from tpudepth.core.config import EvalConfig, TrainConfig
from tpudepth.data import get_training_testing_data
from tpudepth.data.synthetic import make_synthetic_kitti_zip


@pytest.fixture(scope="module")
def kitti_zip(tmp_path_factory):
    p = tmp_path_factory.mktemp("kitti") / "kitti.zip"
    return make_synthetic_kitti_zip(str(p), n_train=4, n_test=2, image_hw=(96, 320))


def test_kitti_decode_semantics(tmp_path):
    """A known uint16 png value must come back as value/256 meters."""
    from PIL import Image

    raw = np.full((8, 16), 5120, np.uint16)  # 20.0 m
    raw[0, 0] = 0  # invalid/sparse pixel stays 0
    buf = io.BytesIO()
    Image.fromarray(raw).save(buf, "PNG")
    img = np.zeros((8, 16, 3), np.uint8)
    ibuf = io.BytesIO()
    Image.fromarray(img, "RGB").save(ibuf, "JPEG")

    zp = tmp_path / "one.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("data/kitti_train/a.jpg", ibuf.getvalue())
        zf.writestr("data/kitti_train/a.png", buf.getvalue())
        zf.writestr("data/kitti_train.csv",
                    "data/kitti_train/a.jpg,data/kitti_train/a.png\n")
        zf.writestr("data/kitti_test.csv",
                    "data/kitti_train/a.jpg,data/kitti_train/a.png\n")
    train, _ = get_training_testing_data(1, str(zp), dataset="kitti", raw=False)
    batch = next(iter(train))
    dep = batch["depth"]
    assert dep.dtype == np.float32
    assert dep[0, 1, 1, 0] == pytest.approx(20.0)
    assert dep[0, 0, 0, 0] == 0.0


def test_kitti_loader_yields_meters(kitti_zip):
    train, test = get_training_testing_data(2, kitti_zip, dataset="kitti", raw=False)
    batch = next(iter(train))
    d = batch["depth"]
    assert d.min() >= 0.0 and 1.5 < d[d > 0].min() < 3.0
    assert d.max() < 80.0
    assert batch["image"].shape[1:] == (96, 320, 3)


def test_fused_loss_guard_covers_kitti_full_res():
    """KITTI full res 384x1280 (491k px) is inside the fused kernel's 1M-px
    VMEM budget; beyond-budget shapes must fall back to the unfused path."""
    from tpudepth.ops.pallas.fused_loss import fused_depth_loss_available

    assert fused_depth_loss_available((8, 384, 1280, 1))
    assert fused_depth_loss_available((8, 240, 320, 1))
    assert not fused_depth_loss_available((8, 768, 1536, 1))  # 1.18M px
    assert not fused_depth_loss_available((8, 384, 1280, 2))  # multi-channel


def test_kitti_train_and_val_epoch(kitti_zip):
    from tpudepth.core.mesh import create_mesh
    from tpudepth.train.trainer import Trainer

    cfg = TrainConfig(model="GuideDepth-S", dataset="kitti", resolution="half",
                      epochs=1, batch_size=2, compute_dtype="float32")
    assert cfg.max_depth == 80.0
    train, test = get_training_testing_data(2, kitti_zip, dataset="kitti")
    tr = Trainer(cfg, mesh=create_mesh(num_data=2), train_loader=train,
                 val_loader=test)
    # recipe must treat loader depth as meters (no 8-bit rescale)
    assert tr.recipe.depth_scale == 1.0
    assert tr.recipe.max_depth == 80.0
    first = next(iter(train))
    tr.init_state(first["image"])
    loss0 = float(tr.train_step(first))
    assert np.isfinite(loss0)
    avg = tr.val_epoch(max_batches=1)
    assert np.isfinite(avg.rmse)
    # synthetic gt spans ~2..72m; a random-init model should be far off in
    # meters — sanity that metrics are on the meters scale, not [0,1]
    assert avg.rmse > 0.5


def test_kitti_alhashim_eval_crop_path(kitti_zip):
    """alhashim mode on kitti: model at 'half' res, preds upscaled to GT res,
    fractional kitti crop (src/GuideDepth/evaluate.py:118-124)."""
    from tpudepth.eval.evaluator import AlhashimEvaluator

    _, test = get_training_testing_data(1, kitti_zip, dataset="kitti")
    cfg = EvalConfig(dataset="kitti", resolution="half", eval_mode="alhashim")

    def forward(image):
        r, g = image[..., 0:1], image[..., 1:2]
        meters = 2.0 + 70.0 * r * g + 0.25
        return 80.0 / jnp.clip(meters, 0.8, 80.0)

    ev = AlhashimEvaluator(forward, cfg, depth_scale=1.0)
    avg = ev.evaluate(test)
    assert np.isfinite(avg.rmse)
    assert avg.delta1 > 0.8, (avg.rmse, avg.absrel, avg.delta1)


def test_kitti_tu_eval_mode(kitti_zip):
    """'tu' mode: evaluate at the model resolution directly — no crop, no
    prediction upscale; image+gt resized to the tu resolution."""
    from tpudepth.eval.evaluator import AlhashimEvaluator

    _, test = get_training_testing_data(1, kitti_zip, dataset="kitti")
    cfg = EvalConfig(dataset="kitti", resolution="tu_small", eval_mode="tu")
    assert cfg.image_size == (128, 416)

    seen_shapes = []

    def forward(image):
        seen_shapes.append(tuple(image.shape))
        r, g = image[..., 0:1], image[..., 1:2]
        meters = 2.0 + 70.0 * r * g + 0.25
        return 80.0 / jnp.clip(meters, 0.8, 80.0)

    ev = AlhashimEvaluator(forward, cfg, depth_scale=1.0)
    avg = ev.evaluate(test)
    assert all(s[1:3] == (128, 416) for s in seen_shapes)
    assert np.isfinite(avg.rmse)
    assert avg.delta1 > 0.8
