"""Evaluation drivers for both reference protocols.

- :class:`RootEvaluator` — ``src/test.py:84-198``: per-batch min-max DepthNorm
  ground truth, prediction clamped to [min_depth_eval, max_depth_eval] with
  inf/nan scrubbing (``:105-108``), validity mask AND fractional Garg/Eigen
  crop (``:110-123``), 9-metric ``compute_errors`` accumulated over batches.
- :class:`AlhashimEvaluator` — ``src/GuideDepth/evaluate.py:81-157``: flip-TTA
  (the flipped image is evaluated as an extra sample), model runs at reduced
  resolution and predictions are upscaled to GT resolution (``:95-116``),
  fixed Eigen crop [20,460,24,616] for NYU / fractional crop for KITTI
  (``:118-132``), FastDepth Result/AverageMeter metrics, results.txt output
  (``:159-171``).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpudepth.core.config import EvalConfig, garg_crop, kitti_alhashim_crop
from tpudepth.eval.metrics import METRIC_NAMES, AverageMeter, Result, compute_errors
from tpudepth.losses import depth_norm_minmax
from tpudepth.ops.image import resize_bilinear
from tpudepth.train.trainer import inverse_depth_norm


class RootEvaluator:
    """``src/test.py`` protocol over a forward fn(image_nhwc)->depth_nhwc."""

    def __init__(self, forward: Callable, config: EvalConfig):
        self.forward = forward
        self.config = config

    def evaluate(self, loader, progress: bool = False) -> Dict[str, float]:
        cfg = self.config
        measures = np.zeros(10, dtype=np.float64)
        for i, batch in enumerate(loader):
            image = jnp.asarray(batch["image"])
            depth = jnp.asarray(batch["depth"])
            gt = np.asarray(depth_norm_minmax(depth)).squeeze(-1)
            pred = np.asarray(self.forward(image)).squeeze(-1)
            if pred.shape != gt.shape:
                pred = np.asarray(
                    resize_bilinear(
                        jnp.asarray(pred)[..., None], gt.shape[-2:]
                    )
                ).squeeze(-1)

            pred = pred.copy()
            pred[pred < cfg.min_depth_eval] = cfg.min_depth_eval
            pred[pred > cfg.max_depth_eval] = cfg.max_depth_eval
            pred[np.isinf(pred)] = cfg.max_depth_eval
            pred[np.isnan(pred)] = cfg.min_depth_eval

            mask = np.logical_and(gt > cfg.min_depth_eval, gt < cfg.max_depth_eval)
            h, w = gt.shape[1], gt.shape[2]
            crop = garg_crop(h, w)
            crop_mask = np.zeros_like(mask)
            crop_mask[:, crop[0] : crop[1], crop[2] : crop[3]] = True
            mask = np.logical_and(mask, crop_mask)

            m = compute_errors(gt[mask], pred[mask])
            measures[:9] += np.asarray(m)
            measures[9] += 1
            if progress and i % 5 == 0:
                print(f"Step: [{i}/{len(loader)}]")
        measures[:9] /= measures[9]
        return dict(zip(METRIC_NAMES, measures[:9].tolist()))

    @staticmethod
    def format_report(metrics: Dict[str, float], count: int) -> str:
        """The reference's eval printout layout (``src/test.py:192-198``)."""
        header = ", ".join(f"{n:>7}" for n in METRIC_NAMES)
        values = ", ".join(f"{metrics[n]:7.4f}" for n in METRIC_NAMES)
        return (
            f"Computing errors for {count} eval samples\n{header}\n{values}"
        )


class AlhashimEvaluator:
    """``src/GuideDepth/evaluate.py`` Evaluater protocol."""

    # reference's fixed sample-visualization indices (evaluate.py:73-79)
    DEFAULT_VISUALIZE = tuple(
        base + off for base in range(0, 700, 100) for off in range(6)
    )

    def __init__(
        self,
        forward: Callable,
        config: EvalConfig,
        depth_scale: Optional[float] = None,
        visualize_images: Tuple[int, ...] = (),
        forward_returns_meters: bool = False,
    ):
        self.forward = forward
        self.config = config
        # loader depth in [0,1] (8-bit) -> meters
        self.depth_scale = depth_scale if depth_scale is not None else config.max_depth
        self.visualize_images = set(visualize_images)
        # True when ``forward`` already applies the inverse depth norm (the
        # AOT InferenceEngine with max_depth fuses the meters conversion —
        # the reference's TRT eval likewise consumes engine outputs directly,
        # ``src/GuideDepth/inference.py:208-280``)
        self.forward_returns_meters = forward_returns_meters

    def evaluate(self, loader, save_results_to: Optional[str] = None) -> Result:
        cfg = self.config
        meter = AverageMeter()
        max_depth = cfg.max_depth
        crop = list(cfg.crop)

        for i, batch in enumerate(loader):
            t0 = time.time()
            image = jnp.asarray(batch["image"])
            gt = np.asarray(batch["depth"]) * self.depth_scale  # meters
            if cfg.eval_mode != "alhashim" and image.shape[1:3] != cfg.image_size:
                # 'tu' mode: the reference's (missing) loader already yields
                # data AT the model resolution and evaluates there directly —
                # no prediction upscale, no crop (src/GuideDepth/evaluate.py:
                # 60-66 resolution=args.resolution; :95-132 alhashim-only
                # branches). Re-derived: resize image+gt to the model res.
                image = resize_bilinear(image, cfg.image_size)
                had_channel = gt.ndim == 4
                gt4 = gt if had_channel else gt[..., None]
                gt4 = np.asarray(resize_bilinear(jnp.asarray(gt4), cfg.image_size))
                gt = gt4 if had_channel else gt4[..., 0]
            image_flip = jnp.flip(image, axis=2)
            gt_flip = gt[:, :, ::-1]

            if cfg.eval_mode == "alhashim":
                image = resize_bilinear(image, cfg.image_size)
                image_flip = resize_bilinear(image_flip, cfg.image_size)
            data_time = time.time() - t0

            t0 = time.time()
            if self.forward_returns_meters:
                pred = np.asarray(self.forward(image))
                pred_flip = np.asarray(self.forward(image_flip))
            else:
                pred = np.asarray(
                    inverse_depth_norm(self.forward(image), max_depth))
                pred_flip = np.asarray(
                    inverse_depth_norm(self.forward(image_flip), max_depth))
            gpu_time = time.time() - t0

            if cfg.eval_mode == "alhashim":
                gt_hw = gt.shape[1:3]
                pred = np.asarray(resize_bilinear(jnp.asarray(pred), gt_hw))
                pred_flip = np.asarray(resize_bilinear(jnp.asarray(pred_flip), gt_hw))
                if cfg.dataset == "kitti":
                    crop = list(kitti_alhashim_crop(*gt_hw))
                if i in self.visualize_images and save_results_to:
                    self.save_image_results(
                        np.asarray(batch["image"]), gt[..., None] if gt.ndim == 3 else gt,
                        pred[..., None] if pred.ndim == 3 else pred,
                        i, save_results_to, cfg.max_depth,
                    )
                gt_c = gt[:, crop[0] : crop[1], crop[2] : crop[3]]
                gt_flip_c = gt_flip[:, crop[0] : crop[1], crop[2] : crop[3]]
                pred_c = pred[:, crop[0] : crop[1], crop[2] : crop[3]]
                pred_flip_c = pred_flip[:, crop[0] : crop[1], crop[2] : crop[3]]
            else:
                gt_c, gt_flip_c, pred_c, pred_flip_c = gt, gt_flip, pred, pred_flip

            r = Result()
            r.evaluate(pred_c, gt_c)
            meter.update(r, gpu_time, data_time, image.shape[0])
            r2 = Result()
            r2.evaluate(pred_flip_c, gt_flip_c)
            meter.update(r2, gpu_time, data_time, image.shape[0])

        avg = meter.average()
        if save_results_to:
            self.save_results(avg, save_results_to)
        return avg

    @staticmethod
    def save_image_results(image, gt, prediction, image_id: int, result_dir: str,
                           max_depth: float = 10.0):
        """Save input / gt / prediction / error-map PNGs for one sample
        (``src/GuideDepth/evaluate.py:198-245``). NHWC numpy inputs."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(result_dir, exist_ok=True)
        img = np.asarray(image)[0]
        gt2d = np.asarray(gt)[0, :, :, 0]
        pred2d = np.asarray(prediction)[0, :, :, 0]
        error_map = gt2d - pred2d
        valid = gt2d[gt2d != 0.0]
        vmax = float(valid.max()) if valid.size else 1.0
        vmin = float(valid.min()) if valid.size else 0.0

        def save(fname, arr, **kw):
            fig = plt.figure(frameon=False)
            ax = plt.Axes(fig, [0.0, 0.0, 1.0, 1.0])
            ax.set_axis_off()
            fig.add_axes(ax)
            ax.imshow(arr, **kw)
            fig.savefig(os.path.join(result_dir, fname))
            plt.close(fig)

        save(f"image_{image_id}.png", np.clip(img, 0, 1))
        save(f"errors_{image_id}.png", error_map, vmin=0.0, vmax=max_depth / 10.0,
             cmap="Reds")
        save(f"gt_{image_id}.png", gt2d, vmin=vmin, vmax=vmax, cmap="viridis")
        save(f"depth_{image_id}.png", pred2d, vmin=vmin, vmax=vmax, cmap="viridis")

    @staticmethod
    def save_results(average: Result, result_dir: str):
        """results.txt format parity (``src/GuideDepth/evaluate.py:159-171``)."""
        os.makedirs(result_dir, exist_ok=True)
        with open(os.path.join(result_dir, "results.txt"), "w") as f:
            f.write("RMSE,MAE,REL, RMSE_log,Lg10,Delta1,Delta2,Delta3\n")
            f.write(
                f"{average.rmse:.3f},{average.mae:.3f},{average.absrel:.3f}"
                f",{average.rmse_log:.3f},{average.lg10:.3f},{average.delta1:.3f}"
                f",{average.delta2:.3f},{average.delta3:.3f}"
            )

    @staticmethod
    def format_report(avg: Result) -> str:
        """Console report parity (``src/GuideDepth/evaluate.py:148-157``)."""
        return (
            "\n*\n"
            f"RMSE={avg.rmse:.3f}\n"
            f"MAE={avg.mae:.3f}\n"
            f"Delta1={avg.delta1:.3f}\n"
            f"Delta2={avg.delta2:.3f}\n"
            f"Delta3={avg.delta3:.3f}\n"
            f"REL={avg.absrel:.3f}\n"
            f"Lg10={avg.lg10:.3f}\n"
            f"t_GPU={avg.gpu_time:.3f}\n"
        )
