"""Metric parity with the reference formulas (src/utils.py:45-66,
src/GuideDepth/metrics.py)."""

import math

import numpy as np
import torch

from tpudepth.core.config import garg_crop
from tpudepth.eval.metrics import AverageMeter, Result, compute_errors


def test_compute_errors_matches_reference_formulas(rng):
    gt = rng.random(1000).astype(np.float64) * 9 + 0.5
    pred = gt * (1 + 0.1 * rng.standard_normal(1000))
    pred = np.clip(pred, 1e-3, 80)

    silog, abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3 = compute_errors(gt, pred)

    thresh = np.maximum(gt / pred, pred / gt)
    assert d1 == np.mean(thresh < 1.25)
    assert d2 == np.mean(thresh < 1.25**2)
    assert d3 == np.mean(thresh < 1.25**3)
    assert abs(rms - np.sqrt(np.mean((gt - pred) ** 2))) < 1e-12
    assert abs(abs_rel - np.mean(np.abs(gt - pred) / gt)) < 1e-12
    assert abs(sq_rel - np.mean((gt - pred) ** 2 / gt)) < 1e-12
    err = np.log(pred) - np.log(gt)
    assert abs(silog - np.sqrt(np.mean(err**2) - np.mean(err) ** 2) * 100) < 1e-9
    assert abs(log10 - np.mean(np.abs(np.log10(pred) - np.log10(gt)))) < 1e-12
    assert abs(log_rms - np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2))) < 1e-12


def test_result_evaluate_matches_torch_formulas(rng):
    out = rng.random((1, 1, 40, 50)).astype(np.float64) * 9 + 0.5
    tgt = rng.random((1, 1, 40, 50)).astype(np.float64) * 9 + 0.5

    r = Result()
    r.evaluate(out, tgt)

    to, tt = torch.from_numpy(out), torch.from_numpy(tgt)
    abs_diff = (to - tt).abs()
    assert abs(r.mse - float((abs_diff**2).mean())) < 1e-12
    assert abs(r.rmse - math.sqrt(float((abs_diff**2).mean()))) < 1e-12
    assert abs(r.mae - float(abs_diff.mean())) < 1e-12
    lg = (torch.log10(to) - torch.log10(tt)).abs()
    assert abs(r.lg10 - float(lg.mean())) < 1e-12
    assert abs(r.rmse_log - math.sqrt(float((lg**2).mean()))) < 1e-12
    assert abs(r.absrel - float((abs_diff / tt).mean())) < 1e-12
    mr = torch.max(to / tt, tt / to)
    assert r.delta1 == float((mr < 1.25).double().mean())
    inv_diff = (1 / to - 1 / tt).abs()
    assert abs(r.imae - float(inv_diff.mean())) < 1e-12


def test_average_meter_weighted_average():
    m = AverageMeter()
    r1, r2 = Result(), Result()
    r1.rmse, r1.mae, r1.rmse_log = 1.0, 2.0, 3.0
    r2.rmse, r2.mae, r2.rmse_log = 3.0, 4.0, 5.0
    m.update(r1, gpu_time=0.0, data_time=0.0, n=1)
    m.update(r2, gpu_time=0.0, data_time=0.0, n=3)
    avg = m.average()
    assert abs(avg.rmse - 2.5) < 1e-12
    assert abs(avg.mae - 3.5) < 1e-12
    # regression for the reference's mae/rmse_log swap (metrics.py:98-103)
    assert abs(avg.rmse_log - 4.5) < 1e-12


def test_garg_crop_matches_reference_fractions():
    # src/test.py:119 on a 240x320 ground truth
    assert garg_crop(240, 320) == (22, 235, 20, 300)
    got = garg_crop(480, 640)
    assert got == (
        int(0.09375 * 480),
        int(0.98125 * 480),
        int(0.0640625 * 640),
        int(0.9390625 * 640),
    )
