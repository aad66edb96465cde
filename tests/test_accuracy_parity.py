"""Accuracy-parity regression vs the mounted reference (VERDICT item 3).

Same init (torch -> convert_guidedepth), same batches, same recipe
(Depth_Loss(0.1,1,1) on depth_norm targets, Adam 1e-4, f32, no aug): the
per-step training losses of the reference torch GuideDepth and tpudepth must
track each other, and importing the trained torch ``.pth`` state must
reproduce torch's eval metrics. Full protocol + recorded numbers:
scripts/parity_train.py + BASELINE.md.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

STEPS = 3
MD = 10.0


def _reference_guidedepth():
    for p in ("/root/reference/src", "/root/reference/src/GuideDepth"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch

    torch.manual_seed(0)
    from GuideDepth.model.GuideDepth import GuideDepth as TorchGuideDepth

    return TorchGuideDepth(pretrained=False)


@pytest.mark.slow
@pytest.mark.parametrize("hw", [(96, 128), (240, 320)])
def test_matched_training_losses_and_import_metrics(hw, tmp_path):
    """96x128: the golden-parity resolution. 240x320: the reference's actual
    training default (``src/GuideDepth/main.py:72-87``) — the bounded
    regression assert for the ref-operating-point matched run recorded in
    BASELINE.md (100 steps bs8: max rel loss diff 0.75%)."""
    import optax
    import torch

    tmodel = _reference_guidedepth()  # also puts the reference on sys.path
    from GuideDepth.losses import Depth_Loss as TorchDepthLoss

    from tpudepth.data import get_training_testing_data, make_synthetic_zip
    from tpudepth.eval.metrics import Result
    from tpudepth.losses import DepthLoss
    from tpudepth.models.guidedepth import GuideDepth
    from tpudepth.models.torch_import import convert_guidedepth, state_dict_to_numpy
    from tpudepth.train.trainer import depth_norm, inverse_depth_norm

    # at 64x64 the DAPPM pyramid pools are mostly padding and fp drift grows
    # an order of magnitude — test only at/above the golden resolution.
    zp = make_synthetic_zip(str(tmp_path / "p.zip"), n_train=2 * STEPS, n_test=2,
                            image_hw=hw)
    train_loader, test_loader = get_training_testing_data(2, zp, raw=False)
    train_loader.shuffle = False
    batches = list(train_loader)[:STEPS]
    test_batch = next(iter(test_loader))

    variables = convert_guidedepth(state_dict_to_numpy(tmodel.state_dict()))

    # torch side
    tloss = TorchDepthLoss(0.1, 1.0, 1.0, maxDepth=MD)
    topt = torch.optim.Adam(tmodel.parameters(), 1e-4)
    tmodel.train()
    torch_losses = []
    for b in batches:
        img = torch.from_numpy(b["image"]).permute(0, 3, 1, 2)
        dep = torch.from_numpy(b["depth"]).permute(0, 3, 1, 2) * MD
        tgt = torch.clamp(dep, MD / 100, MD)
        tgt = MD / tgt
        tgt[dep == 0.0] = 0.0
        topt.zero_grad()
        lv = tloss(tmodel(img), tgt)
        lv.backward()
        topt.step()
        torch_losses.append(float(lv.item()))

    # tpudepth side
    model = GuideDepth(dtype=jnp.float32)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    dloss = DepthLoss(0.1, 1.0, 1.0, MD)

    @jax.jit
    def step(params, batch_stats, opt_state, img, dep):
        target = depth_norm(dep * MD, MD)

        def loss_fn(pp):
            pred, mut = model.apply({"params": pp, "batch_stats": batch_stats},
                                    img, train=True, mutable=["batch_stats"])
            return dloss(pred.astype(jnp.float32), target), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    jax_losses = []
    for b in batches:
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            jnp.asarray(b["image"]), jnp.asarray(b["depth"]))
        jax_losses.append(float(loss))

    # step-0 uses identical weights: near-exact (measured 9e-6); later steps
    # track within Adam-amplified fp drift (bs=2 conditioning; the recorded
    # bs=4/20-step run in BASELINE.md stays within 0.12%)
    assert jax_losses[0] == pytest.approx(torch_losses[0], abs=2e-4)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-2)

    # checkpoint-import parity: trained torch weights -> identical metrics
    tmodel.eval()
    with torch.no_grad():
        inv = tmodel(torch.from_numpy(test_batch["image"]).permute(0, 3, 1, 2))
        tpred = torch.clamp(MD / inv, MD / 100, MD).permute(0, 2, 3, 1).numpy()
    gt = test_batch["depth"] * MD
    r_t = Result()
    r_t.evaluate(tpred[gt > 0], gt[gt > 0])

    v2 = convert_guidedepth(state_dict_to_numpy(tmodel.state_dict()))
    inv_j = model.apply(v2, jnp.asarray(test_batch["image"]), train=False)
    jpred = np.asarray(inverse_depth_norm(inv_j.astype(jnp.float32), MD))
    r_j = Result()
    r_j.evaluate(jpred[gt > 0], gt[gt > 0])

    for k in ("rmse", "mae", "absrel", "delta1", "delta2", "delta3"):
        assert getattr(r_j, k) == pytest.approx(getattr(r_t, k), rel=1e-3, abs=1e-4), k


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["sam", "newcrf"])
def test_attention_matched_training_and_import_metrics(variant, tmp_path):
    """Full-model SAM/NewCRF accuracy parity (VERDICT r2 item 5): same torch
    init via convert_attention_model, same batches, the ROOT recipe the
    reference trains these models with (min-max DepthNorm target,
    1.0*SSIM + 0.1*L1 — src/train.py:89-100), SAM's frozen encoder
    (src/model_mobileV3_large_SAM.py:168-169); then checkpoint-import metric
    equality through the root 9-metric path (src/test.py:84-198). The
    20-step run is recorded in BASELINE.md (scripts/parity_train_attention).

    torchvision is absent in this image; tests/torch_mnv3_stub.py supplies
    the exact torchvision MobileNetV3 structure + state_dict naming, so the
    reference decoder code runs unmodified."""
    import optax
    import torch
    import torch.nn as nn

    from torch_mnv3_stub import install
    install()
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")

    torch.manual_seed(0)
    if variant == "sam":
        import model_mobileV3_large_SAM as ref_mod
    else:
        import model_mobileV3_large_newCRFs as ref_mod
    from loss import SSIM as TorchSSIM

    from tpudepth.core.config import EvalConfig
    from tpudepth.data import get_training_testing_data, make_synthetic_zip
    from tpudepth.eval.evaluator import RootEvaluator
    from tpudepth.losses import depth_norm_minmax, l1_loss, ssim
    from tpudepth.models import build_model
    from tpudepth.models.torch_import import (
        convert_attention_model,
        state_dict_to_numpy,
    )

    zp = make_synthetic_zip(str(tmp_path / "p.zip"), n_train=2 * STEPS,
                            n_test=2, image_hw=(96, 128))
    train_loader, test_loader = get_training_testing_data(2, zp, raw=False)
    train_loader.shuffle = False
    batches = list(train_loader)[:STEPS]

    tmodel = ref_mod.PTModel()
    variables = convert_attention_model(
        state_dict_to_numpy(tmodel.state_dict()), variant)

    # torch side (src/train.py:41,53-55,83-114)
    tssim = TorchSSIM()
    tl1 = nn.L1Loss()
    trainable = [q for q in tmodel.parameters() if q.requires_grad]
    if variant == "sam":
        assert len(trainable) < sum(1 for _ in tmodel.parameters())
    topt = torch.optim.Adam(trainable, 1e-4)
    tmodel.train()
    torch_losses = []
    for b in batches:
        img = torch.from_numpy(b["image"]).permute(0, 3, 1, 2)
        dep = torch.from_numpy(b["depth"]).permute(0, 3, 1, 2)
        depth_n = (dep - dep.min()) / (dep.max() - dep.min())
        pred = tmodel(img)
        lv = 1.0 * tssim(pred, depth_n) + 0.1 * tl1(pred, depth_n)
        topt.zero_grad()
        lv.backward()
        topt.step()
        torch_losses.append(float(lv.item()))

    # tpudepth side
    model = build_model(variant, dtype=jnp.float32)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-4)
    if variant == "sam":
        from tpudepth.train.trainer import freeze_encoder_mask

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            freeze_encoder_mask(params))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, img, dep):
        target = depth_norm_minmax(dep)

        def loss_fn(pp):
            pred, mut = model.apply({"params": pp, "batch_stats": batch_stats},
                                    img, train=True, mutable=["batch_stats"])
            pred = pred.astype(jnp.float32)
            return (1.0 * ssim(pred, target) + 0.1 * l1_loss(pred, target),
                    mut["batch_stats"])

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    jax_losses = []
    for b in batches:
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            jnp.asarray(b["image"]), jnp.asarray(b["depth"]))
        jax_losses.append(float(loss))

    assert jax_losses[0] == pytest.approx(torch_losses[0], abs=2e-4)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-2)

    # checkpoint-import metric equality (root 9-metric path)
    tmodel.eval()
    v2 = convert_attention_model(state_dict_to_numpy(tmodel.state_dict()),
                                 variant)
    cfg = EvalConfig(min_depth_eval=1e-3, max_depth_eval=80)

    def torch_forward(image):
        with torch.no_grad():
            out = tmodel(
                torch.from_numpy(np.asarray(image)).permute(0, 3, 1, 2))
        return out.permute(0, 2, 3, 1).numpy()

    @jax.jit
    def jax_forward(image):
        return model.apply(v2, image, train=False).astype(jnp.float32)

    m_t = RootEvaluator(torch_forward, cfg).evaluate(test_loader)
    m_j = RootEvaluator(jax_forward, cfg).evaluate(test_loader)
    for k in m_t:
        assert m_j[k] == pytest.approx(m_t[k], rel=1e-4, abs=1e-6), k
