#!/usr/bin/env python
"""Accuracy-parity harness for the attention models (VERDICT r2 item 5):
reference torch SAM / NewCRF PTModel vs tpudepth, trained with the ROOT
recipe the reference actually uses for them (``src/train.py:89-100``:
target = per-batch min-max DepthNorm, loss = 1.0*SSIM(3x3 avgpool) +
0.1*L1, Adam; the SAM model freezes its encoder,
``src/model_mobileV3_large_SAM.py:168-169``).

Both sides start from the SAME weights (torch init ->
``convert_attention_model``) and consume the SAME batches. After the
matched-loss run, the trained torch state_dict is imported and both models
are evaluated through the root 9-metric path (``src/test.py:84-198``
protocol via RootEvaluator) to prove checkpoint-import metric equality.

torchvision is absent here; ``tests/torch_mnv3_stub.py`` supplies the exact
torchvision MobileNetV3 structure (same state_dict naming), so the
reference decoder code runs unmodified on top of it.

Run on CPU:  python scripts/parity_train_attention.py --model sam --steps 20
Results recorded in BASELINE.md.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="sam", choices=["sam", "newcrf"])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--hw", default="96x128")
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    args = p.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    import optax
    import torch

    from torch_mnv3_stub import install
    install()
    sys.path.insert(0, "/root/reference/src")

    torch.manual_seed(0)
    if args.model == "sam":
        import model_mobileV3_large_SAM as ref_mod
    else:
        import model_mobileV3_large_newCRFs as ref_mod
    import torch.nn as nn

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

    # --- shared data ---------------------------------------------------------
    zp = make_synthetic_zip(f"/tmp/parity_attn_{h}x{w}.zip",
                            n_train=args.bs * args.steps, n_test=8,
                            image_hw=(h, w))
    train_loader, test_loader = get_training_testing_data(args.bs, zp, raw=False)
    train_loader.shuffle = False
    batches = list(train_loader)

    # --- same init on both sides ----------------------------------------------
    tmodel = ref_mod.PTModel()
    variables = convert_attention_model(
        state_dict_to_numpy(tmodel.state_dict()), args.model)

    # --- torch side (src/train.py:41,53-55,83-114) ------------------------------
    tssim = TorchSSIM()
    tl1 = nn.L1Loss()
    trainable = [q for q in tmodel.parameters() if q.requires_grad]
    topt = torch.optim.Adam(trainable, args.lr)
    tmodel.train()

    def torch_depthnorm(d):
        return (d - d.min()) / (d.max() - d.min())

    torch_losses = []
    for b in batches:
        img = torch.from_numpy(b["image"]).permute(0, 3, 1, 2)
        dep = torch.from_numpy(b["depth"]).permute(0, 3, 1, 2)
        depth_n = torch_depthnorm(dep)
        pred = tmodel(img)
        lv = 1.0 * tssim(pred, depth_n) + 0.1 * tl1(pred, depth_n)
        topt.zero_grad()
        lv.backward()
        topt.step()
        torch_losses.append(float(lv.item()))

    # --- tpudepth side -----------------------------------------------------------
    model = build_model(args.model, dtype=jnp.float32)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(args.lr)
    if args.model == "sam":
        # frozen encoder — the optimizer partition the Trainer uses
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
        print(f"step {len(jax_losses) - 1}: torch="
              f"{torch_losses[len(jax_losses) - 1]:.6f} jax={jax_losses[-1]:.6f}",
              flush=True)

    rel = [abs(a - b) / max(abs(b), 1e-9)
           for a, b in zip(jax_losses, torch_losses)]

    # --- checkpoint-import metric equality (root 9-metric path) -----------------
    tmodel.eval()
    v2 = convert_attention_model(state_dict_to_numpy(tmodel.state_dict()),
                                 args.model)
    cfg = EvalConfig(min_depth_eval=1e-3, max_depth_eval=80)

    def torch_forward(image):
        with torch.no_grad():
            out = tmodel(torch.from_numpy(np.asarray(image)).permute(0, 3, 1, 2))
        return out.permute(0, 2, 3, 1).numpy()

    @jax.jit
    def jax_forward(image):
        return model.apply(v2, image, train=False).astype(jnp.float32)

    m_t = RootEvaluator(torch_forward, cfg).evaluate(test_loader)
    m_j = RootEvaluator(jax_forward, cfg).evaluate(test_loader)

    print(json.dumps({
        "model": args.model, "steps": args.steps, "hw": [h, w], "bs": args.bs,
        "loss_step0": {"torch": torch_losses[0], "jax": jax_losses[0]},
        "loss_final": {"torch": torch_losses[-1], "jax": jax_losses[-1]},
        "max_rel_loss_diff": max(rel),
        "import_metrics_torch": {k: round(v, 6) for k, v in m_t.items()},
        "import_metrics_jax": {k: round(v, 6) for k, v in m_j.items()},
        "max_rel_metric_diff": max(
            abs(m_j[k] - m_t[k]) / max(abs(m_t[k]), 1e-9) for k in m_t),
    }, indent=1))


if __name__ == "__main__":
    main()
