#!/usr/bin/env python
"""Accuracy-parity harness: reference torch-CPU GuideDepth vs tpudepth.

Both sides start from the SAME weights (torch init -> convert_guidedepth),
consume the SAME synthetic-fixture batches in the same order, use the same
recipe (alhashim Depth_Loss(0.1,1,1) on depth_norm targets,
src/GuideDepth/training.py:63-66,199-204 / losses.py:25-38) and the same
Adam(lr) settings; no augmentation on either side. Records per-step losses
side by side, then evaluates both models with the same FastDepth metrics on
the test split, and finally pushes the trained torch model through the
.pth -> orbax import path (scripts/import_torch_checkpoint.py equivalent)
and re-evaluates to prove checkpoint-import parity.

Run on CPU (the only hardware the reference runs on here):
  python scripts/parity_train.py --steps 20 --hw 96x128 --bs 4
Results recorded in BASELINE.md.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--hw", default="96x128")
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-depth", type=float, default=10.0)
    args = p.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    for pth in ("/root/reference/src", "/root/reference/src/GuideDepth"):
        if pth not in sys.path:
            sys.path.insert(0, pth)
    import torch

    torch.manual_seed(0)
    from GuideDepth.losses import Depth_Loss as TorchDepthLoss
    from GuideDepth.model.GuideDepth import GuideDepth as TorchGuideDepth

    from tpudepth.data import get_training_testing_data, make_synthetic_zip
    from tpudepth.eval.metrics import Result
    from tpudepth.losses import DepthLoss
    from tpudepth.models.guidedepth import GuideDepth
    from tpudepth.models.torch_import import convert_guidedepth, state_dict_to_numpy
    from tpudepth.train.trainer import depth_norm, inverse_depth_norm

    md = args.max_depth

    # --- shared data ---------------------------------------------------------
    zp = make_synthetic_zip(f"/tmp/parity_{h}x{w}.zip", n_train=args.bs * args.steps,
                            n_test=8, image_hw=(h, w))
    # float batches on BOTH sides: torch consumes float [0,1] directly and
    # the matched-run protocol needs bit-identical pixels (the TPU-first
    # default is raw uint8 + device-side /255, wrong for the torch side)
    train_loader, test_loader = get_training_testing_data(args.bs, zp, raw=False)
    train_loader.shuffle = False  # identical order on both sides
    batches = list(train_loader)
    test_batches = list(test_loader)

    # --- same init on both sides ----------------------------------------------
    tmodel = TorchGuideDepth(pretrained=False)
    sd0 = state_dict_to_numpy(tmodel.state_dict())
    variables = convert_guidedepth(sd0)

    # --- torch side ------------------------------------------------------------
    tloss = TorchDepthLoss(0.1, 1.0, 1.0, maxDepth=md)
    topt = torch.optim.Adam(tmodel.parameters(), args.lr)

    def torch_target(depth_m):
        d = torch.clamp(depth_m, md / 100, md)
        d = md / d
        d[depth_m == 0.0] = 0.0
        return d

    tmodel.train()
    torch_losses = []
    for b in batches[: args.steps]:
        img = torch.from_numpy(b["image"]).permute(0, 3, 1, 2)
        dep = torch.from_numpy(b["depth"]).permute(0, 3, 1, 2) * md
        topt.zero_grad()
        pred = tmodel(img)
        lv = tloss(pred, torch_target(dep))
        lv.backward()
        topt.step()
        torch_losses.append(float(lv.item()))

    # --- tpudepth side -----------------------------------------------------------
    import optax

    model = GuideDepth(dtype=jnp.float32)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    loss_fn_obj = DepthLoss(0.1, 1.0, 1.0, md)

    @jax.jit
    def step(params, batch_stats, opt_state, img, dep):
        target = depth_norm(dep * md, md)

        def loss_fn(pp):
            pred, mut = model.apply({"params": pp, "batch_stats": batch_stats},
                                    img, train=True, mutable=["batch_stats"])
            return loss_fn_obj(pred.astype(jnp.float32), target), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state2, loss

    jax_losses = []
    for b in batches[: args.steps]:
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            jnp.asarray(b["image"]), jnp.asarray(b["depth"]))
        jax_losses.append(float(loss))

    # --- matched eval on the test split -----------------------------------------
    def eval_metrics_torch(m):
        m.eval()
        r = Result()
        preds, gts = [], []
        with torch.no_grad():
            for b in test_batches:
                img = torch.from_numpy(b["image"]).permute(0, 3, 1, 2)
                inv = m(img)
                pred = md / inv
                pred = torch.clamp(pred, md / 100, md)
                preds.append(pred.permute(0, 2, 3, 1).numpy())
                gts.append(b["depth"] * md)
        pred = np.concatenate(preds)
        gt = np.concatenate(gts)
        r.evaluate(pred[gt > 0], gt[gt > 0])
        return r

    def eval_metrics_jax(variables):
        r = Result()
        preds, gts = [], []
        for b in test_batches:
            inv = model.apply(variables, jnp.asarray(b["image"]), train=False)
            pred = np.asarray(inverse_depth_norm(inv.astype(jnp.float32), md))
            preds.append(pred)
            gts.append(b["depth"] * md)
        pred = np.concatenate(preds)
        gt = np.concatenate(gts)
        r.evaluate(pred[gt > 0], gt[gt > 0])
        return r

    r_torch = eval_metrics_torch(tmodel)
    r_jax = eval_metrics_jax({"params": params, "batch_stats": batch_stats})

    # --- checkpoint-import parity: trained torch .pth -> orbax -> re-eval --------
    sd_trained = state_dict_to_numpy(tmodel.state_dict())
    v_imported = convert_guidedepth(sd_trained)
    r_imported = eval_metrics_jax(v_imported)

    def row(r):
        return {k: round(float(getattr(r, k)), 5)
                for k in ("rmse", "mae", "absrel", "delta1", "delta2", "delta3", "lg10")}

    out = {
        "config": {"hw": [h, w], "bs": args.bs, "steps": args.steps, "lr": args.lr},
        "loss_step0": {"torch": torch_losses[0], "tpudepth": jax_losses[0]},
        "loss_last": {"torch": torch_losses[-1], "tpudepth": jax_losses[-1]},
        "max_rel_loss_diff": max(
            abs(a - b) / max(abs(a), 1e-12)
            for a, b in zip(torch_losses, jax_losses)),
        "losses_torch": [round(v, 5) for v in torch_losses],
        "losses_tpudepth": [round(v, 5) for v in jax_losses],
        "metrics_torch": row(r_torch),
        "metrics_tpudepth_trained": row(r_jax),
        "metrics_tpudepth_imported_from_torch": row(r_imported),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
