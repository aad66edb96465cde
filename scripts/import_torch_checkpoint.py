#!/usr/bin/env python
"""Import a reference PyTorch checkpoint into a tpudepth orbax checkpoint.

Handles the reference's checkpoint shapes:
- root rolling checkpoint {'epoch','model_state_dict','optimizer_state_dict',
  'loss'} (``src/train.py:147-153``) — model selected with --model
- GuideDepth per-epoch {'epoch','val_losses','model','optimizer',
  'lr_scheduler'} (``src/GuideDepth/training.py:166-178``)
- bare state_dicts (released GuideDepth weights, DDRNet ImageNet file)

Usage:
  python scripts/import_torch_checkpoint.py ckpt.pth out_dir --model GuideDepth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("out")
    p.add_argument("--model", default="GuideDepth",
                   help="GuideDepth | GuideDepth-S | sam | newcrf | ddrnet")
    args = p.parse_args()

    import torch

    from tpudepth.models.torch_import import (
        convert_attention_model,
        convert_ddrnet,
        convert_guidedepth,
        state_dict_to_numpy,
    )
    from tpudepth.train.checkpoint import save_checkpoint

    blob = torch.load(args.torch_ckpt, map_location="cpu", weights_only=False)
    epoch = 0
    if isinstance(blob, dict) and "model_state_dict" in blob:
        sd = blob["model_state_dict"]
        epoch = int(blob.get("epoch", 0))
    elif isinstance(blob, dict) and "model" in blob and hasattr(
        next(iter(blob["model"].values())), "numpy"
    ):
        sd = blob["model"]
        epoch = int(blob.get("epoch", 0))
    else:
        sd = blob

    sd = state_dict_to_numpy(sd)
    name = args.model
    if name.startswith("GuideDepth"):
        variables = convert_guidedepth(sd)
    elif name == "sam":
        variables = convert_attention_model(sd, "sam")
    elif name == "newcrf":
        variables = convert_attention_model(sd, "newcrf")
    elif name == "ddrnet":
        variables = convert_ddrnet(sd)
    else:
        raise SystemExit(f"unknown --model {name}")

    import jax

    payload = {
        "epoch": epoch,
        "params": jax.device_get(variables["params"]),
        "batch_stats": jax.device_get(variables.get("batch_stats", {})),
        "loss": 0.0,
    }
    save_checkpoint(os.path.abspath(args.out), payload)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"imported {n} parameters from {args.torch_ckpt} -> {args.out}")


if __name__ == "__main__":
    main()
