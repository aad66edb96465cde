#!/usr/bin/env python
"""Single-image demo — capability parity with ``src/demo.py`` (which is broken
in the reference snapshot: it imports the commented-out gaussian ``ssim``,
``src/demo.py:17``). Loads a checkpoint, predicts depth for one image, saves
colorized input/prediction side by side.

Usage: python demo.py --image path.jpg --pt ./checkpoints/global_checkpoint
(With no --image, generates a synthetic sample.)
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="tpudepth single-image demo")
    parser.add_argument("--image", default="", type=str, help="input RGB image")
    parser.add_argument("--pt", default="./checkpoints/global_checkpoint", type=str)
    parser.add_argument("--model", default="GuideDepth", type=str)
    parser.add_argument("--out", default="demo_out.png", type=str)
    args = parser.parse_args()

    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from tpudepth.models import build_model
    from tpudepth.train.checkpoint import load_checkpoint
    from tpudepth.utils.viz import colorize_cpu

    if args.image:
        img = Image.open(args.image).convert("RGB").resize((640, 480))
        x = np.asarray(img, np.float32)[None] / 255.0
    else:
        print("no --image given; using a synthetic gradient sample")
        yy, xx = np.mgrid[0:480, 0:640]
        x = np.stack([xx / 640, yy / 480, np.ones_like(xx) * 0.5], -1)[None].astype(
            np.float32
        )

    model = build_model(args.model, dtype=jnp.bfloat16)
    if os.path.exists(args.pt):
        restored = load_checkpoint(args.pt)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
    else:
        print(f"checkpoint {args.pt} not found; using random init")
        from tpudepth.models.registry import init_model
        variables = init_model(model, jax.random.PRNGKey(0), jnp.asarray(x))

    pred = model.apply(variables, jnp.asarray(x), train=False)
    pred = np.asarray(pred.astype(jnp.float32))[0, :, :, 0]
    print("prediction:", pred.shape, "min", pred.min(), "max", pred.max())

    rgb = Image.fromarray((x[0] * 255).astype(np.uint8))
    dep = colorize_cpu(pred).convert("RGB").resize(rgb.size)
    side = Image.new("RGB", (rgb.width * 2, rgb.height))
    side.paste(rgb, (0, 0))
    side.paste(dep, (rgb.width, 0))
    side.save(args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
