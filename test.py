#!/usr/bin/env python
"""Root evaluation CLI — argument parity with ``src/test.py:30-37``
(--bs --pt --min_depth_eval --max_depth_eval): Garg/Eigen fractional crop,
min-max DepthNorm ground truth, 9-metric NeWCRFs report.

New flags: --data (zip or 'synthetic'), --model, --dtype.
"""

import argparse


def _resolve_data(spec, n_train=32, n_test=8):
    """'synthetic' or 'synthetic:HxW' -> fixture zip path; else pass through."""
    if not str(spec).startswith("synthetic"):
        return spec
    from tpudepth.data.synthetic import ensure_synthetic_zip

    hw = (480, 640)
    if ":" in spec:
        h, w = spec.split(":", 1)[1].split("x")
        hw = (int(h), int(w))
    return ensure_synthetic_zip(
        f"/tmp/tpudepth_synth_{hw[0]}x{hw[1]}.zip",
        n_train=n_train, n_test=n_test, image_hw=hw,
    )


def main():
    parser = argparse.ArgumentParser(
        description="Monocular Depth Estimation via Transfer Learning (TPU eval)"
    )
    parser.add_argument("--bs", "--batch-size", default=6, type=int, help="batch size")
    parser.add_argument("--pt", "--path", default="./checkpoints/global_checkpoint",
                        type=str, help="path to the model checkpoint")
    parser.add_argument("--min_depth_eval", type=float, default=1e-3,
                        help="minimum depth for evaluation")
    parser.add_argument("--max_depth_eval", type=float, default=80,
                        help="maximum depth for evaluation")
    parser.add_argument("--data", default="CSVdata.zip", type=str)
    parser.add_argument("--model", default="GuideDepth", type=str)
    parser.add_argument("--dtype", default="bfloat16", type=str)
    args = parser.parse_args()

    # Must run before anything touches the jax backend (orbax restore in
    # load_checkpoint initializes it) or TPUDEPTH_PLATFORM / the compile
    # cache are silently ignored.
    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()

    import jax.numpy as jnp

    from tpudepth.core.config import EvalConfig
    from tpudepth.data import get_training_testing_data
    from tpudepth.eval.evaluator import RootEvaluator
    from tpudepth.eval.metrics import METRIC_NAMES
    from tpudepth.models import build_model
    from tpudepth.train.checkpoint import load_checkpoint

    zip_path = _resolve_data(args.data)

    print("getting the Model from: ", args.pt)
    model = build_model(args.model, dtype=jnp.bfloat16 if args.dtype.startswith("b") else jnp.float32)
    restored = load_checkpoint(args.pt)
    variables = {"params": restored["params"]}
    if restored.get("batch_stats"):
        variables["batch_stats"] = restored["batch_stats"]
    print("Model started.")
    print("Model with: {} epoch".format(restored.get("epoch", "?")))

    _, test_loader = get_training_testing_data(args.bs, zip_path)

    import jax

    @jax.jit
    def forward(image):
        return model.apply(variables, image, train=False).astype(jnp.float32)

    config = EvalConfig(
        model=args.model, batch_size=args.bs,
        min_depth_eval=args.min_depth_eval, max_depth_eval=args.max_depth_eval,
    )
    evaluator = RootEvaluator(forward, config)
    metrics = evaluator.evaluate(test_loader, progress=True)
    print(RootEvaluator.format_report(metrics, len(test_loader)))


if __name__ == "__main__":
    main()
