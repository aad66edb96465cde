#!/usr/bin/env python
"""GuideDepth stack CLI — argument parity with ``src/GuideDepth/main.py:10-96``
(--train/--eval, --data_path/--test_path, --dataset, --resolution, --eval_mode,
--model, --weights_path, --load_checkpoint, --save_checkpoint, --save_results,
--batch_size, --learning_rate, --num_epochs, --scheduler_step_size,
--num_workers).

Trains with the alhashim Depth_Loss(0.1, 1, 1) recipe on inverse-depth-norm
targets (``src/GuideDepth/training.py:63-66,199-204``) and evaluates with the
flip-TTA / Eigen-crop Evaluater protocol.
"""

import argparse
import os
import time


def _resolve_data(spec, n_train=32, n_test=8, dataset="nyu_reduced"):
    """'synthetic' or 'synthetic:HxW' -> fixture zip path; else pass through."""
    if not str(spec).startswith("synthetic"):
        return spec
    if dataset == "kitti":
        from tpudepth.data.synthetic import ensure_synthetic_kitti_zip

        hw = (384, 1280)
        if ":" in spec:
            h, w = spec.split(":", 1)[1].split("x")
            hw = (int(h), int(w))
        return ensure_synthetic_kitti_zip(
            f"/tmp/tpudepth_synth_kitti_{hw[0]}x{hw[1]}.zip",
            n_train=n_train, n_test=n_test, image_hw=hw,
        )
    from tpudepth.data.synthetic import ensure_synthetic_zip

    hw = (480, 640)
    if ":" in spec:
        h, w = spec.split(":", 1)[1].split("x")
        hw = (int(h), int(w))
    return ensure_synthetic_zip(
        f"/tmp/tpudepth_synth_{hw[0]}x{hw[1]}.zip",
        n_train=n_train, n_test=n_test, image_hw=hw,
    )


def get_args():
    parser = argparse.ArgumentParser(description="UpSampling for Monocular Depth Estimation (TPU)")
    parser.set_defaults(train=False, evaluate=False)
    parser.add_argument("--train", dest="train", action="store_true")
    parser.add_argument("--eval", dest="evaluate", action="store_true")
    parser.add_argument("--data_path", type=str, default="CSVdata.zip")
    parser.add_argument("--test_path", type=str, default="")
    parser.add_argument("--dataset", type=str, choices=["kitti", "nyu", "nyu_reduced"],
                        default="nyu_reduced")
    parser.add_argument("--resolution", type=str,
                        choices=["full", "half", "mini", "tu_small", "tu_big"],
                        default="half")
    parser.add_argument("--eval_mode", type=str, choices=["alhashim", "tu"],
                        default="alhashim")
    parser.add_argument("--model", type=str, default="GuideDepth")
    parser.add_argument("--weights_path", type=str, default=None)
    parser.add_argument("--load_checkpoint", type=str, default="")
    parser.add_argument("--save_checkpoint", type=str, default="./checkpoints")
    parser.add_argument("--save_results", type=str, default="./results")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--num_epochs", type=int, default=20)
    parser.add_argument("--scheduler_step_size", type=int, default=15)
    parser.add_argument("--num_workers", type=int, default=2)
    parser.add_argument("--steps-per-epoch", type=int, default=0)
    return parser.parse_args()


def main():
    args = get_args()
    print(args)

    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import numpy as np

    from tpudepth.core.config import EvalConfig, TrainConfig
    from tpudepth.core.mesh import create_mesh
    from tpudepth.data import get_training_testing_data
    from tpudepth.train.checkpoint import load_checkpoint
    from tpudepth.train.trainer import Trainer

    data_path = _resolve_data(args.data_path, dataset=args.dataset)
    test_path = (
        _resolve_data(args.test_path, dataset=args.dataset)
        if args.test_path else data_path
    )

    mesh = create_mesh()
    os.makedirs(args.save_checkpoint, exist_ok=True)
    os.makedirs(args.save_results, exist_ok=True)

    if args.train:
        config = TrainConfig(
            model=args.model, dataset=args.dataset, resolution=args.resolution,
            epochs=args.num_epochs, batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            scheduler_step_size=args.scheduler_step_size,
            eval_mode=args.eval_mode, data_path=data_path,
            checkpoint_dir=args.save_checkpoint, results_dir=args.save_results,
        )
        print("Maximum Depth of Dataset: {}".format(config.max_depth))
        # decode_hw: decode JPEGs directly at the training resolution when it
        # divides the file dims (DCT scaling — single-core host lever); the
        # train step additionally down-resizes on device if needed.
        train_loader, val_loader = get_training_testing_data(
            args.batch_size, data_path, dataset=args.dataset,
            decode_hw=config.image_size)
        trainer = Trainer(config, mesh=mesh, train_loader=train_loader,
                          val_loader=val_loader)

        first = next(iter(train_loader))
        trainer.init_state(first["image"])

        if args.load_checkpoint:
            trainer.restore(args.load_checkpoint)

        def on_epoch_end(epoch, train_avg, val_avg, tr):
            print("{} - Average Training Loss: {:3.4f}".format(
                time.strftime("%H:%M"), train_avg))
            if val_avg is not None:
                print("{} - Average Validation Loss: {:3.4f}".format(
                    time.strftime("%H:%M"), tr.val_losses[-1]))
                print("\n*\nRMSE={a.rmse:.3f}\nMAE={a.mae:.3f}\n"
                      "Delta1={a.delta1:.3f}\nDelta2={a.delta2:.3f}\n"
                      "Delta3={a.delta3:.3f}\nREL={a.absrel:.3f}\n"
                      "Lg10={a.lg10:.3f}\nt_GPU={a.gpu_time:.3f}\n".format(a=val_avg))

        # per-epoch checkpoints w/ val_losses + real best-epoch export
        # (src/GuideDepth/training.py:72-86,166-189)
        final = trainer.fit(
            epochs=args.num_epochs,
            steps_per_epoch=args.steps_per_epoch,
            val_max_batches=args.steps_per_epoch or 0,
            on_epoch_end=on_epoch_end,
            checkpoint_style="per_epoch",
            export_best=True,
        )
        args.weights_path = final
        print("Model saved.")

    if args.evaluate:
        import jax.numpy as jnp

        from tpudepth.eval.evaluator import AlhashimEvaluator
        from tpudepth.models import build_model

        config = EvalConfig(
            model=args.model, dataset=args.dataset, resolution=args.resolution,
            eval_mode=args.eval_mode, results_dir=args.save_results,
        )
        print("Resolution for Eval: {}".format(config.image_size))
        print("Maximum Depth of Dataset: {}".format(config.max_depth))
        model = build_model(args.model, dtype=jnp.bfloat16)
        if args.weights_path and os.path.exists(str(args.weights_path)):
            restored = load_checkpoint(args.weights_path)
            variables = {"params": restored["params"]}
            if restored.get("batch_stats"):
                variables["batch_stats"] = restored["batch_stats"]
        else:
            print("no weights_path; using random init")
            from tpudepth.models.registry import init_model
            variables = init_model(
                model, jax.random.PRNGKey(0),
                np.zeros((1, *config.image_size, 3), np.float32))

        _, test_loader = get_training_testing_data(1, test_path, dataset=args.dataset)

        @jax.jit
        def forward(image):
            return model.apply(variables, image, train=False).astype(jnp.float32)

        # kitti loader yields meters; nyu 8-bit yields [0,1] * max_depth
        depth_scale = 1.0 if args.dataset == "kitti" else None
        evaluator = AlhashimEvaluator(forward, config, depth_scale=depth_scale)
        avg = evaluator.evaluate(test_loader, save_results_to=args.save_results)
        print(AlhashimEvaluator.format_report(avg))


if __name__ == "__main__":
    main()
