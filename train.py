#!/usr/bin/env python
"""Root training CLI — argument parity with ``src/train.py:26-31``
(--epochs --lr --bs --cp), training GuideDepth with the root recipe
(1.0*SSIM + 0.1*L1 on min-max DepthNorm targets, ``src/train.py:89-100``),
TensorBoard scalars/images with the same tags, rolling global checkpoint.

New flags (TPU): --data (zip path or 'synthetic'), --model, --dtype,
--log-dir.
"""

import argparse
import datetime
import os
import time

import numpy as np


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


def log_progress(trainer, test_loader, writer, sharding, niter):
    """TensorBoard image grids with the reference's tags
    (``LogProgress``, src/train.py:160-190): Train.1.Image / Train.2.Depth at
    step 0, Train.3.Ours / Train.3.Diff each call."""
    import jax
    import jax.numpy as jnp

    from tpudepth.losses import depth_norm_minmax
    from tpudepth.utils.viz import colorize, make_grid

    sample = next(iter(test_loader))
    img = jax.device_put(sample["image"], sharding)
    depth = np.asarray(sample["depth"])
    if niter == 0:
        writer.add_image("Train.1.Image", make_grid(np.asarray(img), normalize=True), niter)
        writer.add_image("Train.2.Depth", colorize(make_grid(depth)), niter)
    pred = trainer.model.apply(
        {"params": trainer.state.params, "batch_stats": trainer.state.batch_stats},
        img.astype(jnp.bfloat16), train=False).astype(jnp.float32)
    pred_n = np.asarray(depth_norm_minmax(pred))
    writer.add_image("Train.3.Ours", colorize(make_grid(pred_n)), niter)
    if pred_n.shape == depth.shape:
        diff = np.abs(pred_n - depth)
        writer.add_image("Train.3.Diff", colorize(make_grid(diff)), niter)


def main():
    parser = argparse.ArgumentParser(
        description="High Quality Monocular Depth Estimation via Transfer Learning (TPU)"
    )
    parser.add_argument("--epochs", default=30, type=int, help="number of total epochs to run")
    parser.add_argument("--lr", "--learning-rate", default=0.0001, type=float,
                        help="initial learning rate")
    parser.add_argument("--bs", default=3, type=int, help="batch size")
    parser.add_argument("--cp", default=0, type=int,
                        help="1 to enable usage of the last checkpoint")
    parser.add_argument("--data", default="CSVdata.zip", type=str,
                        help="dataset zip path, or 'synthetic'")
    parser.add_argument("--model", default="GuideDepth", type=str)
    parser.add_argument("--dtype", default="bfloat16", type=str)
    parser.add_argument("--log-dir", default="runs", type=str)
    parser.add_argument("--steps-per-epoch", default=0, type=int,
                        help="truncate epochs (smoke runs)")
    args = parser.parse_args()

    from tpudepth.core.runtime import apply_platform_override
    apply_platform_override()
    import jax
    import jax.numpy as jnp

    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import batch_sharding, create_mesh
    from tpudepth.data import get_training_testing_data
    from tpudepth.eval.metrics import ScalarMeter
    from tpudepth.train.trainer import Trainer

    zip_path = _resolve_data(args.data)

    config = TrainConfig(
        model=args.model, epochs=args.epochs, batch_size=args.bs,
        learning_rate=args.lr, compute_dtype=args.dtype, data_path=zip_path,
    )

    mesh = create_mesh()
    print(f"Mesh: {mesh.devices.shape} devices {mesh.axis_names}")
    train_loader, test_loader = get_training_testing_data(args.bs, zip_path)
    print("Model created.")

    trainer = Trainer(config, mesh=mesh, train_loader=train_loader,
                      val_loader=test_loader)
    first = next(iter(train_loader))
    trainer.init_state(first["image"])

    # TensorBoard with reference tags (src/train.py:48-49,132,141)
    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(
            logdir=os.path.join(
                args.log_dir,
                f"MobileNetV3_large-e{args.epochs}-bs{args.bs}-lr{args.lr}",
            ),
            flush_secs=30,
        )
    except ImportError:
        pass

    ckpt_path = os.path.abspath("./checkpoints/global_checkpoint")
    if args.cp == 1:
        print("starting training from the last checkpoint")
        restored = trainer.restore(ckpt_path)
        # root schema stores the completed epoch (src/train.py:59-68); bump
        # epoch AND the optimizer step so StepLR / rng stay schedule-aligned
        trainer.set_resume_epoch(trainer.epoch + 1)
        print("epoch started:", trainer.epoch)
        print("loss started:", restored.get("loss", 0.0))

    sharding = batch_sharding(mesh)
    size_loader = len(train_loader)
    losses = ScalarMeter()
    batch_time = ScalarMeter()

    def log_fn(epoch, loader_pos, steps_total, loss_f, dt, niter):
        if loader_pos == 0:  # fresh meters each epoch (src/train.py:74-79)
            losses.reset()
            batch_time.reset()
        losses.update(loss_f, args.bs)
        batch_time.update(dt)
        eta = str(datetime.timedelta(
            seconds=int(batch_time.val * (steps_total - loader_pos))))
        print(
            f"Epoch: [{epoch}][{loader_pos}/{steps_total}]\t"
            f"Time {batch_time.val:.3f} ({batch_time.sum:.3f})\t"
            f"ETA {eta}\tLoss {losses.val:.4f} ({losses.avg:.4f})"
        )
        if writer:
            writer.add_scalar("Train/Loss", losses.val, niter)

    def image_log_fn(niter):
        if writer:
            print("Recording epoch`s intermediate results. %300")
            log_progress(trainer, test_loader, writer, sharding, niter)

    def on_epoch_end(epoch, train_avg, val_avg, tr):
        if writer:
            writer.add_scalar("Train/Loss.avg", losses.avg, epoch)
            log_progress(trainer, test_loader, writer, sharding, epoch)
        print("saving a checkpoint.")

    trainer.val_loader = None  # root recipe logs images instead of validating
    trainer.fit(
        epochs=args.epochs,
        steps_per_epoch=args.steps_per_epoch,
        log_fn=log_fn,
        image_log_fn=image_log_fn,
        on_epoch_end=on_epoch_end,
        checkpoint_style="rolling",
    )
    print("checkpoint saved at:", ckpt_path)


if __name__ == "__main__":
    main()
