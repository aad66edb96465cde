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
    from tpudepth.train.checkpoint import load_checkpoint, save_checkpoint
    from tpudepth.train.trainer import Trainer
    from tpudepth.utils.viz import colorize

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
    epoch_start = 0
    if args.cp == 1:
        print("starting training from the last checkpoint")
        restored = load_checkpoint(
            ckpt_path,
            {"epoch": 0, "params": trainer.state.params,
             "batch_stats": trainer.state.batch_stats,
             "opt_state": trainer.state.opt_state, "loss": 0.0},
        )
        trainer.state = trainer.state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        epoch_start = int(restored["epoch"]) + 1
        print("epoch started:", epoch_start)
        print("loss started:", restored["loss"])

    sharding = batch_sharding(mesh)
    size_loader = len(train_loader)
    steps_cap = args.steps_per_epoch or size_loader

    for epoch in range(epoch_start, args.epochs):
        losses = ScalarMeter()
        batch_time = ScalarMeter()
        train_loader.set_epoch(epoch)
        end = time.time()
        last_loss = 0.0
        for loader_pos, batch in enumerate(train_loader):
            if loader_pos >= steps_cap:
                break
            image = jax.device_put(batch["image"], sharding)
            depth = jax.device_put(batch["depth"], sharding)
            rng = jax.random.fold_in(jax.random.PRNGKey(config.seed),
                                     int(trainer.state.step))
            trainer.state, loss = trainer._train_step(trainer.state, image, depth, rng)

            niter = epoch * size_loader + loader_pos
            if loader_pos % 5 == 0:
                last_loss = float(loss)
                losses.update(last_loss, image.shape[0])
                batch_time.update(time.time() - end)
                eta = str(datetime.timedelta(
                    seconds=int(batch_time.val * (size_loader - loader_pos))))
                print(
                    f"Epoch: [{epoch}][{loader_pos}/{size_loader}]\t"
                    f"Time {batch_time.val:.3f} ({batch_time.sum:.3f})\t"
                    f"ETA {eta}\tLoss {losses.val:.4f} ({losses.avg:.4f})"
                )
                if writer:
                    writer.add_scalar("Train/Loss", losses.val, niter)
            if writer and loader_pos % 300 == 0:
                print("Recording epoch`s intermediate results. %300")
                log_progress(trainer, test_loader, writer, sharding, niter)
            end = time.time()

        if writer:
            writer.add_scalar("Train/Loss.avg", losses.avg, epoch)
            log_progress(trainer, test_loader, writer, sharding, epoch)

        print("saving a checkpoint.")
        save_checkpoint(ckpt_path, {
            "epoch": epoch,
            "params": jax.device_get(trainer.state.params),
            "batch_stats": jax.device_get(trainer.state.batch_stats),
            "opt_state": jax.device_get(trainer.state.opt_state),
            "loss": last_loss,
        })
        print("checkpoint saved at:", ckpt_path)


if __name__ == "__main__":
    main()
