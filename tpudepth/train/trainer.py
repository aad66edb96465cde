"""Data-parallel pjit trainer.

Re-implements both reference training recipes on one engine:

- **root recipe** (``src/train.py:83-114``): target = per-batch min-max
  DepthNorm of the stored depth (``src/train.py:89``), loss =
  1.0*SSIM(avg-pool) + 0.1*L1 (``src/train.py:94-100``; the SILog term is
  commented out there and exposed here via ``silog_weight``).
- **alhashim recipe** (``src/GuideDepth/training.py:57-66,88-102``): target =
  inverse depth normalization ``maxDepth / clamp(d, maxD/100, maxD)`` with
  zero masking (``:199-204``), loss = Depth_Loss(0.1, 1, 1) — or masked L1
  Depth_Loss(1, 0, 0) when eval_mode != 'alhashim'.

TPU-first engine differences from the reference (single-GPU, host-side aug):
- one jitted train step: device-side augmentation
  (:mod:`tpudepth.data.augment`) -> target transform -> fwd/bwd -> Adam
  update, with donated state buffers;
- batch arrays arrive sharded over the mesh's 'data' axis; gradients and
  BatchNorm batch statistics become global through XLA-inserted collectives
  (psum over ICI) — DP and SyncBN for free;
- Adam + StepLR(step_size epochs, gamma) (``src/GuideDepth/training.py:57-61``)
  as an optax schedule over steps;
- optional encoder freezing via optax.multi_transform — the reference freezes
  the MobileNetV3 backbone for the SAM model (``src/model_mobileV3_large_SAM.py:168-169``);
- optional ``jax.checkpoint`` rematerialization of the forward.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from tpudepth.core.config import TrainConfig
from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
from tpudepth.core.precision import Precision
from tpudepth.data.augment import augment_batch
from tpudepth.losses import DepthLoss, depth_norm_minmax, l1_loss, silog_loss_variance, ssim


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def step_lr(base_lr: float, step_size_epochs: int, gamma: float, steps_per_epoch: int):
    """torch StepLR as an optax schedule (``src/GuideDepth/training.py:59-61``)."""

    def schedule(step):
        epoch = step // max(1, steps_per_epoch)
        return base_lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(
    config: TrainConfig, steps_per_epoch: int, frozen_mask: Optional[Any] = None
) -> optax.GradientTransformation:
    sched = step_lr(
        config.learning_rate, config.scheduler_step_size, config.scheduler_gamma,
        steps_per_epoch,
    )
    tx = optax.adam(learning_rate=sched)
    if frozen_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, frozen_mask
        )
    return tx


def freeze_encoder_mask(params) -> Any:
    """'frozen' for every leaf under a top-level 'encoder' module."""
    def label(path, _):
        return "frozen" if path[0].key == "encoder" else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def inverse_depth_norm(depth: jax.Array, max_depth: float) -> jax.Array:
    """``Trainer.inverse_depth_norm`` (``src/GuideDepth/training.py:191-196``):
    divide FIRST, then clamp (the mirror of depth_norm, which clamps first)."""
    zero_mask = depth == 0.0
    safe = jnp.where(zero_mask, 1.0, depth)
    out = jnp.clip(max_depth / safe, max_depth / 100.0, max_depth)
    return jnp.where(zero_mask, 0.0, out)


def depth_norm(depth: jax.Array, max_depth: float) -> jax.Array:
    """``Trainer.depth_norm`` (``src/GuideDepth/training.py:199-204``)."""
    zero_mask = depth == 0.0
    out = max_depth / jnp.clip(depth, max_depth / 100.0, max_depth)
    return jnp.where(zero_mask, 0.0, out)


@dataclasses.dataclass(frozen=True)
class LossRecipe:
    """Selects target transform + loss (root vs alhashim/guidedepth)."""

    kind: str = "root"  # 'root' | 'alhashim' | 'l1'
    max_depth: float = 10.0
    depth_scale: float = 1.0  # loader units -> meters (8-bit maps: max_depth)
    silog_weight: float = 0.0

    def target(self, depth: jax.Array) -> jax.Array:
        if self.kind == "root":
            return depth_norm_minmax(depth)
        meters = depth * self.depth_scale
        return depth_norm(meters, self.max_depth)

    def loss(self, pred: jax.Array, target: jax.Array) -> jax.Array:
        if self.kind == "root":
            # fused pallas kernel on TPU (fwd+bwd 20.4 -> ~1 ms at 480x640
            # bs8; numerics match the jnp path — tests/test_fused_root_loss)
            if jax.default_backend() == "tpu" and not self.silog_weight:
                from tpudepth.ops.pallas.fused_root_loss import (
                    fused_root_loss,
                    fused_root_loss_available,
                )

                if fused_root_loss_available(pred.shape):
                    return fused_root_loss(pred, target, 1.0, 0.1)
            total = 1.0 * ssim(pred, target) + 0.1 * l1_loss(pred, target)
            if self.silog_weight:
                total = total + self.silog_weight * silog_loss_variance(pred, target)
            return total
        if self.kind == "alhashim":
            # fused single-pass pallas kernel when shapes fit VMEM and we're
            # on TPU (numerics match the jnp path — tests/test_fused_loss.py)
            if jax.default_backend() == "tpu":
                from tpudepth.ops.pallas.fused_loss import (
                    fused_depth_loss,
                    fused_depth_loss_available,
                )

                if fused_depth_loss_available(pred.shape):
                    return fused_depth_loss(pred, target, 0.1, 1.0, 1.0, self.max_depth)
            return DepthLoss(0.1, 1.0, 1.0, self.max_depth)(pred, target)
        return DepthLoss(1.0, 0.0, 0.0, self.max_depth)(pred, target)


def make_train_step(
    model,
    recipe: LossRecipe,
    compute_dtype=jnp.bfloat16,
    augment: bool = True,
    remat: bool = False,
    check_nans: bool = False,
    check_grads: bool = False,
    depth_post_scale: float = 1.0,
    mesh=None,
    train_hw: Optional[Tuple[int, int]] = None,
):
    """Build the jitted train step: (state, image, depth, rng) -> (state, loss).

    Batches may arrive as raw integer pixels (uint8 rgb, uint8/uint16 depth —
    the loader's ``raw`` mode): normalization then runs on device, where it
    fuses into the first conv / the augmentation, instead of costing a full
    float expansion on the (single-core) host. ``depth_post_scale`` converts
    raw 16-bit depth values to meters (KITTI: 1/256) and is ONLY applied to
    integer-dtype depth — float batches were already scaled by the loader.

    ``train_hw``: the configured training resolution. The reference's
    (missing) data package resized batches to the ``--resolution`` setting on
    the host (``src/GuideDepth/main.py:74-79`` — training at 'half' is its
    default protocol); here the resize runs ON DEVICE, fused into the step.
    Only a DOWN-resize is applied (loader larger than config): test fixtures
    and pre-sized datasets pass through untouched.
    """

    apply_fn = model.apply
    if remat:
        # jax.checkpoint cannot trace the non-array kwargs (train/mutable),
        # so checkpoint a positional closure over them (round-4 fix; the
        # naive jax.checkpoint(model.apply) raised on the mutable list).
        _ckpt_apply = jax.checkpoint(
            lambda v, im: model.apply(v, im, train=True,
                                      mutable=["batch_stats"]))

        def apply_fn(variables, image, train, mutable):
            assert train and list(mutable) == ["batch_stats"]
            return _ckpt_apply(variables, image)
    # losses/targets accumulate in f32 (model compute may be bf16); f64
    # compute (CPU invariance tests) keeps the full chain in f64.
    acc_dtype = jnp.float64 if compute_dtype == jnp.float64 else jnp.float32

    def step(state: TrainState, image: jax.Array, depth: jax.Array, rng: jax.Array):
        if image.dtype == jnp.uint8:
            image = image.astype(acc_dtype) * (1.0 / 255.0)
        if depth.dtype == jnp.uint8:
            depth = depth.astype(acc_dtype) * (depth_post_scale / 255.0)
        elif depth.dtype == jnp.uint16:
            depth = depth.astype(acc_dtype) * depth_post_scale
        if train_hw is not None and (image.shape[1] > train_hw[0]
                                     or image.shape[2] > train_hw[1]):
            from tpudepth.ops.image import resize_bilinear

            image = resize_bilinear(image, train_hw)
            depth = resize_bilinear(depth, train_hw)
        if augment:
            image, depth = augment_batch(rng, image, depth)
        target = recipe.target(depth.astype(acc_dtype))

        def loss_fn(params):
            from tpudepth.core.mesh import mesh_context
            from tpudepth.ops.attention import training_mode

            variables = {"params": params, "batch_stats": state.batch_stats}
            # trace-time contexts: select the fused-bwd attention kernels and
            # expose the mesh so deep stages can drop spatial sharding
            # (core/mesh.py:despatialize — correctness AND perf under
            # DP x spatial meshes)
            with training_mode(), mesh_context(mesh):
                pred, mutated = apply_fn(
                    variables, image.astype(compute_dtype), train=True,
                    mutable=["batch_stats"],
                )
            pred = pred.astype(acc_dtype)
            tgt = target
            if pred.shape[1:3] != tgt.shape[1:3]:
                # decoder output may be half-res (DenseDepth family); align the
                # target to the prediction (documented divergence — the
                # reference would simply crash on mismatched shapes).
                from tpudepth.ops.image import resize_bilinear

                tgt = resize_bilinear(tgt, pred.shape[1:3])
            loss = recipe.loss(pred, tgt)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if check_nans:
            loss = jax.lax.cond(
                jnp.isfinite(loss), lambda: loss, lambda: jnp.float32(jnp.nan)
            )
        if check_grads:
            # Cheap grad-poison tripwire (opt-in): XLA:TPU has a known
            # fusion-sensitivity class that can corrupt GRADIENTS while the
            # loss stays finite (docs/xla_tpu_grad_nan_bug.md,
            # scripts/repro_spmd_grad_bug.py). Fold the global grad norm's
            # finiteness into the reported loss so a poisoned step cannot
            # train silently — one extra reduce over the (small) param tree,
            # no extra device->host roundtrip.
            gsq = sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(grads)
            )
            loss = jnp.where(jnp.isfinite(gsq), loss, jnp.float32(jnp.nan))
        state = state.apply_gradients(grads=grads, new_batch_stats=new_stats)
        return state, loss

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(model, compute_dtype=jnp.bfloat16):
    def fwd(params, batch_stats, image):
        variables = {"params": params, "batch_stats": batch_stats}
        pred = model.apply(variables, image.astype(compute_dtype), train=False)
        return pred.astype(jnp.float32)

    return jax.jit(fwd)


class Trainer:
    """End-to-end training driver (capability parity with ``src/train.py``
    and ``src/GuideDepth/training.py`` Trainer)."""

    def __init__(
        self,
        config: TrainConfig,
        model=None,
        mesh=None,
        train_loader=None,
        val_loader=None,
        writer=None,
    ):
        from tpudepth.models import build_model
        from tpudepth.models.registry import canonical_model_name

        self.config = config
        self.mesh = mesh or create_mesh()
        # Canonicalize ONCE: every name-keyed behavior switch below (remat,
        # loss recipe, frozen encoder) uses the canonical name so registry
        # aliases ("mobilev3_sam", ...) cannot dodge reference semantics.
        self.model_name = canonical_model_name(config.model, strict=model is None)
        model_kwargs = {}
        if config.remat_stages and self.model_name in ("GuideDepth", "GuideDepth-S"):
            model_kwargs["remat_stages"] = True
        self.model = model or build_model(
            self.model_name, dtype=_dtype(config.compute_dtype), **model_kwargs)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.writer = writer
        self.epoch = 0
        self.val_losses = []

        if train_loader is not None:
            self.steps_per_epoch = len(train_loader)
        else:
            self.steps_per_epoch = 1

        recipe_kind = "alhashim" if config.eval_mode == "alhashim" else "l1"
        if self.model_name not in ("GuideDepth", "GuideDepth-S"):
            # root stack models train with the root recipe (src/train.py:94-100)
            recipe_kind = "root"
        # 8-bit NYU depth arrives in [0,1] -> scale by max_depth to meters;
        # the kitti reader already yields meters (16-bit png / 256).
        depth_scale = 1.0 if config.dataset == "kitti" else config.max_depth
        self.recipe = LossRecipe(
            kind=recipe_kind,
            max_depth=config.max_depth,
            depth_scale=depth_scale,
        )

        self._rng = jax.random.PRNGKey(config.seed)
        self.state = None
        self._train_step = None

    # -- state ---------------------------------------------------------------

    def init_state(self, sample_image: np.ndarray):
        cfg = self.config
        init_rng, self._rng = jax.random.split(self._rng)
        x = jnp.asarray(sample_image[:1])
        if x.dtype == jnp.uint8:  # raw-mode loader batch: init wants floats
            x = x.astype(jnp.float32) / 255.0
        from tpudepth.models.registry import init_model

        variables = init_model(self.model, init_rng, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())

        frozen_mask = None
        if self.model_name == "sam":
            # the reference freezes the MobileNetV3 backbone for the SAM model
            # only (src/model_mobileV3_large_SAM.py:168-169); keyed on the
            # CANONICAL name so "mobilev3_sam"-style aliases freeze too.
            frozen_mask = freeze_encoder_mask(params)
        tx = make_optimizer(cfg, self.steps_per_epoch, frozen_mask)
        opt_state = tx.init(params)

        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            tx=tx,
            apply_fn=self.model.apply,
        )
        # replicate over the mesh
        rep = replicated(self.mesh)
        self.state = jax.device_put(state, rep)
        raw_depth_scale = 1.0
        if self.train_loader is not None:
            ds = getattr(self.train_loader, "dataset", None)
            raw_depth_scale = float(getattr(ds, "depth_post_scale", 1.0))
        self._train_step = make_train_step(
            self.model,
            self.recipe,
            compute_dtype=_dtype(cfg.compute_dtype),
            remat=cfg.remat,
            check_grads=cfg.check_grads,
            depth_post_scale=raw_depth_scale,
            mesh=self.mesh,
            train_hw=cfg.image_size,
        )
        return self.state

    # -- loops ----------------------------------------------------------------

    def train_step(self, batch, rng=None):
        """One optimizer step on a host batch dict. Public API — CLIs must not
        reach into the jitted ``_train_step`` directly."""
        sharding = batch_sharding(self.mesh)
        image = jax.device_put(batch["image"], sharding)
        depth = jax.device_put(batch["depth"], sharding)
        if rng is None:
            rng = jax.random.fold_in(self._rng, int(self.state.step))
        self.state, loss = self._train_step(self.state, image, depth, rng)
        return loss

    def train_epoch(self, log_fn=None, steps_cap: int = 0, image_log_fn=None) -> float:
        """One epoch; returns the EXACT sample-weighted mean of every step's
        loss (the reference updates its meter every iteration —
        ``src/train.py:111-132``). TPU-honest accounting: the running sum is a
        device scalar updated by a lazily-dispatched add per step, fetched
        ONCE at epoch end — no per-step device->host sync (host floats are
        only pulled on ``log_every`` steps, for the console/TB line)."""
        cfg = self.config
        steps_total = len(self.train_loader)
        steps_cap = steps_cap or steps_total
        total_dev, count = None, 0
        start = time.perf_counter()
        for i, batch in enumerate(self.train_loader):
            if i >= steps_cap:
                break
            loss = self.train_step(batch)
            bs = batch["image"].shape[0]
            contrib = jnp.asarray(loss, jnp.float32) * bs
            total_dev = contrib if total_dev is None else total_dev + contrib
            count += bs
            niter = self.epoch * steps_total + i
            if i % cfg.log_every == 0 and log_fn:
                log_fn(self.epoch, i, steps_total, float(loss),
                       time.perf_counter() - start, niter)
                start = time.perf_counter()
            if image_log_fn and i % cfg.image_log_every == 0:
                image_log_fn(niter)
        if total_dev is None:
            return 0.0
        return float(total_dev) / max(count, 1)

    def val_epoch(self, max_batches: int = 0):
        """Validation loop parity (``src/GuideDepth/training.py:110-154``):
        loss on normalized targets + FastDepth metrics on inverse-normalized
        predictions vs meters."""
        from tpudepth.eval.metrics import AverageMeter, Result
        from tpudepth.utils.profiling import StepTimer

        if self.val_loader is None:
            return None
        cfg = self.config
        sharding = batch_sharding(self.mesh)
        eval_step = make_eval_step(self.model, _dtype(cfg.compute_dtype))
        meter = AverageMeter()
        timer = StepTimer()
        acc_loss, seen = 0.0, 0
        for i, batch in enumerate(self.val_loader):
            if max_batches and i >= max_batches:
                break
            image = jax.device_put(batch["image"], sharding)
            depth = jnp.asarray(batch["depth"], jnp.float32)
            if image.dtype == jnp.uint8:
                image = image.astype(jnp.float32) / 255.0
            hw = cfg.image_size
            if image.shape[1] > hw[0] or image.shape[2] > hw[1]:
                # validate at the configured model resolution (the reference
                # val loop consumes model-res batches from its loader)
                from tpudepth.ops.image import resize_bilinear

                image = resize_bilinear(image, hw)
            timer.data_done()
            inv_pred = eval_step(self.state.params, self.state.batch_stats, image)
            pred_m = inverse_depth_norm(inv_pred, cfg.max_depth)
            timer.step_done(sync_on=pred_m)
            target = self.recipe.target(depth)
            if inv_pred.shape[1:3] != target.shape[1:3]:
                from tpudepth.ops.image import resize_bilinear

                target = resize_bilinear(target, inv_pred.shape[1:3])
            acc_loss += float(self.recipe.loss(inv_pred, target))
            seen += 1
            gt_m = np.asarray(depth) * self.recipe.depth_scale
            pred_np = np.asarray(pred_m)
            if pred_np.shape[1:3] != gt_m.shape[1:3]:
                from tpudepth.ops.image import resize_bilinear

                pred_np = np.asarray(
                    resize_bilinear(jnp.asarray(pred_np), gt_m.shape[1:3])
                )
            valid = gt_m > 0
            r = Result()
            r.evaluate(np.clip(pred_np[valid], 1e-3, None), gt_m[valid])
            t = timer.summary()
            meter.update(r, t["compute_time_per_step"], t["data_time_per_step"],
                         image.shape[0])
        avg = meter.average()
        self.val_losses.append(acc_loss / max(seen, 1))
        return avg

    # -- checkpointing ---------------------------------------------------------

    def _state_payload(self):
        return {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
        }

    def save_epoch_checkpoint(self, epoch: int) -> str:
        """GuideDepth schema: per-epoch ``checkpoint_{e}`` carrying epoch+1 and
        the ``val_losses`` history (``src/GuideDepth/training.py:166-178``)."""
        from tpudepth.train.checkpoint import save_checkpoint

        path = os.path.join(
            os.path.abspath(self.config.checkpoint_dir), f"checkpoint_{epoch}"
        )
        payload = {"epoch": epoch + 1, "val_losses": list(self.val_losses)}
        payload.update(self._state_payload())
        save_checkpoint(path, payload)
        return path

    def save_rolling_checkpoint(self, epoch: int, loss: float) -> str:
        """Root schema: one rolling ``global_checkpoint``
        (``src/train.py:147-153``)."""
        from tpudepth.train.checkpoint import save_checkpoint

        path = os.path.join(
            os.path.abspath(self.config.checkpoint_dir), "global_checkpoint"
        )
        payload = {"epoch": epoch, "loss": float(loss)}
        payload.update(self._state_payload())
        save_checkpoint(path, payload)
        return path

    def restore(self, path: str):
        """Resume mid-training: state + epoch counter + val_losses history.

        The live state serves as the restore template so optax NamedTuple
        opt-state structure survives the orbax round trip (a raw restore
        returns plain dicts, which ``tx.update`` cannot consume)."""
        from tpudepth.train.checkpoint import load_checkpoint

        raw = load_checkpoint(path)  # metadata (epoch, val_losses, loss, ...)
        target = dict(raw)
        target["params"] = jax.device_get(self.state.params)
        target["batch_stats"] = jax.device_get(self.state.batch_stats)
        target["opt_state"] = jax.device_get(self.state.opt_state)
        restored = load_checkpoint(path, target)
        rep = replicated(self.mesh)
        self.state = self.state.replace(
            params=jax.device_put(restored["params"], rep),
            batch_stats=jax.device_put(restored["batch_stats"], rep),
            opt_state=jax.device_put(restored["opt_state"], rep),
            step=jnp.asarray(
                restored.get("epoch", 0) * self.steps_per_epoch, jnp.int32
            ),
        )
        # guidedepth schema stores epoch+1 (the epoch to resume at); the root
        # schema stores the completed epoch, whose resume point is epoch+1 —
        # callers adjust via set_resume_epoch (src/train.py:59-68 semantics),
        # which keeps the optimizer step counter (StepLR schedule, rng
        # fold_in) consistent with the adjusted epoch.
        self.epoch = int(restored.get("epoch", 0))
        self.val_losses = [float(v) for v in restored.get("val_losses", [])]
        return restored

    def set_resume_epoch(self, epoch: int):
        """Set the epoch training resumes at AND the matching optimizer step
        so the step-based StepLR schedule and per-step rng fold_in stay
        aligned (root rolling schema stores the *completed* epoch, so its
        resume point is epoch+1 — without this the schedule would run one
        epoch of steps behind)."""
        self.epoch = int(epoch)
        self.state = self.state.replace(
            step=jnp.asarray(self.epoch * self.steps_per_epoch, jnp.int32)
        )

    def export_best_model(self, out_dir: Optional[str] = None) -> str:
        """Select the epoch with the lowest validation loss and export its
        params as ``best_model``. (The reference hardcodes ``checkpoint_19`` —
        ``src/GuideDepth/training.py:181-189``; real argmin selection here is
        a documented improvement.)"""
        from tpudepth.train.checkpoint import load_checkpoint, save_checkpoint

        out_dir = os.path.abspath(out_dir or self.config.results_dir)
        payload = None
        best_epoch = self.epoch
        if self.val_losses:
            best_epoch = int(np.argmin(self.val_losses))
            path = os.path.join(
                os.path.abspath(self.config.checkpoint_dir), f"checkpoint_{best_epoch}"
            )
            if os.path.exists(path):
                ck = load_checkpoint(path)
                payload = {
                    "params": ck["params"],
                    "batch_stats": ck["batch_stats"],
                    "best_epoch": best_epoch,
                    "val_loss": float(self.val_losses[best_epoch]),
                }
        if payload is None:  # no val history / checkpoint: use current state
            payload = {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
                "best_epoch": best_epoch,
            }
        final = os.path.join(out_dir, "best_model")
        save_checkpoint(final, payload, blocking=True)
        return final

    # -- fit --------------------------------------------------------------------

    def fit(
        self,
        epochs: Optional[int] = None,
        steps_per_epoch: int = 0,
        val_max_batches: int = 0,
        log_fn=None,
        image_log_fn=None,
        on_epoch_end=None,
        checkpoint_style: Optional[str] = None,  # None | 'per_epoch' | 'rolling'
        export_best: bool = False,
    ):
        """Full training driver: epoch loop + validation + checkpointing.

        ``on_epoch_end(epoch, train_avg, val_result, trainer)`` fires after
        validation, before the checkpoint save. CLIs hook TB logging and
        console printouts here instead of re-implementing the loop.
        """
        epochs = epochs or self.config.epochs
        if self.state is None:
            first = next(iter(self.train_loader))
            self.init_state(first["image"])
        # Barrier on in-flight async checkpoint saves BEFORE returning — on
        # the exception path too (a crash mid-epoch must not leave the last
        # force=True rolling save uncommitted): the atexit fallback runs
        # after CPython shuts down executor threads, at which point orbax's
        # commit futures can no longer be scheduled ("cannot schedule new
        # futures after shutdown").
        from tpudepth.train.checkpoint import wait_for_checkpoints

        try:
            for epoch in range(self.epoch, epochs):
                self.epoch = epoch
                self.train_loader.set_epoch(epoch)
                train_avg = self.train_epoch(log_fn, steps_cap=steps_per_epoch,
                                             image_log_fn=image_log_fn)
                val_avg = None
                if self.val_loader is not None:
                    val_avg = self.val_epoch(max_batches=val_max_batches)
                if on_epoch_end:
                    on_epoch_end(epoch, train_avg, val_avg, self)
                if checkpoint_style == "per_epoch":
                    self.save_epoch_checkpoint(epoch)
                elif checkpoint_style == "rolling":
                    self.save_rolling_checkpoint(epoch, train_avg)
            self.epoch = epochs
        finally:
            wait_for_checkpoints()
        if export_best:
            return self.export_best_model()
        return self.state


def _dtype(name: str):
    return Precision.from_str(name).compute_dtype
