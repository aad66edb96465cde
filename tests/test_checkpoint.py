"""Checkpoint save/load round-trips (orbax, both reference schemas)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudepth.train.checkpoint import load_checkpoint, save_checkpoint


def test_root_schema_roundtrip(tmp_path, rng):
    """Rolling global_checkpoint schema (src/train.py:147-153)."""
    payload = {
        "epoch": 7,
        "params": {"layer": {"kernel": rng.standard_normal((3, 3)).astype(np.float32)}},
        "batch_stats": {"bn": {"mean": np.zeros(3, np.float32)}},
        "opt_state": {"count": np.asarray(42)},
        "loss": 0.125,
    }
    path = str(tmp_path / "global_checkpoint")
    save_checkpoint(path, payload)
    restored = load_checkpoint(path)
    assert int(restored["epoch"]) == 7
    assert float(restored["loss"]) == 0.125
    np.testing.assert_array_equal(
        restored["params"]["layer"]["kernel"], payload["params"]["layer"]["kernel"]
    )


def test_guidedepth_schema_roundtrip(tmp_path, rng):
    """Per-epoch checkpoint_{e} schema (src/GuideDepth/training.py:166-178)."""
    payload = {
        "epoch": 3,
        "val_losses": [0.5, 0.4, 0.3],
        "params": {"w": rng.standard_normal(4).astype(np.float32)},
        "batch_stats": {},
        "opt_state": {"mu": np.ones(4, np.float32)},
    }
    path = str(tmp_path / "checkpoint_2")
    save_checkpoint(path, payload)
    restored = load_checkpoint(path)
    assert int(restored["epoch"]) == 3
    assert list(np.asarray(restored["val_losses"])) == [0.5, 0.4, 0.3]


def test_overwrite_existing(tmp_path):
    path = str(tmp_path / "ck")
    save_checkpoint(path, {"epoch": 1, "x": np.zeros(2)})
    save_checkpoint(path, {"epoch": 2, "x": np.ones(2)})
    restored = load_checkpoint(path)
    assert int(restored["epoch"]) == 2


def test_trainer_state_resume_continues_training(tmp_path, rng):
    """Save state mid-training, restore, verify identical continuation."""
    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import create_mesh, replicated
    from tpudepth.models import build_model
    from tpudepth.train.trainer import (
        LossRecipe,
        TrainState,
        make_optimizer,
        make_train_step,
    )

    mesh = create_mesh(num_data=1)
    model = build_model("unet_interp")
    image = jnp.asarray(rng.random((2, 32, 32, 3), dtype=np.float32))
    depth = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32) * 0.9 + 0.05)
    variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)
    cfg = TrainConfig(compute_dtype="float32")
    tx = make_optimizer(cfg, 10)

    def fresh_state(params, opt_state=None):
        # deep-copy: the train step donates its input state's buffers
        copy = lambda t: jax.tree_util.tree_map(lambda a: jnp.array(a), t)
        params = copy(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=copy(variables.get("batch_stats", {})),
            opt_state=copy(opt_state) if opt_state is not None else tx.init(params),
            tx=tx, apply_fn=model.apply,
        )

    step = make_train_step(model, LossRecipe("root"), jnp.float32, augment=False)
    state = fresh_state(variables["params"])
    state, _ = step(state, image, depth, jax.random.PRNGKey(0))

    path = str(tmp_path / "resume")
    save_checkpoint(path, {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
    })

    # continue original
    cont, loss_cont = step(state, image, depth, jax.random.PRNGKey(1))

    # restore and continue
    restored = load_checkpoint(path)
    state2 = fresh_state(restored["params"], _as_opt_state(tx, restored["opt_state"], variables["params"]))
    res, loss_res = step(state2, image, depth, jax.random.PRNGKey(1))
    assert abs(float(loss_cont) - float(loss_res)) < 1e-6


def _as_opt_state(tx, restored, params):
    """Rebuild the optax state structure from the restored pytree."""
    import jax

    template = tx.init(params)
    flat_template, treedef = jax.tree_util.tree_flatten(template)
    flat_restored = jax.tree_util.tree_leaves(restored)
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(r) for r in flat_restored]
    )
