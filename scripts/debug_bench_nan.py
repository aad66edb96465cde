#!/usr/bin/env python
"""Bisect the non-finite bench loss on the k1-jnp hybrid fused path:
run the bench's exact step at bs=16, k steps of scan, report loss per k."""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tpudepth.core.runtime import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from tpudepth.core.config import TrainConfig
from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
from tpudepth.data.augment import augment_batch
from tpudepth.models import build_model
from tpudepth.models.registry import init_model
from tpudepth.train.trainer import LossRecipe, TrainState, make_optimizer

bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ks = [int(v) for v in (sys.argv[2:] or ["1", "2", "4"])]
h, w = 480, 640

mesh = create_mesh()
model = build_model("GuideDepth", dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
image = rng.random((bs, h, w, 3)).astype(np.float32)
depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)

variables = init_model(model, jax.random.PRNGKey(0), jnp.asarray(image[:1]))
cfg = TrainConfig(model="GuideDepth")
tx = make_optimizer(cfg, steps_per_epoch=100)
state0 = TrainState(
    step=jnp.zeros((), jnp.int32),
    params=variables["params"],
    batch_stats=variables.get("batch_stats", {}),
    opt_state=tx.init(variables["params"]),
    tx=tx,
    apply_fn=model.apply,
)
state0 = jax.device_put(state0, replicated(mesh))
sharding = batch_sharding(mesh)
img = jax.device_put(jnp.asarray(image), sharding)
dep = jax.device_put(jnp.asarray(depth), sharding)
recipe = LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0)


def one_step(state, key):
    im, de = augment_batch(key, img, dep)
    target = recipe.target(de.astype(jnp.float32))

    def loss_fn(params):
        v = {"params": params, "batch_stats": state.batch_stats}
        pred, mut = model.apply(
            v, im.astype(jnp.bfloat16), train=True, mutable=["batch_stats"]
        )
        return recipe.loss(pred.astype(jnp.float32), target), mut["batch_stats"]

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree_util.tree_map(lambda g: jnp.sum(jnp.square(g.astype(jnp.float32))), grads),
    )
    return state.apply_gradients(grads=grads, new_batch_stats=stats), loss, gnorm


@functools.partial(jax.jit, static_argnames="k")
def run_k(state, key, k):
    def body(carry, _):
        st, ky = carry
        ky, sub = jax.random.split(ky)
        st, loss, gn = one_step(st, sub)
        return (st, ky), (loss, gn)

    (state, _), (losses, gns) = jax.lax.scan(body, (state, key), None, length=k)
    return state, losses, gns


key = jax.random.PRNGKey(0)
for k in ks:
    _, losses, gns = run_k(state0, key, k)
    print(f"k={k} losses={np.asarray(losses)} gnorm2={np.asarray(gns)}",
          flush=True)
