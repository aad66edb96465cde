#!/usr/bin/env python
"""Minimal-repro hunt for the XLA:TPU fused-path gradient NaN (PERF.md r3).

Symptom (round 3): with the hybrid fused GUB stage (k=3 convs as Pallas
custom calls emitting BN stats, k=1 convs as jnp dots with jnp BN-apply
preludes, TPUDEPTH_GUB=fused), bench.py's program — a lax.scan of train
steps whose ONLY output is the per-step loss — yields a finite step-1 loss
but NaN gradients, while the same math with a grad-norm also returned
is finite and correct (observer effect). Same class as the SPMD
degenerate-shard gradient bug: XLA:TPU fusion decisions corrupting the
backward while the forward stays right.

Each case strips more context; run on the real chip:
  TPUDEPTH_GUB=fused python scripts/repro_grad_nan_fusion.py case1 case2 ...

case1  full GuideDepth fused, bench-shaped scan (losses only)   [expect NaN]
case1g same + grad-norm in the scan outputs                     [expect finite]
case2  single packed GUB stage (c16@480x640 -> block-4), scan, loss only
case2g case2 + grad-norm output
case3  case2 without scan (single step, loss only)
case4  case2 with SGD instead of Adam
case5  case2 without donated state
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("TPUDEPTH_GUB", "fused")

from tpudepth.core.runtime import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np
import optax


def report(name, losses, gns=None):
    l = np.asarray(losses, np.float32)
    msg = f"{name}: losses={l}"
    ok = np.isfinite(l).all()
    if gns is not None:
        g = np.asarray(gns, np.float32)
        msg += f" gnorm2={g}"
        ok = ok and np.isfinite(g).all()
    print(msg, "=>", "FINITE" if ok else "NON-FINITE", flush=True)


def full_model(with_gnorm: bool, loss_kind: str = "alhashim",
               augment: bool = True, opt: str = "adam", label: str = None):
    from tpudepth.core.config import TrainConfig
    from tpudepth.core.mesh import batch_sharding, create_mesh, replicated
    from tpudepth.data.augment import augment_batch
    from tpudepth.models import build_model
    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import LossRecipe, TrainState, make_optimizer

    bs, h, w = 16, 480, 640
    mesh = create_mesh()
    model = build_model("GuideDepth", dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    image = rng.random((bs, h, w, 3)).astype(np.float32)
    depth = (rng.random((bs, h, w, 1)) * 0.9 + 0.05).astype(np.float32)
    variables = init_model(model, jax.random.PRNGKey(0), jnp.asarray(image[:1]))
    import optax as _optax

    tx = (make_optimizer(TrainConfig(model="GuideDepth"), steps_per_epoch=100)
          if opt == "adam" else _optax.sgd(1e-3))
    state0 = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), tx=tx, apply_fn=model.apply)
    state0 = jax.device_put(state0, replicated(mesh))
    sharding = batch_sharding(mesh)
    img = jax.device_put(jnp.asarray(image), sharding)
    dep = jax.device_put(jnp.asarray(depth), sharding)
    recipe = LossRecipe(kind="alhashim", max_depth=10.0, depth_scale=10.0)

    def one_step(state, key):
        if augment:
            im, de = augment_batch(key, img, dep)
        else:
            im, de = img, dep
        target = recipe.target(de.astype(jnp.float32))

        def loss_fn(params):
            v = {"params": params, "batch_stats": state.batch_stats}
            pred, mut = model.apply(v, im.astype(jnp.bfloat16), train=True,
                                    mutable=["batch_stats"])
            pred = pred.astype(jnp.float32)
            if loss_kind == "mse":  # no fused-loss pallas kernel in the graph
                return jnp.mean(jnp.square(pred - target)), mut["batch_stats"]
            return recipe.loss(pred, target), mut["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        gn = None
        if with_gnorm:
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree_util.tree_leaves(grads))
        return state.apply_gradients(grads=grads, new_batch_stats=stats), loss, gn

    @functools.partial(jax.jit, static_argnames="k")
    def run_k(state, key, k):
        def body(carry, _):
            st, ky = carry
            ky, sub = jax.random.split(ky)
            st, loss, gn = one_step(st, sub)
            out = (loss, gn) if with_gnorm else loss
            return (st, ky), out

        (state, _), outs = jax.lax.scan(body, (state, key), None, length=k)
        return outs

    outs = run_k(state0, jax.random.PRNGKey(0), 12)
    name = label or ("case1g" if with_gnorm else "case1")
    if with_gnorm:
        report(name, outs[0], outs[1])
    else:
        report(name, outs)


def single_stage(with_gnorm: bool, scan: bool = True, opt: str = "adam",
                 donate: bool = True, label: str = "case2"):
    """One packed block-4 GUB stage on the fused path, bench-shaped."""
    from tpudepth.models.guidedepth import GuidedUpsamplingBlock
    from tpudepth.ops.packed import space_to_depth, upsample2x_pack

    # mirror the full model's FULL-RES stage exactly: GUB(16, 16, 1) on a
    # c16 depth state at half-res, packed block-4 to c256@120x160
    # (models/guidedepth.py stage i=2 — the stage the hybrid path owns)
    bs, h, w, cin = 16, 480, 640, 16
    blk = (4, 4)
    gub = GuidedUpsamplingBlock(cin, cin, 1, dtype=jnp.bfloat16, fused=True)
    rng = np.random.default_rng(0)
    guide = jnp.asarray(rng.random((bs, h, w, 3)), np.float32)
    feat = jnp.asarray(rng.random((bs, h // 2, w // 2, cin)), np.float32)
    gp = jax.jit(lambda g: space_to_depth(g.astype(jnp.bfloat16), blk))(guide)
    variables = jax.jit(
        lambda g, f: gub.init(jax.random.PRNGKey(0), g,
                              upsample2x_pack(f, blk), train=True,
                              packed=blk))(gp, feat.astype(jnp.bfloat16))
    params0 = variables["params"]
    stats0 = variables.get("batch_stats", {})
    tx = optax.adam(1e-4) if opt == "adam" else optax.sgd(1e-3)
    opt0 = tx.init(params0)

    # big tensors must be ARGUMENTS: closed-over arrays get embedded into the
    # uploaded program and trip the remote compile helper's size limit
    # (HTTP 413 at 157 MB of packed-guide constants)
    def one_step(params, stats, opt_state, key, gp_a, feat_a):
        noise = jax.random.uniform(key, feat_a.shape, jnp.bfloat16, 0.99, 1.01)

        def loss_fn(p):
            fp = upsample2x_pack(feat_a.astype(jnp.bfloat16) * noise, blk)
            out, mut = gub.apply({"params": p, "batch_stats": stats}, gp_a, fp,
                                 train=True, packed=blk,
                                 mutable=["batch_stats"])
            return jnp.mean(jnp.square(out.astype(jnp.float32))), mut["batch_stats"]

        (loss, nstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, nopt = tx.update(grads, opt_state, params)
        nparams = optax.apply_updates(params, upd)
        gn = None
        if with_gnorm:
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree_util.tree_leaves(grads))
        return nparams, nstats, nopt, loss, gn

    if scan:
        @functools.partial(jax.jit, static_argnames="k",
                           donate_argnums=(0, 1, 2) if donate else ())
        def run_k(params, stats, opt_state, key, gp_a, feat_a, k):
            def body(carry, _):
                p, s, o, ky = carry
                ky, sub = jax.random.split(ky)
                p, s, o, loss, gn = one_step(p, s, o, sub, gp_a, feat_a)
                return (p, s, o, ky), ((loss, gn) if with_gnorm else loss)

            _, outs = jax.lax.scan(body, (params, stats, opt_state, key),
                                   None, length=k)
            return outs

        outs = run_k(params0, stats0, opt0, jax.random.PRNGKey(0), gp,
                     feat.astype(jnp.bfloat16), 12)
    else:
        step = jax.jit(one_step, donate_argnums=(0, 1, 2) if donate else ())
        *_, loss, gn = step(params0, stats0, opt0, jax.random.PRNGKey(0),
                            gp, feat.astype(jnp.bfloat16))
        outs = ([loss], [gn]) if with_gnorm else [loss]
    if with_gnorm:
        report(label, outs[0], outs[1])
    else:
        report(label, outs)


def stage_chain(stages, with_backbone: bool = False, label: str = "chain",
                k: int = 12, h: int = 480, w: int = 640, bs: int = 16,
                with_gnorm: bool = False, scan: bool = True, opt: str = "adam",
                tiny_backbone: bool = False):
    """Chain GUB stages exactly as GuideDepth does (upsample2x_pack /
    space_to_depth / depth_to_space between), optionally fed by the DDRNet
    backbone (or a 3-conv strided stand-in, ``tiny_backbone``), MSE loss,
    adam, bench-shaped scan (losses only).

    ``stages``: sequence of (in_feat, out_feat, guide_scale, blk[, fused])
    where guide_scale is the divisor of (h, w) for that stage's guide and blk
    is the pack block ((by,bx)) or None for the plain unpacked path; fused
    (default True) selects the Pallas fused-stage path per stage.
    """
    import flax.linen as nn

    from tpudepth.models.guidedepth import GuidedUpsamplingBlock
    from tpudepth.models.layers import BatchNorm
    from tpudepth.ops.image import resize_bilinear, resize_nearest
    from tpudepth.ops.packed import (
        depth_to_space,
        space_to_depth,
        upsample2x_pack,
    )

    # the tiny stand-in must leave feat at the same place the DDRNet
    # backbone does: stages[0][0] channels at (h, w) / (2 * stages[0][2])
    n_down = {8: 3, 4: 2, 2: 1}[2 * stages[0][2]]

    class TinyBackbone(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            for i in range(n_down):
                x = nn.Conv(stages[0][0], (3, 3), strides=(2, 2),
                            use_bias=False, dtype=jnp.bfloat16,
                            name=f"conv{i}")(x)
                x = BatchNorm(dtype=jnp.bfloat16, name=f"bn{i}")(x, train)
                x = nn.relu(x)
            return x

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x, feat, train: bool = False):
            y = feat
            if tiny_backbone:
                y = TinyBackbone(name="feature_extractor")(
                    x.astype(jnp.bfloat16), train)
            elif with_backbone:
                from tpudepth.models.ddrnet import DualResNetBackbone
                y = DualResNetBackbone(features=stages[0][0],
                                       dtype=jnp.bfloat16,
                                       name="feature_extractor")(x, train)
            for i, st in enumerate(stages):
                cin, cout, scale, blk = st[:4]
                fused = st[4] if len(st) > 4 else True
                guide = (x if scale == 1
                         else resize_nearest(x, (h // scale, w // scale)))
                gub = GuidedUpsamplingBlock(cin, cin, cout,
                                            dtype=jnp.bfloat16, fused=fused,
                                            name=f"up_{i + 1}")
                if blk is not None:
                    y = upsample2x_pack(y, blk)
                    y = gub(space_to_depth(guide, blk), y, train, blk)
                    y = depth_to_space(y, blk)
                else:
                    y = resize_bilinear(
                        y, (y.shape[1] * 2, y.shape[2] * 2),
                        align_corners=False)
                    y = gub(guide, y, train, 0)
            return y

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((bs, h, w, 3)), np.float32)
    s0 = stages[0]
    fh, fw = h // (2 * s0[2]), w // (2 * s0[2])
    feat = jnp.asarray(rng.random((bs, fh, fw, s0[0])), np.float32)
    model = Chain()
    variables = jax.jit(
        lambda a, b: model.init(jax.random.PRNGKey(0), a, b, train=True)
    )(image.astype(jnp.bfloat16), feat.astype(jnp.bfloat16))
    params0, stats0 = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(1e-4) if opt == "adam" else optax.sgd(1e-3)
    opt0 = tx.init(params0)

    def one_step(params, stats, opt_state, key, img_a, feat_a):
        noise = jax.random.uniform(key, feat_a.shape, jnp.bfloat16, 0.99, 1.01)

        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": stats},
                img_a.astype(jnp.bfloat16),
                feat_a.astype(jnp.bfloat16) * noise, train=True,
                mutable=["batch_stats"])
            out, mut = out
            return (jnp.mean(jnp.square(out.astype(jnp.float32))),
                    mut["batch_stats"])

        (loss, nstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, nopt = tx.update(grads, opt_state, params)
        gn = None
        if with_gnorm:
            gn = sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                     for g in jax.tree_util.tree_leaves(grads))
        return optax.apply_updates(params, upd), nstats, nopt, loss, gn

    if scan:
        @functools.partial(jax.jit, static_argnames="k",
                           donate_argnums=(0, 1, 2))
        def run_k(params, stats, opt_state, key, img_a, feat_a, k):
            def body(carry, _):
                p, s, o, ky = carry
                ky, sub = jax.random.split(ky)
                p, s, o, loss, gn = one_step(p, s, o, sub, img_a, feat_a)
                return (p, s, o, ky), ((loss, gn) if with_gnorm else loss)

            _, outs = jax.lax.scan(body, (params, stats, opt_state, key),
                                   None, length=k)
            return outs

        outs = run_k(params0, stats0, opt0, jax.random.PRNGKey(0), image,
                     feat.astype(jnp.bfloat16), k)
    else:
        step = jax.jit(one_step, donate_argnums=(0, 1, 2))
        *_, loss, gn = step(params0, stats0, opt0, jax.random.PRNGKey(0),
                            image, feat.astype(jnp.bfloat16))
        outs = ([loss], [gn]) if with_gnorm else [loss]
    if with_gnorm:
        report(label, outs[0], outs[1])
    else:
        report(label, outs)


# GuideDepth's real stage shapes: stage0 plain c64@quarter, stage1 fused
# (2,2)@half c32, stage2 fused (4,4)@full c16 (models/guidedepth.py:369-396)
S0 = (64, 32, 4, None)
S1 = (32, 16, 2, (2, 2))
S2 = (16, 1, 1, (4, 4))

CASES = {
    "case1": lambda: full_model(False),
    "case1g": lambda: full_model(True),
    "case2": lambda: single_stage(False),
    "case2g": lambda: single_stage(True, label="case2g"),
    "case3": lambda: single_stage(False, scan=False, label="case3"),
    "case4": lambda: single_stage(False, opt="sgd", label="case4"),
    "case5": lambda: single_stage(False, donate=False, label="case5"),
    # full model with simplified surroundings (bisecting case1 vs case2)
    "case6": lambda: full_model(False, loss_kind="mse", label="case6-mse"),
    "case7": lambda: full_model(False, augment=False, label="case7-noaug"),
    "case8": lambda: full_model(False, opt="sgd", label="case8-sgd"),
    # structural bisection: which sub-chain of the model reproduces it?
    "case9": lambda: stage_chain([S1, S2], label="case9-s1s2"),
    "case10": lambda: stage_chain([S0, S1, S2], label="case10-s0s1s2"),
    "case11": lambda: stage_chain([S2], label="case11-s2only"),
    "case12": lambda: stage_chain([S0, S1, S2], with_backbone=True,
                                  label="case12-bb+stages"),
    # round-4 bisection INSIDE case12 (the minimal NON-FINITE context:
    # backbone + stages, MSE, adam, scan, losses-only)
    "case13": lambda: stage_chain([S0, S1, S2], with_backbone=True,
                                  with_gnorm=True, label="case13-bb+gnorm"),
    "case14": lambda: stage_chain([S0, S1, S2], with_backbone=True,
                                  scan=False, label="case14-bb-noscan"),
    "case15": lambda: stage_chain([S0, S1, S2], with_backbone=True,
                                  opt="sgd", label="case15-bb-sgd"),
    "case16": lambda: stage_chain([S0, S1, S2], with_backbone=True,
                                  h=240, w=320, bs=8,
                                  label="case16-bb-240x320"),
    # which fused stage is load-bearing? (S0 is always the plain path)
    "case17": lambda: stage_chain(
        [S0, S1 + (False,), S2], with_backbone=True,
        label="case17-bb-onlyS2fused"),
    "case18": lambda: stage_chain(
        [S0, S1, S2 + (False,)], with_backbone=True,
        label="case18-bb-onlyS1fused"),
    # control: NO fused stages at all under the backbone (the default
    # XLA-conv path bench.py runs) — expect FINITE
    "case19": lambda: stage_chain(
        [S0, S1 + (False,), S2 + (False,)], with_backbone=True,
        label="case19-bb-nofused"),
    # how many scan steps does it need?
    "case20": lambda: stage_chain([S0, S1, S2], with_backbone=True, k=2,
                                  label="case20-bb-k2"),
    # round-4 final minimization: combine the minimal axes found above
    # (only S2 fused, k=2, sgd) and shrink the backbone
    "case21": lambda: stage_chain(
        [S0, S1 + (False,), S2], with_backbone=True, k=2, opt="sgd",
        label="case21-bb-onlyS2-k2-sgd"),
    # DDRNet replaced by 3 strided conv+BN+relu: if this still fails the
    # repro no longer needs any tpudepth model code upstream of the stage
    "case22": lambda: stage_chain(
        [S0, S1 + (False,), S2], tiny_backbone=True, k=2, opt="sgd",
        label="case22-tinybb-onlyS2-k2-sgd"),
    # smallest conceivable: 1 strided conv+BN+relu feeding the single fused
    # full-res stage directly (no S0/S1 at all)
    "case23": lambda: stage_chain(
        [S2], tiny_backbone=True, k=2, opt="sgd",
        label="case23-tinybb-S2only-k2-sgd"),
}

if __name__ == "__main__":
    for name in (sys.argv[1:] or ["case1", "case1g", "case2"]):
        CASES[name]()
