"""Spatial (sequence-parallel analogue) sharding: outputs must be identical
when H is sharded over the 'model' mesh axis — XLA inserts conv halo
exchanges; window attention is 7x7-local (SURVEY.md §2c)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpudepth.core.mesh import create_mesh, replicated
from tpudepth.models import build_model


@pytest.mark.parametrize("model_name", ["GuideDepth-S", "unet_interp"])
def test_spatially_sharded_forward_matches_unsharded(model_name):
    mesh = create_mesh(num_data=2, num_model=4)
    model = build_model(model_name)
    rng = np.random.default_rng(0)
    x = rng.random((2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]), train=False)
    variables = jax.device_put(variables, replicated(mesh))

    fwd = jax.jit(lambda v, im: model.apply(v, im, train=False))

    x_rep = jax.device_put(jnp.asarray(x), replicated(mesh))
    want = np.asarray(fwd(variables, x_rep))

    # batch over 'data', HEIGHT over 'model'
    x_sharded = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data", "model")))
    got = np.asarray(fwd(variables, x_sharded))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_spatially_sharded_window_attention_matches():
    """SAM stage with H sharded: windows never cross shards except via the
    XLA-handled gather, so results must match bit-for-bit-ish."""
    from tpudepth.models.sam import SAM

    mesh = create_mesh(num_data=1, num_model=4)
    stage = SAM(input_dim=8, embed_dim=32, v_dim=16, num_heads=4, use_pallas=False)
    rng = np.random.default_rng(0)
    e = rng.standard_normal((2, 28, 28, 8)).astype(np.float32)
    q = rng.standard_normal((2, 28, 28, 16)).astype(np.float32)
    variables = stage.init(jax.random.PRNGKey(0), jnp.asarray(e), jnp.asarray(q))
    variables = jax.device_put(variables, replicated(mesh))

    fwd = jax.jit(lambda v, e, q: stage.apply(v, e, q))
    want = np.asarray(fwd(variables,
                          jax.device_put(jnp.asarray(e), replicated(mesh)),
                          jax.device_put(jnp.asarray(q), replicated(mesh))))
    sh = NamedSharding(mesh, P(None, "model"))
    got = np.asarray(fwd(variables,
                         jax.device_put(jnp.asarray(e), sh),
                         jax.device_put(jnp.asarray(q), sh)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dp_x_spatial_train_step_invariance():
    """Combined DP x spatial: 3 full SGD train steps on a (2 data x 4 model)
    mesh must reproduce the single-device run (VERDICT round-1 item 6).

    This config (64x64, model=4) is exactly the one where XLA's SPMD
    partitioner MISCOMPILES pyramid-fusion backward passes (2-30x gradient
    norms, forward bit-correct; minimal repro in
    scripts/repro_spmd_grad_bug.py) — the backbone's ``despatialize`` calls
    (trace-time mesh context via ``make_train_step(mesh=...)``) drop spatial
    sharding for the deep stages, which both avoids the bug and removes
    tiny-shard halo overhead. This test is the regression guard for that.

    Tolerance rationale (measured, see round-2 notes in PERF.md): BatchNorm
    normalizes in f32 BY DESIGN (TPU-first reduction policy), and through
    train-mode BN the conv-kernel gradient is a catastrophic cancellation
    with ~3e5 noise amplification (a 1e-7 input perturbation moves stem-conv
    grad elements by 3e-2 at init). Any resharding changes BN-stat reduction
    order at f32 ulp scale, so element-wise gradient or multi-step trajectory
    equality across meshes is unattainable for ANY correct implementation.
    The valid invariants: first-step loss (pre-chaos, reduction noise only
    ~5e-6), global gradient norm (cancellation noise averages out across the
    param count), and monotone descent on both meshes."""
    import optax

    from tpudepth.train.trainer import LossRecipe, TrainState, make_train_step

    model = build_model("GuideDepth-S")
    rng = np.random.default_rng(0)
    image = rng.random((4, 64, 64, 3)).astype(np.float32)
    depth = (rng.random((4, 64, 64, 1)) * 0.9 + 0.05).astype(np.float32)
    variables = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.asarray(image[:1]), train=False))

    results = {}
    for name, (nd, nm) in {"single": (1, 1), "dp_x_spatial": (2, 4)}.items():
        mesh = create_mesh(num_data=nd, num_model=nm)
        tx = optax.sgd(1e-3)
        # fresh device copies per mesh: the train step donates its state, and
        # on the single-device mesh device_put aliases the init buffers
        params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
        params0 = jax.device_get(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=model.apply,
        )
        state = jax.device_put(state, replicated(mesh))
        sh = NamedSharding(mesh, P("data", "model"))
        img = jax.device_put(jnp.asarray(image), sh)
        dep = jax.device_put(jnp.asarray(depth), sh)
        step = make_train_step(
            model, LossRecipe(kind="alhashim", max_depth=10.0,
                              depth_scale=10.0),
            compute_dtype=jnp.float32, augment=False, mesh=mesh)
        losses = []
        for i in range(3):
            state, loss = step(state, img, dep, jax.random.PRNGKey(i))
            losses.append(float(loss))
        # mean gradient norm over the 3 steps via the cumulative sgd delta
        gnorm = np.sqrt(sum(
            float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
            for a, b in zip(jax.tree_util.tree_leaves(params0),
                            jax.tree_util.tree_leaves(
                                jax.device_get(state.params)))
        )) / (3 * 1e-3)
        results[name] = (losses, gnorm)

    (l1, n1), (l2, n2) = results["single"], results["dp_x_spatial"]
    assert abs(l1[0] - l2[0]) < 1e-5, (l1[0], l2[0])
    assert abs(n1 - n2) / n1 < 0.1, (n1, n2)
    # both meshes actually descend (a broken sharding diverges or stalls)
    assert l1[2] < l1[0] and l2[2] < l2[0], (l1, l2)


def test_spatial_input_guard():
    """min_spatial_height guards the SPMD degenerate-shard gradient bug
    (scripts/repro_spmd_grad_bug.py): reject sub-threshold heights, pass
    safe ones, no-op when the model axis is 1."""
    import pytest

    from tpudepth.core.mesh import min_spatial_height, validate_spatial_input

    assert min_spatial_height(2) == 128
    assert min_spatial_height(4) == 256
    mesh = create_mesh(num_data=2, num_model=4)
    with pytest.raises(ValueError, match="unsafe for spatial sharding"):
        validate_spatial_input(64, mesh)
    validate_spatial_input(256, mesh)
    validate_spatial_input(64, create_mesh(num_data=8, num_model=1))


def test_dp_x_spatial_attention_train_step_invariance():
    """DP x spatial TRAINING of an attention model (VERDICT r2 item 4): the
    NewCRF shifted-window decoder (``src/newcrf_layers.py:219-246``) under a
    (2 data x 2 model) mesh at the guard-safe height 128
    (core/mesh.py:min_spatial_height) must reproduce the single-device run.
    Invariants per the BN-noise rationale above: first-step loss, global
    gradient norm, and descent."""
    import optax

    from tpudepth.core.mesh import validate_spatial_input
    from tpudepth.train.trainer import LossRecipe, TrainState, make_train_step

    model = build_model("newcrf")
    rng = np.random.default_rng(0)
    image = rng.random((4, 128, 128, 3)).astype(np.float32)
    depth = (rng.random((4, 128, 128, 1)) * 0.9 + 0.05).astype(np.float32)
    variables = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.asarray(image[:1]), train=False))

    results = {}
    for name, (nd, nm) in {"single": (1, 1), "dp_x_spatial": (2, 2)}.items():
        mesh = create_mesh(num_data=nd, num_model=nm)
        validate_spatial_input(image.shape[1], mesh)
        tx = optax.sgd(1e-3)
        params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
        params0 = jax.device_get(params)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=model.apply,
        )
        state = jax.device_put(state, replicated(mesh))
        sh = NamedSharding(mesh, P("data", "model"))
        img = jax.device_put(jnp.asarray(image), sh)
        dep = jax.device_put(jnp.asarray(depth), sh)
        step = make_train_step(
            model, LossRecipe(kind="root"),
            compute_dtype=jnp.float32, augment=False, mesh=mesh)
        losses = []
        for i in range(3):
            state, loss = step(state, img, dep, jax.random.PRNGKey(i))
            losses.append(float(loss))
        gnorm = np.sqrt(sum(
            float(np.sum((np.asarray(a) - np.asarray(b)) ** 2))
            for a, b in zip(jax.tree_util.tree_leaves(params0),
                            jax.tree_util.tree_leaves(
                                jax.device_get(state.params)))
        )) / (3 * 1e-3)
        results[name] = (losses, gnorm)

    (l1, n1), (l2, n2) = results["single"], results["dp_x_spatial"]
    assert abs(l1[0] - l2[0]) < 1e-5, (l1[0], l2[0])
    assert abs(n1 - n2) / n1 < 0.1, (n1, n2)
    assert l1[2] < l1[0] and l2[2] < l2[0], (l1, l2)


@pytest.mark.slow
def test_highres_960x1280_dp_x_spatial_invariance():
    """Resolution-scaling demonstration (VERDICT r4 item 10): the spatial
    axis is the context-parallel analogue (SURVEY.md §2c), so it must hold
    at RESOLUTIONS BEYOND the reference's operating points, not just test
    shapes. 960x1280 = 2x the reference's full resolution in each dimension:
    forward AND one train-step loss must match the unsharded run on a
    (2 data x 4 model) mesh (H/device = 240 >> min_spatial_height)."""
    import optax

    from tpudepth.models.registry import init_model
    from tpudepth.train.trainer import LossRecipe, TrainState, make_train_step

    mesh = create_mesh(num_data=2, num_model=4)
    model = build_model("GuideDepth-S")
    rng = np.random.default_rng(0)
    x = rng.random((2, 960, 1280, 3)).astype(np.float32)
    y = (rng.random((2, 960, 1280, 1)) * 0.9 + 0.05).astype(np.float32)
    variables = jax.device_get(
        init_model(model, jax.random.PRNGKey(0), jnp.asarray(x[:1])))

    fwd = jax.jit(lambda v, im: model.apply(v, im, train=False))
    rep_vars = jax.device_put(variables, replicated(mesh))
    want = np.asarray(fwd(rep_vars,
                          jax.device_put(jnp.asarray(x), replicated(mesh))))
    sh = NamedSharding(mesh, P("data", "model"))
    got = np.asarray(fwd(rep_vars, jax.device_put(jnp.asarray(x), sh)))
    assert want.shape == (2, 960, 1280, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # one train step per input sharding: first-step loss equality
    losses = []
    for spec in (replicated(mesh), sh):
        tx = optax.sgd(1e-3)
        params = jax.tree_util.tree_map(jnp.asarray, variables["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=model.apply,
        )
        state = jax.device_put(state, replicated(mesh))
        step = make_train_step(
            model, LossRecipe(kind="alhashim", max_depth=10.0,
                              depth_scale=10.0),
            compute_dtype=jnp.float32, augment=False, mesh=mesh)
        _, loss = step(state, jax.device_put(jnp.asarray(x), spec),
                       jax.device_put(jnp.asarray(y), spec),
                       jax.random.PRNGKey(2))
        losses.append(float(loss))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-5, atol=1e-6)
