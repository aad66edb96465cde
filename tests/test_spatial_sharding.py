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
