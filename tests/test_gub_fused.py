"""Fused Pallas GUB stage kernels (ops/pallas/gub_conv.py): the fused
execution must match the plain jnp packed path — forward in train and eval
mode, emitted batch statistics, and gradients — on the same parameters.

The fused path folds each BatchNorm-apply + ReLU (+ SE scale / + residual)
into the consuming conv kernel and each BN's batch statistics into the
producing conv kernel, so these tests cover the whole composition of
``src/GuideDepth/model/modules.py:42-100`` in packed layout. CPU runs the
kernels in interpret mode (conv_bn_act auto-detects the backend).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudepth.models.guidedepth import GuidedUpsamplingBlock
from tpudepth.ops.packed import space_to_depth
from tpudepth.ops.pallas.gub_conv import conv_bn_act


def _leafmap(tree):
    return {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_leaves_with_path(tree)
    }


@pytest.mark.parametrize("blk", [2, (4, 4)])
@pytest.mark.parametrize("train", [False, True])
def test_gub_fused_matches_plain(rng, blk, train):
    guide = jnp.asarray(rng.random((2, 16, 24, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((2, 16, 24, 16)), jnp.float32)
    gp, dp = space_to_depth(guide, blk), space_to_depth(depth, blk)
    ref_m = GuidedUpsamplingBlock(16, 16, 8, fused=False)
    fus_m = GuidedUpsamplingBlock(16, 16, 8, fused=True)
    variables = ref_m.init(jax.random.PRNGKey(0), gp, dp, train=False,
                           packed=blk)

    kw = dict(mutable=["batch_stats"]) if train else {}
    ref = ref_m.apply(variables, gp, dp, train=train, packed=blk, **kw)
    got = fus_m.apply(variables, gp, dp, train=train, packed=blk, **kw)
    if train:
        ref, ref_st = ref
        got, got_st = got
        ref_st, got_st = _leafmap(ref_st), _leafmap(got_st)
        assert set(ref_st) == set(got_st)
        for k in ref_st:
            np.testing.assert_allclose(ref_st[k], got_st[k], atol=1e-5,
                                       err_msg=k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_gub_fused_gradients_match(rng):
    blk = (4, 4)
    guide = jnp.asarray(rng.random((2, 16, 24, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((2, 16, 24, 16)), jnp.float32)
    gp, dp = space_to_depth(guide, blk), space_to_depth(depth, blk)
    ref_m = GuidedUpsamplingBlock(16, 16, 8, fused=False)
    fus_m = GuidedUpsamplingBlock(16, 16, 8, fused=True)
    variables = ref_m.init(jax.random.PRNGKey(0), gp, dp, train=False,
                           packed=blk)

    def loss_fn(m):
        def f(params, g, d):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                g, d, train=True, packed=blk, mutable=["batch_stats"])
            return jnp.mean(out * out) + 0.1 * jnp.mean(jnp.abs(out))
        return f

    gr = jax.grad(loss_fn(ref_m), argnums=(0, 1, 2))(
        variables["params"], gp, dp)
    gf = jax.grad(loss_fn(fus_m), argnums=(0, 1, 2))(
        variables["params"], gp, dp)
    fr, ff = _leafmap(gr), _leafmap(gf)
    assert set(fr) == set(ff)
    # conv-bias gradients under train-mode BN are analytically ZERO (the
    # mean subtraction cancels them), so both paths produce roundoff there:
    # compare against the GLOBAL gradient scale, not per-leaf maxima.
    gscale = max(np.max(np.abs(v)) for v in fr.values())
    for k in fr:
        d = np.max(np.abs(fr[k] - ff[k])) / gscale
        assert d < 1e-5, (k, d)


def test_conv_bn_act_op_grads(rng):
    """Single fused op (prelude+skip+stats) VJP vs jnp reference."""
    B, H, W, CIN, COUT = 2, 8, 10, 12, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.float32)
    A = jnp.asarray(rng.standard_normal((B, CIN)), jnp.float32)
    C = jnp.asarray(rng.standard_normal((B, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((COUT,)) * 0.1, jnp.float32)
    skip = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.float32)

    def ref(x, A, C, w, b, skip):
        xa = jnp.maximum(x * A[:, None, None, :] + C[:, None, None, :], 0.0)
        xa = xa + skip
        y = jax.lax.conv_general_dilated(
            xa, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        return y, jnp.sum(y, axis=(0, 1, 2)), jnp.sum(y * y, axis=(0, 1, 2))

    def fus(x, A, C, w, b, skip):
        return conv_bn_act((x,), w, b, preludes=((A, C),), skip=skip,
                           stats=True, interpret=True)

    def loss(f, *args):
        y, s, q = f(*args)
        return (jnp.sum(jnp.sin(y)) + 0.1 * jnp.sum(s * s)
                + 0.05 * jnp.sum(jnp.sqrt(jnp.abs(q))))

    gr = jax.grad(lambda *a: loss(ref, *a), argnums=tuple(range(6)))(
        x, A, C, w, b, skip)
    gf = jax.grad(lambda *a: loss(fus, *a), argnums=tuple(range(6)))(
        x, A, C, w, b, skip)
    for name, a, f in zip(["x", "A", "C", "w", "b", "skip"], gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f), atol=2e-5,
                                   rtol=1e-4, err_msg=name)


def test_conv_bn_act_two_parts(rng):
    """Multi-part input == conv of the channel concat."""
    B, H, W, C1, C2, COUT = 2, 6, 8, 8, 12, 16
    x1 = jnp.asarray(rng.standard_normal((B, H, W, C1)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, H, W, C2)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C1 + C2, COUT)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((COUT,)) * 0.1, jnp.float32)
    A1 = jnp.asarray(rng.standard_normal((B, C1)), jnp.float32)
    C1v = jnp.asarray(rng.standard_normal((B, C1)), jnp.float32)
    A2 = jnp.asarray(rng.standard_normal((B, C2)), jnp.float32)
    C2v = jnp.asarray(rng.standard_normal((B, C2)), jnp.float32)

    xa = jnp.concatenate([
        jnp.maximum(x1 * A1[:, None, None, :] + C1v[:, None, None, :], 0.0),
        jnp.maximum(x2 * A2[:, None, None, :] + C2v[:, None, None, :], 0.0),
    ], axis=-1)
    ref = jax.lax.conv_general_dilated(
        xa, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv_bn_act((x1, x2), w, b,
                      preludes=((A1, C1v), (A2, C2v)), stats=False,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
