"""Packed (space-to-depth) execution: exact-rearrangement guarantees.

Every packed op must equal its unpacked counterpart on the SAME parameters —
the packing is a layout change, not an approximation (tpudepth/ops/packed.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpudepth.ops.image import resize_bilinear
from tpudepth.ops.packed import (
    depth_to_space,
    pack_conv_kernel,
    packed_channel_mean,
    packed_concat,
    packed_conv,
    space_to_depth,
    tile_channel,
    upsample2x_packed,
)


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 12, 5)), jnp.float32)
    xp = space_to_depth(x, 2)
    assert xp.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(xp, 2)), np.asarray(x))


def test_space_to_depth_rect_roundtrip(rng):
    x = jnp.asarray(rng.random((2, 8, 12, 5)), jnp.float32)
    xp = space_to_depth(x, (2, 4))
    assert xp.shape == (2, 4, 3, 40)
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(xp, (2, 4))), np.asarray(x))
    # layout: packed channel index = (sy*bx + sx)*C + c
    xn = np.asarray(x)
    xpn = np.asarray(xp)
    for sy in range(2):
        for sx in range(4):
            for c in range(5):
                np.testing.assert_array_equal(
                    xpn[0, :, :, (sy * 4 + sx) * 5 + c], xn[0, sy::2, sx::4, c])


def test_space_to_depth_layout(rng):
    """Packed channel index = (sy*b+sx)*C + c."""
    x = jnp.asarray(rng.random((1, 4, 4, 3)), jnp.float32)
    xp = np.asarray(space_to_depth(x, 2))
    xn = np.asarray(x)
    for sy in range(2):
        for sx in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    xp[0, :, :, (sy * 2 + sx) * 3 + c], xn[0, sy::2, sx::2, c]
                )


@pytest.mark.parametrize("block", [2, (2, 4), (4, 2), (1, 4), (2, 1),
                                   (8, 8), (4, 8)])
@pytest.mark.parametrize("k,cin,cout", [(3, 16, 16), (1, 16, 8), (3, 3, 16)])
def test_packed_conv_matches_unpacked(rng, k, cin, cout, block):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.2, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(k // 2, k // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    got = depth_to_space(
        packed_conv(space_to_depth(x, block), w, block,
                    precision=jax.lax.Precision.HIGHEST), block
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pack_conv_kernel_shapes():
    w3 = jnp.zeros((3, 3, 16, 32))
    wp, pad = pack_conv_kernel(w3, 2)
    assert wp.shape == (3, 3, 64, 128) and pad == (1, 1)
    w1 = jnp.zeros((1, 1, 16, 8))
    wp1, pad1 = pack_conv_kernel(w1, 2)
    assert wp1.shape == (1, 1, 64, 32) and pad1 == (0, 0)
    wr, padr = pack_conv_kernel(w3, (2, 4))
    assert wr.shape == (3, 3, 128, 256) and padr == (1, 1)


def test_packed_concat_and_channel_helpers(rng):
    a = jnp.asarray(rng.random((2, 8, 8, 4)), jnp.float32)
    b = jnp.asarray(rng.random((2, 8, 8, 6)), jnp.float32)
    ref = space_to_depth(jnp.concatenate([a, b], axis=-1), 2)
    got = packed_concat([space_to_depth(a, 2), space_to_depth(b, 2)], 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    m = packed_channel_mean(space_to_depth(a, 2), 2)
    np.testing.assert_allclose(
        np.asarray(m), np.asarray(jnp.mean(a, axis=(1, 2))), atol=1e-6)

    v = jnp.arange(4.0)
    np.testing.assert_array_equal(
        np.asarray(tile_channel(v, 2)), np.tile(np.arange(4.0), 4))


def test_upsample2x_packed_matches_resize(rng):
    x = jnp.asarray(rng.random((2, 6, 10, 5)), jnp.float32)
    ref = space_to_depth(resize_bilinear(x, (12, 20), align_corners=False), 2)
    got = upsample2x_packed(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("train", [False, True])
def test_gub_packed_matches_unpacked(rng, train):
    from tpudepth.models.guidedepth import GuidedUpsamplingBlock

    gub = GuidedUpsamplingBlock(16, 16, 8)
    guide = jnp.asarray(rng.random((2, 16, 24, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((2, 16, 24, 16)), jnp.float32)
    variables = gub.init(jax.random.PRNGKey(0), guide, depth, train=False)

    kw = dict(mutable=["batch_stats"]) if train else {}
    ref = gub.apply(variables, guide, depth, train=train, **kw)
    got = gub.apply(variables, space_to_depth(guide, 2), space_to_depth(depth, 2),
                    train=train, packed=2, **kw)
    if train:
        ref, ref_stats = ref
        got, got_stats = got
        for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                        jax.tree_util.tree_leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # 3e-5: packed vs unpacked BN statistics accumulate in different orders
    # (grouped vs direct reduction) — f32 reassociation amplified by rsqrt
    np.testing.assert_allclose(
        np.asarray(depth_to_space(got, 2)), np.asarray(ref), atol=3e-5)


def test_gub_packed_param_tree_identical(rng):
    """Packing must not change the parameter tree (checkpoints/converters)."""
    from tpudepth.models.guidedepth import GuidedUpsamplingBlock

    gub = GuidedUpsamplingBlock(16, 16, 8)
    guide = jnp.zeros((1, 8, 8, 3))
    depth = jnp.zeros((1, 8, 8, 16))
    v_unpacked = gub.init(jax.random.PRNGKey(0), guide, depth, train=False)
    v_packed = gub.init(jax.random.PRNGKey(0), space_to_depth(guide, 2),
                        space_to_depth(depth, 2), train=False, packed=2)
    ref = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), v_unpacked)
    got = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), v_packed)
    assert jax.tree_util.tree_structure(ref) == jax.tree_util.tree_structure(got)
    assert jax.tree_util.tree_leaves(ref) == jax.tree_util.tree_leaves(got)


@pytest.mark.parametrize("train", [False, True])
def test_guidedepth_packed_matches_unpacked(rng, train):
    from tpudepth.models.guidedepth import GuideDepth

    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref_model = GuideDepth(packed=False)
    variables = ref_model.init(jax.random.PRNGKey(0), x, train=False)
    packed_model = GuideDepth(packed=True)

    kw = dict(mutable=["batch_stats"]) if train else {}
    ref = ref_model.apply(variables, x, train=train, **kw)
    got = packed_model.apply(variables, x, train=train, **kw)
    if train:
        ref, ref_stats = ref
        got, got_stats = got
        for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                        jax.tree_util.tree_leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_upsample2x_pack4_matches_resize(rng):
    from tpudepth.ops.packed import upsample2x_pack4

    x = jnp.asarray(rng.random((2, 6, 10, 5)), jnp.float32)
    ref = space_to_depth(resize_bilinear(x, (12, 20), align_corners=False), 4)
    got = upsample2x_pack4(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("block", [(2, 4), (4, 2), (2, 2), (4, 4),
                                   (8, 8), (4, 8), (8, 4), (2, 8)])
def test_upsample2x_pack_rect_matches_resize(rng, block):
    from tpudepth.ops.packed import upsample2x_pack

    x = jnp.asarray(rng.random((2, 8, 12, 5)), jnp.float32)
    ref = space_to_depth(
        resize_bilinear(x, (16, 24), align_corners=False), block)
    got = upsample2x_pack(x, block)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("train", [False, True])
def test_gub_packed4_matches_unpacked(rng, train):
    from tpudepth.models.guidedepth import GuidedUpsamplingBlock

    gub = GuidedUpsamplingBlock(16, 16, 8)
    guide = jnp.asarray(rng.random((2, 16, 24, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((2, 16, 24, 16)), jnp.float32)
    variables = gub.init(jax.random.PRNGKey(0), guide, depth, train=False)

    kw = dict(mutable=["batch_stats"]) if train else {}
    ref = gub.apply(variables, guide, depth, train=train, **kw)
    got = gub.apply(variables, space_to_depth(guide, 4), space_to_depth(depth, 4),
                    train=train, packed=4, **kw)
    if train:
        ref, ref_stats = ref
        got, got_stats = got
        for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                        jax.tree_util.tree_leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(got, 4)), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("blk", [(2, 4), (4, 2)])
@pytest.mark.parametrize("train", [False, True])
def test_gub_packed_rect_matches_unpacked(rng, train, blk):
    """Rectangular folds; (4,2) is the production full-res stage's."""
    from tpudepth.models.guidedepth import GuidedUpsamplingBlock

    gub = GuidedUpsamplingBlock(16, 16, 8)
    guide = jnp.asarray(rng.random((2, 16, 24, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((2, 16, 24, 16)), jnp.float32)
    variables = gub.init(jax.random.PRNGKey(0), guide, depth, train=False)

    kw = dict(mutable=["batch_stats"]) if train else {}
    ref = gub.apply(variables, guide, depth, train=train, **kw)
    got = gub.apply(variables, space_to_depth(guide, blk),
                    space_to_depth(depth, blk), train=train, packed=blk, **kw)
    if train:
        ref, ref_stats = ref
        got, got_stats = got
        for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                        jax.tree_util.tree_leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(depth_to_space(got, blk)), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize("train", [False, True])
def test_guidedepth_block4_matches_unpacked(rng, train):
    """Default production config runs the full-res stage at block=(4,4)
    (c256 @ H/4): must stay exact vs the unpacked model AND keep the param
    tree unchanged."""
    from tpudepth.models.guidedepth import GuideDepth

    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ref_model = GuideDepth(packed=False)
    variables = ref_model.init(jax.random.PRNGKey(0), x, train=False)
    packed_model = GuideDepth(packed=True)  # full-res stage -> block 4
    v2 = packed_model.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_map(lambda a: a.shape, variables)
            == jax.tree_util.tree_map(lambda a: a.shape, v2))

    kw = dict(mutable=["batch_stats"]) if train else {}
    ref = ref_model.apply(variables, x, train=train, **kw)
    got = packed_model.apply(variables, x, train=train, **kw)
    if train:
        ref, ref_stats = ref
        got, got_stats = got
        for a, b in zip(jax.tree_util.tree_leaves(ref_stats),
                        jax.tree_util.tree_leaves(got_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("blocks", [((2, 4), (4, 8), (8, 8)),
                                    ((4, 2), (8, 4), (8, 8))])
def test_guidedepth_s_packed_blocks_override_matches_unpacked(rng, blocks):
    """GuideDepth-S with explicit per-stage pack blocks (the c256-reaching
    folds for its thin stages, PERF.md round 4) must equal the unpacked
    model exactly — same params, same math."""
    from tpudepth.models import build_model

    x = jnp.asarray(rng.random((2, 96, 128, 3)), jnp.float32)
    ref = build_model("GuideDepth-S", dtype=jnp.float32, packed=False)
    v = ref.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = ref.apply(v, x, train=False)
    m = build_model("GuideDepth-S", dtype=jnp.float32, packed_blocks=blocks)
    y = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
