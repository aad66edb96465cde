"""Parity tests for image primitives against PyTorch (CPU) ground truth."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpudepth.ops.image import (
    avg_pool,
    image_gradients,
    max_pool,
    pixel_shuffle,
    reflection_pad2d,
    resize_bilinear,
    resize_nearest,
    upsample,
)


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2).contiguous()


def nhwc(t_nchw):
    return t_nchw.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((15, 20), (30, 40)), ((30, 40), (15, 20)), ((17, 22), (64, 64)), ((240, 320), (480, 640))],
)
def test_resize_bilinear_matches_torch(rng, align_corners, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    want = nhwc(
        F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=align_corners)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("scale", [0.5, 0.25, 2.0])
def test_resize_nearest_matches_torch(rng, scale):
    x = rng.standard_normal((2, 48, 64, 3), dtype=np.float32)
    want = nhwc(F.interpolate(nchw(x), scale_factor=scale, mode="nearest"))
    out_hw = (int(48 * scale), int(64 * scale))
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want)


def test_upsample_scale4_matches_torch(rng):
    x = rng.standard_normal((1, 12, 16, 1), dtype=np.float32)
    want = nhwc(F.interpolate(nchw(x), scale_factor=4, mode="bilinear", align_corners=False))
    got = np.asarray(upsample(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("r", [2, 4])
def test_pixel_shuffle_matches_torch(rng, r):
    x = rng.standard_normal((2, 5, 7, 16 * r * r), dtype=np.float32)
    want = nhwc(F.pixel_shuffle(nchw(x), r))
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    np.testing.assert_allclose(got, want)


def test_reflection_pad_matches_torch(rng):
    x = rng.standard_normal((2, 8, 9, 3), dtype=np.float32)
    want = nhwc(F.pad(nchw(x), (1, 1, 1, 1), mode="reflect"))
    got = np.asarray(reflection_pad2d(jnp.asarray(x), 1))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("k,s,p", [(3, 1, 0), (5, 2, 2), (9, 4, 4), (17, 8, 8)])
def test_avg_pool_matches_torch(rng, k, s, p):
    x = rng.standard_normal((2, 24, 32, 3), dtype=np.float32)
    want = nhwc(F.avg_pool2d(nchw(x), k, stride=s, padding=p))
    got = np.asarray(avg_pool(jnp.asarray(x), k, stride=s, padding=p))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 16, 20, 4), dtype=np.float32)
    want = nhwc(F.max_pool2d(nchw(x), 2, 2))
    got = np.asarray(max_pool(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, want)


def test_image_gradients_matches_reference_semantics(rng):
    """dx/dy forward differences with zeroed last column/row
    (src/GuideDepth/losses.py:95-115)."""
    x = rng.standard_normal((2, 6, 7, 1), dtype=np.float32)
    t = nchw(x)
    right = F.pad(t, [0, 1, 0, 0])[:, :, :, 1:]
    bottom = F.pad(t, [0, 0, 0, 1])[:, :, 1:, :]
    want_dx, want_dy = right - t, bottom - t
    want_dx[:, :, :, -1] = 0
    want_dy[:, :, -1, :] = 0
    dx, dy = image_gradients(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx), nhwc(want_dx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dy), nhwc(want_dy), atol=1e-6)


@pytest.mark.parametrize("in_hw", [(15, 20), (240, 320), (17, 23)])
def test_upsample2x_fast_path_matches_torch(rng, in_hw):
    """The shift-interleave 2x fast path must match torch bilinear exactly."""
    x = rng.standard_normal((2, *in_hw, 5), dtype=np.float32)
    out_hw = (in_hw[0] * 2, in_hw[1] * 2)
    want = nhwc(F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=False))
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nearest_strided_fast_path_matches_torch(rng):
    x = rng.standard_normal((1, 48, 64, 3), dtype=np.float32)
    for scale in (2, 4):
        want = nhwc(F.interpolate(nchw(x), scale_factor=1 / scale, mode="nearest"))
        got = np.asarray(resize_nearest(jnp.asarray(x), (48 // scale, 64 // scale)))
        np.testing.assert_allclose(got, want)
