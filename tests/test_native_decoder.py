"""C++ batch decoder: build, parity with PIL, threading, fallback."""

import io

import numpy as np
import pytest

from tpudepth.data import native
from tpudepth.data.nyu import _decode


def _jpeg_bytes(arr_u8):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr_u8, "RGB").save(buf, "JPEG", quality=95)
    return buf.getvalue()


def _png_bytes(arr, mode):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, "PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native decoder unavailable (no toolchain/libs)")
    return lib


def test_probe(lib, rng):
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    assert native.probe(_jpeg_bytes(img)) == (32, 48, 3, 8)
    dep8 = (rng.random((24, 20)) * 255).astype(np.uint8)
    assert native.probe(_png_bytes(dep8, "L")) == (24, 20, 1, 8)
    dep16 = (rng.random((24, 20)) * 65535).astype(np.uint16)
    assert native.probe(_png_bytes(dep16, None)) == (24, 20, 1, 16)


def test_jpeg_batch_matches_pil(lib, rng):
    imgs = [(rng.random((32, 48, 3)) * 255).astype(np.uint8) for _ in range(5)]
    bufs = [_jpeg_bytes(a) for a in imgs]
    got = native.decode_batch(bufs, 32, 48, 3, nthreads=3)
    assert got is not None and got.shape == (5, 32, 48, 3)
    for i, b in enumerate(bufs):
        want = _decode(b)  # PIL path
        np.testing.assert_allclose(got[i], want, atol=1e-6)


def test_png8_batch_matches_pil(lib, rng):
    deps = [(rng.random((16, 20)) * 255).astype(np.uint8) for _ in range(4)]
    bufs = [_png_bytes(a, "L") for a in deps]
    got = native.decode_batch(bufs, 16, 20, 1)
    for i, b in enumerate(bufs):
        np.testing.assert_allclose(got[i], _decode(b), atol=1e-7)


def test_png16_raw_values(lib, rng):
    deps = [(rng.random((16, 20)) * 65535).astype(np.uint16) for _ in range(3)]
    bufs = [_png_bytes(a, None) for a in deps]
    got = native.decode_batch(bufs, 16, 20, 1)
    for i, a in enumerate(deps):
        # raw uint16 values, no /255 (src/data.py:135-138 semantics)
        np.testing.assert_allclose(got[i][..., 0], a.astype(np.float32), atol=0.5)


def test_mixed_formats_one_batch(lib, rng):
    """JPEG sniffing routes each item correctly in a mixed batch."""
    a = (rng.random((8, 8, 3)) * 255).astype(np.uint8)
    bufs = [_jpeg_bytes(a), _png_bytes(a, "RGB")]
    got = native.decode_batch(bufs, 8, 8, 3)
    assert got is not None
    np.testing.assert_allclose(got[1], a.astype(np.float32) / 255.0, atol=1e-6)


def test_dim_mismatch_returns_none(lib, rng):
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    assert native.decode_batch([_jpeg_bytes(img)], 16, 16, 3) is None


def test_corrupt_buffer_returns_none(lib):
    assert native.decode_batch([b"\xff\xd8\xffgarbagegarbage"], 8, 8, 3) is None


def test_dataset_uses_native_and_matches_pil(lib, tmp_path, rng):
    from tpudepth.data import NYUDepthDataset, load_zip_to_mem, make_synthetic_zip

    p = make_synthetic_zip(str(tmp_path / "z.zip"), n_train=6, n_test=2, image_hw=(32, 40))
    data, train, _ = load_zip_to_mem(p)
    ds_native = NYUDepthDataset(data, train, use_native=True)
    ds_pil = NYUDepthDataset(data, train, use_native=False)
    assert ds_native._native_shapes is not None
    bn = ds_native.get_batch(range(4))
    bp = ds_pil.get_batch(range(4))
    np.testing.assert_allclose(bn["image"], bp["image"], atol=1e-6)
    np.testing.assert_allclose(bn["depth"], bp["depth"], atol=1e-6)


@pytest.fixture(scope="module")
def synth_zip(tmp_path_factory):
    from tpudepth.data import make_synthetic_zip

    p = tmp_path_factory.mktemp("ndata") / "synth.zip"
    return make_synthetic_zip(str(p), n_train=6, n_test=2, image_hw=(48, 64))


def test_scaled_raw_decode_matches_box_average(synth_zip):
    """scale_denom=2: PNG depth must equal the exact 2x2 integer box average;
    JPEG rgb decodes via DCT scaling (different filter — assert close to the
    box average of the full decode, not equal)."""
    from tpudepth.data import native
    from tpudepth.data.nyu import NYUDepthDataset, _box_down, load_zip_to_mem

    if native.get_lib() is None:
        pytest.skip("native decoder unavailable")
    data, train, _ = load_zip_to_mem(synth_zip)
    full = NYUDepthDataset(data, train, raw=True, background_fill=False)
    (ih, iw, ic), (dh, dw, dc) = full._native_shapes
    assert ih % 2 == 0 and iw % 2 == 0
    half = NYUDepthDataset(data, train, raw=True, background_fill=False,
                           decode_hw=(ih // 2, iw // 2))
    assert half._scale == 2

    b_full = full.get_batch_raw(range(3))
    b_half = half.get_batch_raw(range(3))
    assert b_half["image"].shape == (3, ih // 2, iw // 2, ic)
    assert b_half["depth"].shape == (3, dh // 2, dw // 2, dc)
    for j in range(3):
        want_dep = _box_down(b_full["depth"][j], 2)
        np.testing.assert_array_equal(b_half["depth"][j], want_dep)
        want_img = _box_down(b_full["image"][j], 2).astype(np.int32)
        got_img = b_half["image"][j].astype(np.int32)
        # DCT-domain 1/2 decode vs box filter: close but not identical
        assert np.mean(np.abs(got_img - want_img)) < 6.0


def test_background_fill_populates_cache(synth_zip):
    import time

    from tpudepth.data.nyu import NYUDepthDataset, load_zip_to_mem

    data, train, _ = load_zip_to_mem(synth_zip)
    ds = NYUDepthDataset(data, train, raw=True, cache_decoded=True,
                         background_fill=True)
    deadline = time.time() + 30
    while time.time() < deadline:
        if ds._cache is not None and len(ds._cache) == len(ds.pairs):
            break
        time.sleep(0.2)
    assert ds._cache is not None and len(ds._cache) == len(ds.pairs)
