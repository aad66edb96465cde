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
