"""Native C++ preprocessing library vs the numpy/JAX oracle."""
import numpy as np
import pytest

from qtpu.data import native

RNG = np.random.default_rng(0)
MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)


def _numpy_quantize(images, scale, zp_signed):
    x = (images.astype(np.float32) / 255.0 - MEAN) / STD
    q = np.round(x / scale + (zp_signed + 128))
    return (np.clip(q, 0, 255) - 128).astype(np.int8)


def test_native_library_builds():
    lib = native.load_native()
    assert lib is not None, "g++ build of native/preprocess.cpp failed"
    assert lib.qtpu_native_version() == native._ABI_VERSION


def test_quantize_matches_numpy_oracle():
    imgs = RNG.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    out = native.preprocess_quantize(imgs, MEAN, STD, scale=0.02, zp_signed=5)
    ref = _numpy_quantize(imgs, 0.02, 5)
    mismatch = int((out != ref).sum())
    # std::nearbyint and np.round agree (both round-half-to-even)
    assert mismatch == 0, f"{mismatch} mismatching codes"


def test_f32_matches_numpy():
    imgs = RNG.integers(0, 256, (2, 16, 16, 3), dtype=np.uint8)
    out = native.preprocess_f32(imgs, MEAN, STD)
    ref = ((imgs.astype(np.float32) / 255.0 - MEAN) / STD).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_multithreaded_deterministic():
    imgs = RNG.integers(0, 256, (16, 64, 64, 3), dtype=np.uint8)
    a = native.preprocess_quantize(imgs, MEAN, STD, 0.02, 0, threads=1)
    b = native.preprocess_quantize(imgs, MEAN, STD, 0.02, 0, threads=8)
    np.testing.assert_array_equal(a, b)


def test_throughput_sane():
    """Native path should beat numpy comfortably on a big batch."""
    import time
    if native.load_native() is None:
        pytest.skip("no native lib")
    imgs = RNG.integers(0, 256, (64, 224, 224, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    native.preprocess_quantize(imgs, MEAN, STD, 0.02, 5)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _numpy_quantize(imgs, 0.02, 5)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)


def test_pack_batch_matches_stack(monkeypatch):
    rng = np.random.default_rng(0)
    # force_native=0 routes even tiny batches through the native gather
    # (production gates it by size — thread spawn loses below ~32 MB)
    for min_bytes in (0, 1 << 62):
        monkeypatch.setattr(native, "_PACK_NATIVE_MIN_BYTES", min_bytes)
        for dtype in (np.float32, np.uint8, np.int8):
            imgs = [rng.integers(0, 200, (17, 13, 3)).astype(dtype)
                    for _ in range(9)]
            out = native.pack_batch(imgs)
            np.testing.assert_array_equal(out, np.stack(imgs))
            # padded bucket form: tail rows zero
            out = native.pack_batch(imgs, pad_to=12)
            assert out.shape == (12, 17, 13, 3)
            np.testing.assert_array_equal(out[:9], np.stack(imgs))
            assert not out[9:].any()


def test_pack_batch_validates(monkeypatch):
    imgs = [np.zeros((4, 4, 3), np.float32), np.zeros((4, 4, 3), np.float32)]
    with pytest.raises(ValueError):
        native.pack_batch(imgs, pad_to=1)
    with pytest.raises(ValueError):
        native.pack_batch([])
    monkeypatch.setattr(native, "_PACK_NATIVE_MIN_BYTES", 0)
    for path_ok in (True, False):   # mismatched shapes raise on both paths
        with pytest.raises(ValueError):
            native.pack_batch([np.zeros((4, 4, 3), np.float32),
                               np.zeros((4, 5, 3), np.float32)])
        monkeypatch.setattr(native, "_PACK_NATIVE_MIN_BYTES", 1 << 62)


def test_pack_batch_no_silent_broadcast_or_unsafe_cast(monkeypatch):
    """np.stack semantics, not assignment semantics: a broadcastable-but-
    different shape must raise (out[i] = im would silently broadcast
    (4,4,1) across channels), and a float image must not be truncated
    into a uint8 batch."""
    for min_bytes in (0, 1 << 62):       # native and numpy paths
        monkeypatch.setattr(native, "_PACK_NATIVE_MIN_BYTES", min_bytes)
        with pytest.raises(ValueError):
            native.pack_batch([np.ones((4, 4, 3), np.float32),
                               np.full((4, 4, 1), 7.0, np.float32)])
        with pytest.raises(ValueError):  # f32 -> u8 is not same_kind
            native.pack_batch([np.zeros((4, 4, 3), np.uint8),
                               np.ones((4, 4, 3), np.float32)])
        with pytest.raises(ValueError):  # expected dtype pins the batch
            native.pack_batch([np.ones((4, 4, 3), np.float32)],
                              dtype=np.uint8)
        # same_kind casts are fine: f64 requests into an f32 batch
        out = native.pack_batch([np.full((2, 2, 1), 0.5, np.float64)],
                                dtype=np.float32, shape=(2, 2, 1))
        assert out.dtype == np.float32
        np.testing.assert_array_equal(out, np.full((1, 2, 2, 1), 0.5,
                                                   np.float32))


def test_pack_batch_noncontiguous_sources(monkeypatch):
    """Sliced/transposed inputs are copied to contiguous before the native
    gather — output must still match np.stack."""
    monkeypatch.setattr(native, "_PACK_NATIVE_MIN_BYTES", 0)
    base = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    imgs = [base[0, ::2], base[1, ::2]]          # non-contiguous views
    out = native.pack_batch(imgs)
    np.testing.assert_array_equal(out, np.stack(imgs))
