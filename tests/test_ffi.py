"""C ABI shim tests (reference: src/ffi.rs tests — 20-function surface)."""

import ctypes

import numpy as np
import pytest

from alice_codec_tpu.ffi import get_ffi_lib

# Not marked slow: the shim build is cached (~5 s cold, <1 s warm) and
# the fixture skips when no compiler is available, so the whole
# 20-function C ABI surface runs in every fast-profile invocation.


@pytest.fixture(scope="module")
def lib():
    lib = get_ffi_lib()
    if lib is None:
        pytest.skip("C ABI shim unavailable (no compiler or libpython)")
    return lib


def _i32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def test_version_roundtrip(lib):
    v = lib.alice_codec_version()
    assert ctypes.string_at(v).decode() == "0.1.2"
    lib.alice_codec_string_free(ctypes.cast(v, ctypes.c_char_p))


@pytest.mark.parametrize("ctor", ["haar", "cdf53", "cdf97"])
def test_wavelet_matches_library(ctor, lib):
    """FFI wavelet must equal the JAX implementation bit-for-bit."""
    from alice_codec_tpu.core import WaveletType
    from alice_codec_tpu.ops import wavelet as jw

    w = getattr(lib, f"alice_codec_wavelet1d_{ctor}")()
    assert w
    rng = np.random.default_rng(1)
    sig = rng.integers(-1000, 1000, 64).astype(np.int32)
    ffi_out = sig.copy()
    lib.alice_codec_wavelet1d_forward(w, _i32p(ffi_out), 64)
    wt = {"haar": WaveletType.HAAR, "cdf53": WaveletType.CDF53,
          "cdf97": WaveletType.CDF97}[ctor]
    jax_out = np.asarray(jw.forward_1d(sig, wt))
    assert np.array_equal(ffi_out, jax_out)
    lib.alice_codec_wavelet1d_inverse(w, _i32p(ffi_out), 64)
    jax_inv = np.asarray(jw.inverse_1d(jax_out, wt))
    assert np.array_equal(ffi_out, jax_inv)
    lib.alice_codec_wavelet1d_destroy(w)


def test_null_safety(lib):
    lib.alice_codec_wavelet1d_destroy(None)
    lib.alice_codec_encoder_destroy(None)
    lib.alice_codec_chunk_destroy(None)
    lib.alice_codec_wavelet1d_forward(None, None, 0)
    assert lib.alice_codec_chunk_width(None) == 0
    assert lib.alice_codec_psnr(None, None, 4) == -1.0
    out_len = ctypes.c_uint32(0)
    assert not lib.alice_codec_decode(None, ctypes.byref(out_len))


def test_encode_decode_via_ffi(lib):
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, 8 * 8 * 2 * 3, dtype=np.uint8)
    enc = lib.alice_codec_encoder_create(90)
    chunk = lib.alice_codec_encode(enc, _u8p(rgb), rgb.size, 8, 8, 2)
    assert chunk
    assert lib.alice_codec_chunk_width(chunk) == 8
    assert lib.alice_codec_chunk_height(chunk) == 8
    assert lib.alice_codec_chunk_frames(chunk) == 2

    # serialize → deserialize
    out_len = ctypes.c_uint32(0)
    data_ptr = lib.alice_codec_chunk_to_bytes(chunk, ctypes.byref(out_len))
    assert data_ptr and out_len.value > 18 + 3 * 1040
    data = np.ctypeslib.as_array(data_ptr, (out_len.value,)).copy()
    lib.alice_codec_data_free(data_ptr, out_len.value)

    chunk2 = lib.alice_codec_chunk_from_bytes(_u8p(data), data.size)
    assert chunk2

    # decode + PSNR through the FFI
    dec_len = ctypes.c_uint32(0)
    dec_ptr = lib.alice_codec_decode(chunk2, ctypes.byref(dec_len))
    assert dec_ptr and dec_len.value == rgb.size
    decoded = np.ctypeslib.as_array(dec_ptr, (dec_len.value,)).copy()
    psnr = lib.alice_codec_psnr(_u8p(rgb), _u8p(decoded), rgb.size)
    assert psnr > 10.0
    lib.alice_codec_data_free(dec_ptr, dec_len.value)

    # cross-check against the Python pipeline
    from alice_codec_tpu.pipeline import EncodedChunk, FrameDecoder

    py_decoded = FrameDecoder().decode(EncodedChunk.from_bytes(data.tobytes()))
    assert np.array_equal(decoded, py_decoded)

    lib.alice_codec_chunk_destroy(chunk)
    lib.alice_codec_chunk_destroy(chunk2)
    lib.alice_codec_encoder_destroy(enc)


def test_encode_invalid_returns_null(lib):
    enc = lib.alice_codec_encoder_create(90)
    rgb = np.zeros(10, np.uint8)
    chunk = lib.alice_codec_encode(enc, _u8p(rgb), 10, 8, 8, 2)  # wrong size
    assert not chunk
    bad = np.zeros(4, np.uint8)
    assert not lib.alice_codec_chunk_from_bytes(_u8p(bad), 4)
    lib.alice_codec_encoder_destroy(enc)


def test_ffi_surface_is_20_functions(lib):
    names = [
        "alice_codec_wavelet1d_haar", "alice_codec_wavelet1d_cdf53",
        "alice_codec_wavelet1d_cdf97", "alice_codec_wavelet1d_destroy",
        "alice_codec_wavelet1d_forward", "alice_codec_wavelet1d_inverse",
        "alice_codec_encoder_create", "alice_codec_encoder_destroy",
        "alice_codec_encode", "alice_codec_decode",
        "alice_codec_chunk_destroy", "alice_codec_chunk_to_bytes",
        "alice_codec_chunk_from_bytes", "alice_codec_chunk_width",
        "alice_codec_chunk_height", "alice_codec_chunk_frames",
        "alice_codec_psnr", "alice_codec_data_free",
        "alice_codec_string_free", "alice_codec_version",
    ]
    assert len(names) == 20
    for n in names:
        assert hasattr(lib, n), f"missing FFI symbol {n}"
