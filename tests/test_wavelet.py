"""Wavelet parity + roundtrip tests (reference: src/wavelet.rs tests)."""

import numpy as np
import jax.numpy as jnp
import pytest

from alice_codec_tpu.core import WaveletType
from alice_codec_tpu.ops import wavelet

import oracle

KINDS = [
    (WaveletType.HAAR, "haar"),
    (WaveletType.CDF53, "cdf53"),
    (WaveletType.CDF97, "cdf97"),
]


@pytest.mark.parametrize("wt,name", KINDS)
@pytest.mark.parametrize("n", [2, 4, 8, 16, 64, 128])
def test_forward_1d_matches_oracle(wt, name, n):
    rng = np.random.default_rng(n)
    sig = rng.integers(-512, 512, size=n).astype(np.int32)
    got = np.asarray(wavelet.forward_1d(sig, wt))
    want = oracle.wavelet_forward_1d(sig, name)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("wt,name", KINDS)
@pytest.mark.parametrize("n", [2, 4, 8, 64])
def test_inverse_1d_matches_oracle(wt, name, n):
    """Compat inverse must replay the reference's negated-coeff arithmetic."""
    rng = np.random.default_rng(n + 100)
    sig = rng.integers(-2000, 2000, size=n).astype(np.int32)
    got = np.asarray(wavelet.inverse_1d(sig, wt))
    want = oracle.wavelet_inverse_1d(sig, name)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("wt,name", KINDS)
def test_roundtrip_1d_compat_tolerance(wt, name):
    """Reference semantics: forward∘inverse within small tolerance
    (reference tests use ±1..±3, src/wavelet.rs:502,531)."""
    rng = np.random.default_rng(77)
    sig = rng.integers(0, 256, size=256).astype(np.int32)
    rec = np.asarray(wavelet.inverse_1d(wavelet.forward_1d(sig, wt), wt))
    tol = 3 if wt is WaveletType.CDF97 else 2
    assert np.abs(rec - sig).max() <= tol


@pytest.mark.parametrize("wt,_", KINDS)
def test_roundtrip_1d_exact_mode(wt, _):
    """exact=True must reconstruct perfectly for arbitrary inputs."""
    rng = np.random.default_rng(78)
    for n in (2, 4, 6, 8, 64, 256):
        sig = rng.integers(-30000, 30000, size=n).astype(np.int32)
        rec = np.asarray(wavelet.inverse_1d(wavelet.forward_1d(sig, wt), wt, exact=True))
        assert np.array_equal(rec, sig), f"n={n}"


def test_doc_example_cdf53_exact_values():
    """The reference doc test asserts this exact roundtrip (src/wavelet.rs:37-45)."""
    sig = np.array([10, 20, 30, 40, 50, 60, 70, 80], np.int32)
    w = wavelet.Wavelet1D.cdf53()
    assert np.array_equal(w.inverse(w.forward(sig)), sig)


def test_haar_roundtrip_object_api():
    """Reference's own haar test tolerates ±1 (src/wavelet.rs:500-502)."""
    sig = np.array([10, 20, 30, 40, 50, 60, 70, 80], np.int32)
    w = wavelet.Wavelet1D.haar()
    assert np.abs(w.inverse(w.forward(sig)) - sig).max() <= 1
    # exact mode reconstructs perfectly
    assert np.array_equal(w.inverse(w.forward(sig), exact=True), sig)


@pytest.mark.parametrize("wt,name", KINDS)
def test_forward_3d_matches_oracle(wt, name):
    rng = np.random.default_rng(9)
    vol = rng.integers(-512, 512, size=(4, 6, 8)).astype(np.int32)
    got = np.asarray(wavelet.forward_3d(vol, wt))
    want = oracle.wavelet_forward_3d(vol, name)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("wt,name", KINDS)
def test_inverse_3d_matches_oracle(wt, name):
    rng = np.random.default_rng(10)
    vol = rng.integers(-2000, 2000, size=(4, 4, 4)).astype(np.int32)
    got = np.asarray(wavelet.inverse_3d(vol, wt))
    want = oracle.wavelet_inverse_3d(vol, name)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("wt,_", KINDS)
def test_roundtrip_3d_exact(wt, _):
    rng = np.random.default_rng(11)
    vol = rng.integers(-511, 512, size=(8, 16, 16)).astype(np.int32)
    rec = np.asarray(wavelet.inverse_3d(wavelet.forward_3d(vol, wt), wt, exact=True))
    assert np.array_equal(rec, vol)


def test_2d_roundtrip():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(8, 8)).astype(np.int32)
    w = wavelet.Wavelet2D.cdf53()
    rec = w.inverse(w.forward(img), exact=True)
    assert np.array_equal(rec, img)


def test_batched_leading_axes():
    """Vectorization over leading axes must equal per-item transforms."""
    rng = np.random.default_rng(13)
    batch = rng.integers(-512, 512, size=(5, 32)).astype(np.int32)
    whole = np.asarray(wavelet.forward_1d(batch, WaveletType.CDF97))
    each = np.stack(
        [np.asarray(wavelet.forward_1d(batch[i], WaveletType.CDF97)) for i in range(5)]
    )
    assert np.array_equal(whole, each)


def test_short_signal_passthrough():
    sig = np.array([42], np.int32)
    assert np.array_equal(np.asarray(wavelet.forward_1d(sig, WaveletType.HAAR)), sig)


@pytest.mark.parametrize("wt,name", KINDS)
@pytest.mark.parametrize("n", [3, 7, 15])
def test_odd_length_matches_oracle(wt, name, n):
    """Odd n replicates the reference's zero-fill deinterleave quirk."""
    rng = np.random.default_rng(n + 50)
    sig = rng.integers(-500, 500, size=n).astype(np.int32)
    fwd = np.asarray(wavelet.forward_1d(sig, wt))
    assert np.array_equal(fwd, oracle.wavelet_forward_1d(sig, name))
    inv = np.asarray(wavelet.inverse_1d(fwd, wt))
    assert np.array_equal(inv, oracle.wavelet_inverse_1d(fwd, name))


def test_subband_extract_combine_roundtrip():
    from alice_codec_tpu.core import SubBand3D
    from alice_codec_tpu.ops.wavelet import combine_subbands_3d, extract_subbands_3d

    rng = np.random.default_rng(99)
    vol = rng.integers(-500, 500, size=(4, 8, 6)).astype(np.int32)
    coeffs = wavelet.forward_3d(vol, WaveletType.CDF53)
    bands = extract_subbands_3d(coeffs)
    assert set(bands) == set(SubBand3D)
    assert bands[SubBand3D.LLL].shape == (2, 4, 3)
    back = combine_subbands_3d(bands)
    assert np.array_equal(np.asarray(back), np.asarray(coeffs))
    # temporal-high bands occupy the high-T half (bit 0 = t per SubBand3D)
    assert np.array_equal(
        np.asarray(bands[SubBand3D.LLH]), np.asarray(coeffs)[2:, :4, :3]
    )


# ── interleaved layout (ALC3 fast path) ─────────────────────────


def _to_ref_3d(vol, levels):
    """Reorder an interleaved-layout volume to the reference [low|high]
    layout (recursively per level) — numpy oracle for the permutation."""
    v = np.array(vol)
    if levels == 0:
        return v
    for ax in (-1, -2, -3):
        lo = np.take(v, np.arange(0, v.shape[ax], 2), axis=ax)
        hi = np.take(v, np.arange(1, v.shape[ax], 2), axis=ax)
        v = np.concatenate([lo, hi], axis=ax)
    t, h, w = v.shape[-3:]
    v[..., : t // 2, : h // 2, : w // 2] = _to_ref_3d(
        v[..., : t // 2, : h // 2, : w // 2], levels - 1)
    return v


@pytest.mark.parametrize("wt", [WaveletType.HAAR, WaveletType.CDF53,
                                WaveletType.CDF97])
def test_inter_forward_is_permutation_of_reference_layout(wt):
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.integers(-500, 500, (2, 8, 16, 32), np.int32))
    ref = np.asarray(wavelet.forward_3d(x, wt))
    inter = np.asarray(wavelet.forward_3d_inter(x, wt))
    np.testing.assert_array_equal(_to_ref_3d(inter, 1), ref)


@pytest.mark.parametrize("levels", [1, 2, 3])
def test_inter_multi_level_matches_reference_layout(levels):
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.integers(-500, 500, (8, 16, 16), np.int32))
    ref = np.asarray(wavelet.forward_3d_multi(x, WaveletType.CDF53, levels))
    inter = np.asarray(
        wavelet.forward_3d_inter(x, WaveletType.CDF53, levels))
    np.testing.assert_array_equal(_to_ref_3d(inter, levels), ref)


@pytest.mark.parametrize("wt", [WaveletType.HAAR, WaveletType.CDF53,
                                WaveletType.CDF97])
@pytest.mark.parametrize("levels", [1, 2])
def test_inter_exact_roundtrip(wt, levels):
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.integers(-800, 800, (3, 8, 16, 16), np.int32))
    y = wavelet.forward_3d_inter(x, wt, levels)
    back = wavelet.inverse_3d_inter(y, wt, levels, exact=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_inter_compat_inverse_matches_reference_compat():
    """The ±1 compat inverse must behave identically to inverse_3d on
    the permuted coefficients (same replay arithmetic)."""
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.integers(-500, 500, (4, 8, 16), np.int32))
    wt = WaveletType.CDF97
    inter = wavelet.forward_3d_inter(x, wt)
    ref = jnp.asarray(_to_ref_3d(np.asarray(inter), 1))
    back_ref = np.asarray(wavelet.inverse_3d(ref, wt, exact=False))
    back_inter = np.asarray(
        wavelet.inverse_3d_inter(inter, wt, exact=False))
    np.testing.assert_array_equal(back_inter, back_ref)
