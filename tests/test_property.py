"""Hypothesis property tests mirroring the reference's proptest blocks.

Reference blocks covered (file:line of /root/reference):

* wavelet roundtrip under random signals — src/wavelet.rs:676-707
  (extended: all three filters, 1D/2D/3D, odd lengths, exact-undo mode)
* color transform bijectivity + grayscale decorrelation — src/color.rs:586-608
* quantizer bound / FastQuantizer equivalence / zigzag roundtrip —
  src/quant.rs:1124-1162
* extra (no reference analog): rANS byte-stream and ALC3 word-segment
  roundtrips under arbitrary skewed alphabets.
"""

import os

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

pytestmark = pytest.mark.slow

from alice_codec_tpu.core import WaveletType
from alice_codec_tpu.ops import color, wavelet
from alice_codec_tpu.ops.quant import (
    FastQuantizer,
    Quantizer,
    from_symbols,
    to_symbols,
)
from alice_codec_tpu.ops.rans import (
    FrequencyTable,
    RansDecoder,
    RansEncoder,
)
from alice_codec_tpu.ops.rans_word import (
    decode_lut_words,
    decode_segment_words,
    encode_segment_words,
    freq_table_words,
)

# ALC_PROP_EXAMPLES trims the per-test example budget for quick local
# iteration (e.g. 5 ≈ 1/5 the wall-clock); default matches CI coverage.
_SETTINGS = dict(
    max_examples=int(os.environ.get("ALC_PROP_EXAMPLES", "25")),
    deadline=None,
)

_WAVELETS = [WaveletType.HAAR, WaveletType.CDF53, WaveletType.CDF97]


# ── wavelet (src/wavelet.rs:676-707) ────────────────────────────


@settings(**_SETTINGS)
@given(
    vals=st.lists(st.integers(-500, 500), min_size=2, max_size=32).filter(
        lambda v: len(v) % 2 == 0  # transforms require even lengths
        # (the pipeline edge-pads first, src/pipeline.rs:77-114)
    ),
    wt=st.sampled_from(_WAVELETS),
)
def test_wavelet_1d_roundtrip_random(vals, wt):
    sig = np.asarray(vals, np.int32)
    fwd = np.asarray(wavelet.forward_1d(sig, wavelet=wt))
    # compat inverse: the reference tolerates ±2 (src/wavelet.rs:688-691)
    back = np.asarray(wavelet.inverse_1d(fwd, wavelet=wt))
    assert np.abs(back - sig).max() <= 2
    # exact-undo inverse: bit-perfect (our extension)
    exact = np.asarray(wavelet.inverse_1d(fwd, wavelet=wt, exact=True))
    np.testing.assert_array_equal(exact, sig)


@settings(**_SETTINGS)
@given(
    t=st.sampled_from([2, 4]),
    h=st.sampled_from([2, 4, 6, 8]),
    w=st.sampled_from([2, 4, 6, 8]),
    wt=st.sampled_from(_WAVELETS),
    seed=st.integers(0, 2**31 - 1),
)
def test_wavelet_3d_exact_roundtrip_random(t, h, w, wt, seed):
    rng = np.random.default_rng(seed)
    vol = rng.integers(-500, 500, size=(t, h, w)).astype(np.int32)
    fwd = np.asarray(wavelet.forward_3d(vol, wt))
    exact = np.asarray(wavelet.inverse_3d(fwd, wt, exact=True))
    np.testing.assert_array_equal(exact, vol)


# ── color (src/color.rs:586-608) ────────────────────────────────


@settings(**_SETTINGS)
@given(
    rgb=st.lists(st.integers(0, 255), min_size=3, max_size=48).filter(
        lambda v: len(v) % 3 == 0
    )
)
def test_color_roundtrip_random(rgb):
    arr = np.asarray(rgb, np.uint8).reshape(1, 1, -1, 3)
    y, co, cg = color.rgb_to_ycocg_r(arr)
    back = np.asarray(color.ycocg_r_to_rgb(
        np.asarray(y), np.asarray(co), np.asarray(cg)))
    np.testing.assert_array_equal(back, arr)


@settings(**_SETTINGS)
@given(v=st.integers(0, 255))
def test_color_grayscale_decorrelates(v):
    arr = np.full((1, 1, 1, 3), v, np.uint8)
    y, co, cg = color.rgb_to_ycocg_r(arr)
    assert int(np.asarray(co)) == 0
    assert int(np.asarray(cg)) == 0
    assert int(np.asarray(y)) == v


# ── quantizer (src/quant.rs:1124-1162) ──────────────────────────


@settings(**_SETTINGS)
@given(step=st.integers(1, 128), value=st.integers(-10_000, 10_000))
def test_quantize_dequantize_bounded(step, value):
    q = Quantizer(step)
    dv = q.dequantize(q.quantize(value))
    if abs(value) < q.dead_zone:
        assert dv == 0
    else:
        assert abs(dv - value) <= q.step + q.dead_zone


@settings(**_SETTINGS)
@given(step=st.integers(1, 128), value=st.integers(-10_000, 10_000))
def test_fast_quantizer_matches_regular(step, value):
    assert Quantizer(step).quantize(value) == FastQuantizer(step).quantize(value)


@settings(**_SETTINGS)
@given(values=st.lists(st.integers(-127, 127), min_size=1, max_size=64))
def test_symbol_roundtrip(values):
    arr = np.asarray(values, np.int32)
    back = np.asarray(from_symbols(np.asarray(to_symbols(arr))))
    np.testing.assert_array_equal(back, arr)


# ── entropy coders (extension; wire-format invariants) ──────────


@st.composite
def _byte_streams(draw):
    """Skewed byte alphabets: a few heavy symbols plus noise."""
    n = draw(st.integers(1, 400))
    heavy = draw(st.integers(0, 255))
    p = draw(st.floats(0.2, 0.95))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    data = np.where(
        rng.random(n) < p, heavy, rng.integers(0, 256, size=n)
    ).astype(np.uint8)
    return data


@settings(**_SETTINGS)
@given(data=_byte_streams())
def test_rans_roundtrip_random(data):
    hist = np.bincount(data, minlength=256).astype(np.uint32)
    table = FrequencyTable.from_histogram(hist, sanitize=True)
    enc = RansEncoder()
    enc.encode_symbols(data, table)
    stream = enc.finish()
    out = RansDecoder(stream).decode_n(len(data), table)
    np.testing.assert_array_equal(np.asarray(out, np.uint8), data)


@settings(max_examples=10, deadline=None)
@given(data=_byte_streams(), seed=st.integers(0, 2**31 - 1))
def test_alc3_segment_words_roundtrip_random(data, seed):
    """ALC3 word-rANS spec roundtrip on an 8×128 segment whose content is
    drawn from the random alphabet."""
    rng = np.random.default_rng(seed)
    seg = data[rng.integers(0, len(data), size=8 * 128)].reshape(8, 128)
    hist = np.bincount(seg.reshape(-1), minlength=256).astype(np.uint32)
    # ALC3 wire tables (11-bit since v6), not the 12-bit .alc ones
    freqs, cums = freq_table_words(hist)
    words = encode_segment_words(seg, freqs, cums)
    back, cursor = decode_segment_words(
        words, len(words), 8, 128, freqs, cums, decode_lut_words(cums)
    )
    assert cursor == 0
    np.testing.assert_array_equal(back, seg)
