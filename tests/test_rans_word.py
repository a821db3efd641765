"""ALC3 word-rANS spec tests (ops/rans_word.py).

ALC3 is a new TPU-native wire format (no reference counterpart): the tests
check internal consistency — roundtrip over adversarial content, the
final-state invariant, segment independence, and the capacity bound.
"""

import numpy as np
import pytest

from alice_codec_tpu.ops.rans_word import (
    PROB_SCALE,
    WordTable,
    WORD_L,
    decode_channel_words,
    decode_segment_words,
    encode_channel_words,
    encode_segment_words,
    segment_capacity_words,
)


def _table(symbols: np.ndarray) -> WordTable:
    hist = np.bincount(symbols.reshape(-1), minlength=256).astype(np.uint32)
    return WordTable.from_histogram(hist)


def _contents():
    rng = np.random.default_rng(7)
    return {
        "uniform-noise": rng.integers(0, 256, size=4096, dtype=np.uint8),
        "skewed": rng.choice(
            np.arange(8, dtype=np.uint8), size=4096, p=[0.8, 0.1, 0.04, 0.03, 0.01, 0.01, 0.005, 0.005]
        ).astype(np.uint8),
        "constant": np.zeros(4096, np.uint8),
        "two-valued": np.tile(np.array([0, 255], np.uint8), 2048),
        "ramp": (np.arange(4096) % 256).astype(np.uint8),
    }


@pytest.mark.parametrize("name", list(_contents()))
@pytest.mark.parametrize("s_seg,ng", [(16, 8), (64, 16), (8, 64)])
def test_segment_roundtrip(name, s_seg, ng):
    syms = _contents()[name][: s_seg * ng].reshape(s_seg, ng)
    t = _table(syms)
    stream = encode_segment_words(syms, t.freqs, t.cums)
    assert stream.shape[0] <= segment_capacity_words(s_seg, ng)
    out, cursor = decode_segment_words(
        stream, stream.shape[0], s_seg, ng, t.freqs, t.cums, t.cum_to_sym
    )
    assert cursor == 0  # final-state invariant: every refill word consumed
    np.testing.assert_array_equal(out, syms)


def test_decoder_states_return_to_l():
    syms = _contents()["skewed"][:512].reshape(64, 8)
    t = _table(syms)
    stream = encode_segment_words(syms, t.freqs, t.cums)
    # manual tail check: replay decode and verify states end at WORD_L
    n_emit = stream.shape[0] - 16
    x = (stream[n_emit : n_emit + 8].astype(np.uint32) << 16) | stream[n_emit + 8 :]
    assert np.all(x >= WORD_L)  # normalized interval on entry
    out, cursor = decode_segment_words(
        stream, stream.shape[0], 64, 8, t.freqs, t.cums, t.cum_to_sym
    )
    assert cursor == 0


@pytest.mark.parametrize("n", [0, 1, 100, 4096, 5000])
def test_channel_roundtrip_with_padding(n):
    rng = np.random.default_rng(n)
    syms = rng.integers(0, 200, size=n, dtype=np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    # wire v7: padding zeros coded in non-elided segments must keep mass
    # in bin 0 (zero-frequency absent symbols — see encode_channel_words)
    seg = 32 * 16
    hist[0] += (-(-n // seg) * seg - n) if n else 0
    t = WordTable.from_histogram(hist)
    payload, counts = encode_channel_words(syms, t.freqs, t.cums, s_seg=32, ng=16)
    out = decode_channel_words(
        payload, counts, n, s_seg=32, ng=16,
        freqs=t.freqs, cums=t.cums, cum_to_sym=t.cum_to_sym, validate=True,
    )
    np.testing.assert_array_equal(out, syms)


def test_segments_are_independent():
    """Decoding segment 1 needs only its own words (parallel decode)."""
    syms = _contents()["ramp"]
    t = _table(syms)
    payload, counts = encode_channel_words(syms, t.freqs, t.cums, s_seg=32, ng=16)
    words = np.frombuffer(payload, "<u2")
    off = int(counts[0])
    seg1 = words[off : off + int(counts[1])]
    out, cursor = decode_segment_words(
        seg1, int(counts[1]), 32, 16, t.freqs, t.cums, t.cum_to_sym
    )
    assert cursor == 0
    np.testing.assert_array_equal(out.reshape(-1), syms[512:1024])


def test_single_symbol_table_full_scale():
    """f=PROB_SCALE (single-symbol table) must not overflow the emit
    threshold — wire v7 produces exactly this table for a constant
    plane (absent symbols carry frequency 0)."""
    freqs = np.zeros(256, np.uint16)
    freqs[0] = PROB_SCALE
    cums = np.zeros(256, np.uint16)
    lut = np.zeros(PROB_SCALE, np.uint8)
    syms = np.zeros((16, 8), np.uint8)
    stream = encode_segment_words(syms, freqs, cums)
    out, cursor = decode_segment_words(
        stream, stream.shape[0], 16, 8, freqs, cums, lut
    )
    assert cursor == 0
    np.testing.assert_array_equal(out, syms)


def test_corrupt_stream_detected():
    syms = _contents()["skewed"][:512]
    t = _table(syms)
    payload, counts = encode_channel_words(syms, t.freqs, t.cums, s_seg=32, ng=16)
    bad = bytearray(payload)
    bad[3] ^= 0xFF
    with pytest.raises(ValueError, match="corrupt|unconsumed"):
        decode_channel_words(
            bytes(bad), counts, 512, s_seg=32, ng=16,
            freqs=t.freqs, cums=t.cums, cum_to_sym=t.cum_to_sym, validate=True,
        )
