"""ALC3 Pallas kernels vs the NumPy spec (interpret mode on CPU).

The kernels must match ops/rans_word.py word-for-word: same emission-order
stream layout, same counts, and bit-identical decode.  Real-TPU runs are
exercised by the bench and by tests/test_device_codec.py paths.
"""

import numpy as np
import pytest

from alice_codec_tpu.ops.rans_word import (
    WordTable,
    encode_segment_words,
    segment_capacity_words,
)
from alice_codec_tpu.ops.pallas.rans3_kernels import (
    NG,
    decode_words_pallas,
    encode_words_pallas,
    stream_rows,
)


def _table(symbols: np.ndarray) -> WordTable:
    hist = np.bincount(symbols.reshape(-1), minlength=256).astype(np.uint32)
    return WordTable.from_histogram(hist)


def _content(kind: str, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "noise":
        return rng.integers(0, 256, size=n, dtype=np.uint8)
    if kind == "skewed":
        vals = rng.integers(0, 16, size=n)
        return np.where(rng.random(n) < 0.7, 0, vals).astype(np.uint8)
    if kind == "constant":
        return np.zeros(n, np.uint8)
    raise AssertionError(kind)


def _spec_streams(segs: np.ndarray, table: WordTable):
    """Segments (S, s_seg, NG) → padded stream array + counts via the spec
    (all-zero segments ELIDED with count 0, like encode_channel_words)."""
    s_seg = segs.shape[1]
    w_rows = stream_rows(s_seg)
    streams = np.zeros((segs.shape[0], w_rows * 128), np.int32)
    counts = np.zeros(segs.shape[0], np.int32)
    for i in range(segs.shape[0]):
        if not segs[i].any():
            continue
        words = encode_segment_words(segs[i], table.freqs, table.cums)
        counts[i] = words.shape[0]
        streams[i, : words.shape[0]] = words
    return streams.reshape(-1, w_rows, 128), counts


@pytest.mark.parametrize("v_seg", [1, 2, 4])
@pytest.mark.parametrize("kind", ["noise", "skewed", "constant"])
def test_encode_kernel_matches_spec(kind, v_seg):
    s_seg, n_seg = 16, 4
    syms = _content(kind, n_seg * s_seg * NG).reshape(n_seg, s_seg, NG)
    t = _table(syms)
    freqs = t.freqs.astype(np.int32)[None]
    cums = t.cums.astype(np.int32)[None]

    streams, counts = encode_words_pallas(
        syms.astype(np.int32), freqs, cums, v_seg=v_seg
    )
    streams, counts = np.asarray(streams), np.asarray(counts)
    ref_streams, ref_counts = _spec_streams(syms, t)

    np.testing.assert_array_equal(counts, ref_counts)
    np.testing.assert_array_equal(streams, ref_streams)
    assert counts.max() <= segment_capacity_words(s_seg, NG)


@pytest.mark.parametrize("v_seg", [1, 2, 4])
@pytest.mark.parametrize("kind", ["noise", "skewed", "constant"])
def test_decode_kernel_matches_spec(kind, v_seg):
    s_seg, n_seg = 16, 4
    syms = _content(kind, n_seg * s_seg * NG, seed=1).reshape(n_seg, s_seg, NG)
    t = _table(syms)
    streams, counts = _spec_streams(syms, t)

    out = decode_words_pallas(
        streams, counts,
        t.freqs.astype(np.int32)[None], t.cums.astype(np.int32)[None],
        s_seg=s_seg, v_seg=v_seg,
    )
    np.testing.assert_array_equal(np.asarray(out), syms.astype(np.int32))


@pytest.mark.parametrize("v_seg", [1, 2, 4])
def test_zero_segment_elision_mixed_slots(v_seg):
    """All-zero segments get count 0 (elided) even when they share a
    V-batched slot with active segments; decode returns exact zeros for
    them and the spec's wire words for the active ones."""
    s_seg, n_seg = 16, 4
    live = _content("skewed", s_seg * NG, seed=5).reshape(s_seg, NG)
    syms = np.zeros((n_seg, s_seg, NG), np.uint8)
    syms[1] = live
    syms[3] = live
    t = _table(syms)
    freqs = t.freqs.astype(np.int32)[None]
    cums = t.cums.astype(np.int32)[None]

    streams, counts = encode_words_pallas(
        syms.astype(np.int32), freqs, cums, v_seg=v_seg)
    counts = np.asarray(counts)
    assert counts[0] == 0 and counts[2] == 0
    ref_streams, ref_counts = _spec_streams(syms, t)
    np.testing.assert_array_equal(counts, ref_counts)
    # wire bytes = the first counts[i] words of each stream (to_bytes
    # slicing); elided rows carry none
    for i in range(n_seg):
        np.testing.assert_array_equal(
            np.asarray(streams).reshape(n_seg, -1)[i, : counts[i]],
            ref_streams.reshape(n_seg, -1)[i, : counts[i]],
        )
    out = decode_words_pallas(
        streams, counts, freqs, cums, s_seg=s_seg, v_seg=v_seg)
    np.testing.assert_array_equal(np.asarray(out), syms.astype(np.int32))


def test_kernel_roundtrip_multi_table():
    """Streams grouped by table (3 'channels' with different statistics)."""
    s_seg, n_seg = 8, 2
    rng = np.random.default_rng(2)
    chans = [
        _content("skewed", n_seg * s_seg * NG, seed=3),
        _content("noise", n_seg * s_seg * NG, seed=4),
        (rng.integers(0, 4, size=n_seg * s_seg * NG)).astype(np.uint8),
    ]
    tables = [_table(c) for c in chans]
    syms = np.stack([c.reshape(n_seg, s_seg, NG) for c in chans]).reshape(
        3 * n_seg, s_seg, NG
    )
    freqs = np.stack([t.freqs for t in tables]).astype(np.int32)
    cums = np.stack([t.cums for t in tables]).astype(np.int32)

    streams, counts = encode_words_pallas(
        syms.astype(np.int32), freqs, cums, v_seg=2
    )
    out = decode_words_pallas(streams, counts, freqs, cums, s_seg=s_seg, v_seg=2)
    np.testing.assert_array_equal(np.asarray(out), syms.astype(np.int32))

    # per-table parity with the spec
    for ch in range(3):
        ref_streams, ref_counts = _spec_streams(
            chans[ch].reshape(n_seg, s_seg, NG), tables[ch]
        )
        np.testing.assert_array_equal(
            np.asarray(counts)[ch * n_seg : (ch + 1) * n_seg], ref_counts
        )
        np.testing.assert_array_equal(
            np.asarray(streams)[ch * n_seg : (ch + 1) * n_seg], ref_streams
        )


def test_worst_case_capacity_noise():
    """Uniform noise maximizes emission; streams must stay in-bounds."""
    s_seg = 8
    syms = _content("noise", s_seg * NG, seed=9).reshape(1, s_seg, NG)
    t = _table(syms)
    streams, counts = encode_words_pallas(
        syms.astype(np.int32),
        t.freqs.astype(np.int32)[None], t.cums.astype(np.int32)[None],
        v_seg=1,
    )
    assert int(np.asarray(counts)[0]) <= segment_capacity_words(s_seg, NG)
    out = decode_words_pallas(
        np.asarray(streams), np.asarray(counts),
        t.freqs.astype(np.int32)[None], t.cums.astype(np.int32)[None],
        s_seg=s_seg, v_seg=1,
    )
    np.testing.assert_array_equal(np.asarray(out)[0], syms[0].astype(np.int32))
