"""rANS entropy coder parity tests (reference: src/rans.rs tests)."""

import numpy as np
import pytest

from alice_codec_tpu.ops import rans

import oracle


def _table_arrays(table):
    return table.freqs, table.cums, table.cum_to_sym


def test_native_library_builds():
    from alice_codec_tpu.native import get_lib

    lib = get_lib()
    assert lib is not None, "native C++ rANS must build in this environment"
    assert lib.alc_native_abi_version() == 2


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_freq_table_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    hist = rng.integers(0, 5000, size=256).astype(np.uint32)
    hist[rng.integers(0, 256, size=50)] = 0  # ensure zero-count symbols
    table = rans.FrequencyTable.from_histogram(hist)
    of, oc, olut = oracle.freq_table_from_histogram(hist)
    assert np.array_equal(table.freqs, of)
    assert np.array_equal(table.cums, oc)
    assert np.array_equal(table.cum_to_sym, olut)
    # frequencies sum to PROB_SCALE (mod u16 wrap of the final adjustment)
    assert int(table.freqs.astype(np.uint32).sum()) == rans.PROB_SCALE


def test_freq_table_zero_histogram_uniform():
    table = rans.FrequencyTable.from_histogram(np.zeros(256, np.uint32))
    of, oc, olut = oracle.freq_table_uniform(256)
    assert np.array_equal(table.freqs, of)
    assert np.array_equal(table.cums, oc)
    assert np.array_equal(table.cum_to_sym, olut)


def test_uniform_table():
    table = rans.FrequencyTable.uniform(256)
    assert len(table) == 256
    assert not table.is_empty
    assert int(table.freqs.astype(np.uint32).sum()) == rans.PROB_SCALE
    sym, info = table.decode_symbol(16 * 5 + 3)
    assert sym == 5
    assert info.freq == 16


def _oracle_table_is_valid(hist):
    """True when the reference's table doesn't corrupt this data
    (all used symbols' slots stay within PROB_SCALE)."""
    of, oc, _ = oracle.freq_table_from_histogram(hist)
    used = np.asarray(hist) > 0
    return not np.any(used & (oc.astype(np.int64) + of.astype(np.int64) > 4096))


@pytest.mark.parametrize("skew", ["uniform", "skewed"])
def test_encode_matches_oracle_bytes(skew):
    rng = np.random.default_rng(42)
    if skew == "uniform":
        syms = rng.integers(0, 256, size=500).astype(np.uint8)
    else:
        syms = np.minimum(rng.geometric(0.3, size=500) - 1, 255).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    assert _oracle_table_is_valid(hist), "test premise: reference-valid regime"
    table = rans.FrequencyTable.from_histogram(hist)
    of, oc, _ = oracle.freq_table_from_histogram(hist)

    enc = rans.RansEncoder()
    enc.encode_symbols(syms, table)
    got = enc.finish()
    want = oracle.rans_encode(syms, of, oc)
    assert got == want


def test_broken_reference_regime_is_sanitized():
    """Histograms where the reference's table corrupts its own stream
    (used-symbol slots crossing 4096, e.g. solid-color video) must get a
    valid renormalized table here and roundtrip exactly."""
    cases = []
    # solid-color-like: two used symbols whose freqs sum to PROB_SCALE
    syms = np.zeros(500, np.uint8)
    syms[::50] = 7
    cases.append(syms)
    # near-lossless-like: dominant zero + spread of used tail symbols
    rng = np.random.default_rng(23)
    syms2 = np.zeros(4096, np.uint8)
    syms2[:300] = rng.integers(1, 40, size=300)
    cases.append(syms2)
    for syms in cases:
        hist = np.bincount(syms, minlength=256).astype(np.uint32)
        if _oracle_table_is_valid(hist):
            continue  # premise not met on this platform; skip
        table = rans.FrequencyTable.from_histogram(hist, sanitize=True)
        # table invariants: freqs ≥ 1, exact total, no slot overflow
        f = table.freqs.astype(np.int64)
        c = table.cums.astype(np.int64)
        assert f.min() >= 1
        assert f.sum() == rans.PROB_SCALE
        assert np.all(c + f <= rans.PROB_SCALE)
        # the reference-exact table must report overflow on these streams
        ref_table = rans.FrequencyTable.from_histogram(hist)
        enc_ref = rans.RansEncoder()
        enc_ref.encode_symbols(syms, ref_table)
        assert enc_ref.overflowed
        # and the sanitized stream roundtrips exactly
        enc = rans.RansEncoder()
        enc.encode_symbols(syms, table)
        assert not enc.overflowed
        data = enc.finish()
        dec = rans.RansDecoder(data)
        out = dec.decode_n(len(syms), table)
        assert np.array_equal(out, syms)
        # decoded stream satisfies the final-state invariant used by the
        # pipeline to auto-detect the table variant
        assert dec.state == rans.RANS32_L and dec.pos == len(data)


@pytest.mark.parametrize("n", [0, 1, 3, 100, 5000])
def test_roundtrip_single_stream(n):
    rng = np.random.default_rng(n)
    syms = np.minimum(rng.geometric(0.2, size=n) - 1, 255).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)
    enc = rans.RansEncoder()
    enc.encode_symbols(syms, table)
    data = enc.finish()
    dec = rans.RansDecoder(data)
    out = dec.decode_n(n, table)
    assert np.array_equal(out, syms)


def test_decode_matches_oracle():
    rng = np.random.default_rng(9)
    syms = rng.integers(0, 8, size=300).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)
    enc = rans.RansEncoder()
    enc.encode_symbols(syms, table)
    data = enc.finish()
    of, oc, olut = oracle.freq_table_from_histogram(hist)
    want = oracle.rans_decode(data, 300, of, oc, olut)
    got = rans.RansDecoder(data).decode_n(300, table)
    assert np.array_equal(got, want)


def test_doc_example():
    table = rans.FrequencyTable.uniform(256)
    enc = rans.RansEncoder()
    enc.encode_symbols([42, 100, 200], table)
    encoded = enc.finish()
    dec = rans.RansDecoder(encoded)
    assert list(dec.decode_n(3, table)) == [42, 100, 200]


def test_incremental_encode_matches_bulk():
    """encode() one-at-a-time (reverse order) == encode_symbols(bulk)."""
    rng = np.random.default_rng(3)
    syms = rng.integers(0, 256, size=64).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)

    bulk = rans.RansEncoder()
    bulk.encode_symbols(syms, table)
    one = rans.RansEncoder()
    for s in syms[::-1]:
        one.encode(table.get_symbol(int(s)))
    assert bulk.finish() == one.finish()


@pytest.mark.parametrize("n", [1, 4, 7, 1000])
def test_interleaved_roundtrip(n):
    rng = np.random.default_rng(n + 7)
    syms = np.minimum(rng.geometric(0.25, size=n) - 1, 255).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)
    enc = rans.InterleavedRansEncoder()
    enc.encode(syms, table)
    data = enc.finish()
    # wire format: 4 lens + 4 counts + streams
    lens = [int.from_bytes(data[4 * i : 4 * i + 4], "little") for i in range(4)]
    counts = [int.from_bytes(data[16 + 4 * i : 20 + 4 * i], "little") for i in range(4)]
    assert sum(counts) == n
    assert counts[0] == (n + 3) // 4
    assert len(data) == 32 + sum(lens)
    dec = rans.InterleavedRansDecoder(data)
    out = dec.decode_n(n, table)
    assert np.array_equal(out, syms)


@pytest.mark.parametrize("split", [(20, 20), (1, 39), (13, 13, 14)])
def test_interleaved_decode_is_resumable(split):
    """Sequential decode_n calls must continue where the last one stopped
    (the reference decoder is stateful across calls, src/rans.rs:465-524)."""
    rng = np.random.default_rng(3)
    n = sum(split)
    syms = rng.integers(0, 32, size=n).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)
    enc = rans.InterleavedRansEncoder()
    enc.encode(syms, table)
    data = enc.finish()

    one_shot = rans.InterleavedRansDecoder(data).decode_n(n, table)
    dec = rans.InterleavedRansDecoder(data)
    pieces = [dec.decode_n(k, table) for k in split]
    assert np.array_equal(np.concatenate(pieces), one_shot)
    assert np.array_equal(one_shot, syms)


def test_interleaved_native_matches_python_spec(monkeypatch):
    """Native 4-way encoder must produce the same bytes as the spec path."""
    rng = np.random.default_rng(11)
    syms = rng.integers(0, 64, size=257).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)

    enc_native = rans.InterleavedRansEncoder()
    enc_native.encode(syms, table)
    native_bytes = enc_native.finish()

    import alice_codec_tpu.ops.rans as rans_mod

    monkeypatch.setattr(rans_mod, "get_lib", lambda: None)
    enc_py = rans.InterleavedRansEncoder()
    enc_py.encode(syms, table)
    py_bytes = enc_py.finish()
    assert native_bytes == py_bytes


def test_nway_roundtrip_native():
    from alice_codec_tpu.native import get_lib
    import ctypes

    lib = get_lib()
    assert lib is not None
    rng = np.random.default_rng(13)
    n, lanes = 10000, 128
    syms = np.minimum(rng.geometric(0.3, size=n) - 1, 255).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)

    out = np.empty(2 * n + 8 * lanes, np.uint8)
    lane_lens = np.zeros(lanes, np.uint32)
    from alice_codec_tpu.ops.rans import _ctypes_ptr

    total = lib.alc_rans_encode_nway(
        _ctypes_ptr(syms), n, lanes, _ctypes_ptr(table.freqs),
        _ctypes_ptr(table.cums), _ctypes_ptr(out), _ctypes_ptr(lane_lens),
    )
    assert total == int(lane_lens.sum())
    dec = np.empty(n, np.uint8)
    lib.alc_rans_decode_nway(
        _ctypes_ptr(out), n, lanes, _ctypes_ptr(lane_lens),
        _ctypes_ptr(table.freqs), _ctypes_ptr(table.cums),
        _ctypes_ptr(table.cum_to_sym), _ctypes_ptr(dec),
    )
    assert np.array_equal(dec, syms)


def test_pure_python_fallback_roundtrip(monkeypatch):
    import alice_codec_tpu.ops.rans as rans_mod

    monkeypatch.setattr(rans_mod, "get_lib", lambda: None)
    rng = np.random.default_rng(17)
    syms = rng.integers(0, 16, size=200).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist)
    enc = rans.RansEncoder()
    enc.encode_symbols(syms, table)
    data = enc.finish()
    out = rans.RansDecoder(data).decode_n(200, table)
    assert np.array_equal(out, syms)
    # and the bytes equal the oracle
    of, oc, _ = oracle.freq_table_from_histogram(hist)
    assert data == oracle.rans_encode(syms, of, oc)


def test_simd_decoder_framing():
    """SimdRansDecoder reads 4 raw BE states + shared buffer (src/rans.rs:544-564)."""
    table = rans.FrequencyTable.uniform(256)
    # Encode 4 streams of one symbol each, concatenate raw streams
    streams = []
    for s in (10, 20, 30, 40):
        e = rans.RansEncoder()
        e.encode_symbols([s], table)
        streams.append(e.finish())
    data = b"".join(streams)
    dec = rans.SimdRansDecoder(data)
    # states initialized from first 16 bytes
    assert dec.ptr == 16
    syms = dec.decode_4(table)
    assert len(syms) == 4
    with pytest.raises(ValueError):
        dec.decode_n(3, table)


def test_interleaved_multicall_reference_semantics():
    """Reference call semantics (src/rans.rs:413-427): each encode() call
    pushes ITS symbols round-robin (reverse, its table) into the four
    persistent stream encoders, and the header symbol counts reflect the
    LAST call only.  Oracle: direct transliteration of that algorithm."""
    rng = np.random.default_rng(21)
    a = rng.integers(0, 16, size=10).astype(np.uint8)
    b = rng.integers(16, 64, size=7).astype(np.uint8)
    ta = rans.FrequencyTable.from_histogram(
        np.bincount(a, minlength=256).astype(np.uint32))
    tb = rans.FrequencyTable.from_histogram(
        np.bincount(b, minlength=256).astype(np.uint32))

    enc = rans.InterleavedRansEncoder()
    enc.encode(a, ta)
    enc.encode(b, tb)
    got = enc.finish()

    encoders = [rans.RansEncoder() for _ in range(4)]
    counts = [0] * 4
    for syms, table in ((a, ta), (b, tb)):
        n = len(syms)
        counts = [(n + 3 - i) // 4 for i in range(4)]
        for i in range(n - 1, -1, -1):
            encoders[i % 4].encode(table.get_symbol(int(syms[i])))
    streams = [e.finish() for e in encoders]
    want = b"".join(len(s).to_bytes(4, "little") for s in streams)
    want += b"".join(c.to_bytes(4, "little") for c in counts)
    want += b"".join(streams)
    assert got == want


def test_interleaved_mixed_table_call_semantics():
    """Reference call semantics (src/rans.rs:393-427): each encode() call
    pushes ITS symbols round-robin with its own table into the four
    persistent stream encoders, and the stored per-stream counts are
    OVERWRITTEN by the last call.  Consequence (faithfully reproduced):
    the LAST call's symbols decode first and roundtrip; earlier calls'
    stream split no longer lines up with the decoder's continuing
    round-robin cursor."""
    rng = np.random.default_rng(5)
    s1 = rng.integers(0, 16, size=37).astype(np.uint8)
    s2 = rng.integers(16, 48, size=41).astype(np.uint8)
    t1 = rans.FrequencyTable.from_histogram(
        np.bincount(s1, minlength=256).astype(np.uint32))
    t2 = rans.FrequencyTable.from_histogram(
        np.bincount(s2, minlength=256).astype(np.uint32))
    enc = rans.InterleavedRansEncoder()
    enc.encode(s1, t1)
    enc.encode(s2, t2)
    data = enc.finish()

    # counts field carries the LAST call's per-stream counts
    counts = [int.from_bytes(data[16 + 4 * i : 20 + 4 * i], "little")
              for i in range(4)]
    assert counts == [(len(s2) + 3 - i) // 4 for i in range(4)]

    dec = rans.InterleavedRansDecoder(data)
    np.testing.assert_array_equal(dec.decode_n(len(s2), t2), s2)
