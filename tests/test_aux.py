"""Container probing, bridges and CLI tests (reference: src/container.rs,
src/*_bridge.rs, src/bin/main.rs tests)."""

import numpy as np
import pytest

from alice_codec_tpu import container
from alice_codec_tpu.bridges import cache, crypto, db, ml


# ── container ───────────────────────────────────────────────────


def _mp4_box(fourcc: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + fourcc + payload


def test_mp4_parsing():
    data = _mp4_box(b"ftyp", b"isom" + b"\x00" * 8) + _mp4_box(b"moov", b"x" * 4)
    assert container.is_mp4(data)
    boxes = container.list_mp4_boxes(data)
    assert [b.box_type for b in boxes] == [b"ftyp", b"moov"]
    assert boxes[0].payload_size == 12
    assert container.parse_ftyp(data[boxes[0].data_offset :]) == "isom"
    assert container.box_type_str(b"moov") == "moov"


def test_mp4_extended_and_eof_size():
    # 64-bit extended size box
    payload = b"y" * 4
    ext = (1).to_bytes(4, "big") + b"mdat" + (16 + len(payload)).to_bytes(8, "big") + payload
    b = container.parse_mp4_box(ext, 0)
    assert b.payload_size == 4
    assert b.data_offset == 16
    # size 0 → to EOF
    eof = (0).to_bytes(4, "big") + b"mdat" + b"z" * 10
    b = container.parse_mp4_box(eof, 0)
    assert b.payload_size == 10
    # truncated
    assert container.parse_mp4_box(b"\x00\x00", 0) is None


def test_ebml_parsing():
    # EBML header magic + size vint (0x84 = length 4) + 4 bytes payload
    data = b"\x1a\x45\xdf\xa3" + b"\x84" + b"\x01\x02\x03\x04"
    assert container.is_matroska(data)
    elem = container.parse_ebml_element(data, 0)
    assert elem.id == 0x1A45DFA3
    assert elem.data_size == 4
    assert elem.data_offset == 5
    elems = container.list_ebml_elements(data)
    assert len(elems) == 1


def test_vint_decoding():
    # 1-byte vint: 0x81 → raw 0x81, size form clears marker → 1
    assert container.decode_vint(b"\x81", 0) == (0x81, 1)
    assert container.decode_vint_size(b"\x81", 0) == (1, 1)
    # 2-byte vint 0x4001 → size form → 1
    assert container.decode_vint_size(b"\x40\x01", 0) == (1, 2)
    # zero byte invalid
    assert container.decode_vint(b"\x00", 0) is None


def test_detect_format():
    mp4 = _mp4_box(b"ftyp", b"isom")
    assert container.detect_format(mp4) is container.ContainerFormat.ISO_BASE_MEDIA
    mkv = b"\x1a\x45\xdf\xa3\x84\x00\x00\x00\x00"
    assert container.detect_format(mkv) is container.ContainerFormat.MATROSKA
    assert container.detect_format(b"garbage!") is container.ContainerFormat.UNKNOWN


# ── crypto bridge ───────────────────────────────────────────────


def test_seal_open_roundtrip():
    key = crypto.Key.generate()
    plaintext = b"compressed wavelet data here"
    sealed = crypto.seal_bitstream(plaintext, key)
    assert sealed.data != plaintext
    assert sealed.plaintext_len == len(plaintext)
    assert len(sealed.data) == 24 + len(plaintext) + 16
    assert crypto.open_bitstream(sealed, key) == plaintext


def test_wrong_key_fails():
    k1, k2 = crypto.Key.generate(), crypto.Key.generate()
    sealed = crypto.seal_bitstream(b"secret data", k1)
    with pytest.raises(crypto.CipherError):
        crypto.open_bitstream(sealed, k2)


def test_tampered_data_fails():
    key = crypto.Key.generate()
    sealed = crypto.seal_bitstream(b"data", key)
    bad = bytearray(sealed.data)
    bad[-1] ^= 1
    with pytest.raises(crypto.CipherError):
        crypto.open_sealed(key, bytes(bad))


def test_content_hash_deterministic():
    h1 = crypto.content_hash(b"some bitstream")
    h2 = crypto.content_hash(b"some bitstream")
    assert h1.as_bytes() == h2.as_bytes()
    assert len(h1.as_bytes()) == 32
    assert h1.as_bytes() != crypto.content_hash(b"other").as_bytes()


def test_blake3_known_prefix():
    """First bytes of the BLAKE3 empty-input digest (public test vector)."""
    from alice_codec_tpu.bridges._blake3 import blake3

    assert blake3(b"").hex().startswith("af1349b9f5f9a1a6")
    # multi-chunk tree path is deterministic and distinct
    big = bytes(range(256)) * 20  # > 4 chunks
    assert blake3(big) != blake3(big[:-1])


def test_derive_key_deterministic():
    k1 = crypto.derive_key("alice-codec-v1", b"my-passphrase")
    k2 = crypto.derive_key("alice-codec-v1", b"my-passphrase")
    assert k1.as_bytes() == k2.as_bytes()
    k3 = crypto.derive_key("other-context", b"my-passphrase")
    assert k1.as_bytes() != k3.as_bytes()


# ── cache bridge ────────────────────────────────────────────────


def test_frame_cache_roundtrip():
    fc = cache.FrameCache(16)
    pixels = np.full(64 * 64 * 3, 128, np.uint8)
    fc.put(0, 5, 1, pixels, 64, 64)
    frame = fc.get(0, 5, 1)
    assert frame.width == 64 and frame.height == 64
    assert frame.data.size == pixels.size
    assert fc.get(99, 0, 0) is None
    assert 0.0 < fc.hit_rate() < 1.0


def test_cache_quality_levels_and_eviction():
    fc = cache.FrameCache(2)
    fc.put(0, 0, 1, np.array([100], np.uint8), 1, 1)
    fc.put(0, 0, 2, np.array([200], np.uint8), 1, 1)
    assert fc.get(0, 0, 1).data[0] == 100
    assert fc.get(0, 0, 2).data[0] == 200
    fc.put(0, 0, 3, np.array([50], np.uint8), 1, 1)  # evicts LRU (quality=1)
    assert fc.get(0, 0, 1) is None
    assert len(fc) == 2


# ── db bridge ───────────────────────────────────────────────────


def test_metrics_sink(tmp_path):
    sink = db.CodecMetricsSink.open(tmp_path / "metrics")
    sink.record(db.CodecMetrics(1000, 2_500_000.0, 38.5, 1200.0, db.FrameType.INTRA))
    sink.record_batch(
        [
            db.CodecMetrics(2000, 3_000_000.0, 40.0, 1100.0),
            db.CodecMetrics(3000, 2_000_000.0, 36.0, 1300.0),
        ]
    )
    sink.flush()
    assert len(sink.query_bitrate(0, 5000)) == 3
    assert sink.average_psnr(0, 5000) == pytest.approx((38.5 + 40.0 + 36.0) / 3)
    assert sink.max_encode_time(0, 5000) == pytest.approx(1300.0)
    ds = sink.downsample_bitrate(0, 4000, 2000)
    assert len(ds) == 2
    # range filtering
    assert len(sink.query_psnr(1500, 2500)) == 1


def test_tsdb_persistence(tmp_path):
    path = tmp_path / "x.tsdb"
    d = db.TimeSeriesDB(path)
    d.put(10, 1.5)
    d.put(20, 2.5)
    d.flush()
    d.close()
    d2 = db.TimeSeriesDB(path)
    assert d2.scan(0, 100) == [(10, 1.5), (20, 2.5)]


# ── ml bridge ───────────────────────────────────────────────────


def test_subband_classifier():
    weights = [1, -1, 0, 0, 1, 1]  # 2×3
    clf = ml.SubBandClassifier(weights, 3, 2)
    cls_idx, conf = clf.classify([5.0, 1.0, 3.0])
    # class 0: 5-1 = 4; class 1: 1+3 = 4 → tie resolves to last (class 1)
    assert cls_idx == 1
    assert conf == pytest.approx(4.0)
    logits = np.zeros(2, np.float32)
    clf.classify_logits([5.0, 1.0, 3.0], logits)
    assert list(logits) == [4.0, 4.0]


def test_motion_predictor():
    weights = [1, 0, -1, 0, 0, 1, 0, -1]  # 2×4
    pred = ml.MotionPredictor(weights, 4)
    dx, dy = pred.predict([2.0, 3.0, 1.0, 4.0])
    assert dx == pytest.approx(1.0)
    assert dy == pytest.approx(-1.0)


def test_classifier_rejects_nonternary():
    with pytest.raises(ValueError):
        ml.SubBandClassifier([5, 0, 0, 0, 0, 0], 3, 2)


# ── CLI ─────────────────────────────────────────────────────────


def test_cli_encode_decode_info(tmp_path, capsys):
    from alice_codec_tpu import cli

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, 8 * 8 * 2 * 3, dtype=np.uint8).tobytes()
    inp = tmp_path / "in.rgb"
    inp.write_bytes(raw)
    out_alc = tmp_path / "out.alc"
    assert cli.main(
        ["encode", str(inp), "-o", str(out_alc), "-W", "8", "-H", "8", "-f", "2", "-q", "85"]
    ) == 0
    assert out_alc.exists()

    assert cli.main(["info", str(out_alc)]) == 0
    captured = capsys.readouterr()
    assert "8x8x2" in captured.out
    assert "cdf53" in captured.out

    out_rgb = tmp_path / "back.rgb"
    assert cli.main(["decode", str(out_alc), "-o", str(out_rgb)]) == 0
    assert len(out_rgb.read_bytes()) == len(raw)


def test_cli_bad_input(tmp_path):
    from alice_codec_tpu import cli

    bad = tmp_path / "bad.alc"
    bad.write_bytes(b"not an alc file at all")
    assert cli.main(["info", str(bad)]) == 1
    assert cli.main(["decode", str(bad), "-o", str(tmp_path / "x")]) == 1
    # wrong buffer size
    small = tmp_path / "small.rgb"
    small.write_bytes(b"abc")
    assert cli.main(
        ["encode", str(small), "-o", str(tmp_path / "y"), "-W", "8", "-H", "8", "-f", "2"]
    ) == 1


# ── profiling ───────────────────────────────────────────────────


def test_stage_timer():
    import time as _time

    from alice_codec_tpu.profiling import StageTimer

    timer = StageTimer()
    with timer.stage("encode"):
        _time.sleep(0.01)
    with timer.stage("encode"):
        _time.sleep(0.01)
    assert timer.counts["encode"] == 2
    assert timer.average_us("encode") >= 10_000
    m = timer.as_metrics("encode", timestamp_ms=1234)
    assert m.encode_time_us >= 10_000
    assert "encode" in timer.report()
    assert timer.average_us("missing") == 0.0


def test_cli_alc3_chunked_encode_decode(tmp_path, capsys):
    """--format alc3 with --chunk-size splits the input into a multi-chunk
    container; decode concatenates the chunks back (the padded tail frames
    of the final chunk repeat the last real frame)."""
    from alice_codec_tpu import cli

    rng = np.random.default_rng(3)
    t, h, w = 6, 8, 8
    raw = rng.integers(0, 256, t * h * w * 3, dtype=np.uint8).tobytes()
    inp = tmp_path / "in.rgb"
    inp.write_bytes(raw)
    out = tmp_path / "out.alc3"
    assert cli.main([
        "encode", str(inp), "-o", str(out), "-W", str(w), "-H", str(h),
        "-f", str(t), "-q", "90", "--format", "alc3", "--s-seg", "8",
        "--chunk-size", "4",
    ]) == 0
    assert out.read_bytes()[:4] == b"ALC3"

    back = tmp_path / "back.rgb"
    assert cli.main(["decode", str(out), "-o", str(back)]) == 0
    # 6 frames in 4-frame chunks -> 2 chunks -> 8 decoded frames
    assert len(back.read_bytes()) == 8 * h * w * 3
