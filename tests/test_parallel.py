"""Batched/sharded pipeline + ALC2 container tests (8-device CPU mesh)."""

import numpy as np
import pytest

from alice_codec_tpu.parallel import (
    BatchFrameDecoder,
    BatchFrameEncoder,
    EncodedChunkStream,
    chunk_frames,
    chunk_mesh,
)
from alice_codec_tpu.errors import InvalidBitstream
from alice_codec_tpu.pipeline import FrameDecoder, FrameEncoder


def _batch(b=4, t=4, h=8, w=8, seed=0):
    rng = np.random.default_rng(seed)
    x = np.arange(w)[None, None, :, None] * 5
    base = (x + np.arange(t)[:, None, None, None] * 9) % 256
    noise = rng.integers(0, 10, size=(b, t, h, w, 3))
    return np.clip(base[None] + noise, 0, 255).astype(np.uint8)


def test_chunk_frames_splits_and_pads():
    frames = np.arange(10 * 2 * 2 * 3, dtype=np.uint8).reshape(10, 2, 2, 3)
    batch, n = chunk_frames(frames, chunk_size=4)
    assert batch.shape == (3, 4, 2, 2, 3)
    assert n == 10
    # padding repeats the final frame
    assert np.array_equal(batch[2, 2], frames[9])
    assert np.array_equal(batch[2, 3], frames[9])


def test_batch_roundtrip():
    batch = _batch()
    enc = BatchFrameEncoder(quality=90, n_lanes=8)
    stream = enc.encode(batch)
    assert stream.n_chunks == 4
    out = BatchFrameDecoder().decode(stream)
    assert out.shape == batch.shape
    err = np.abs(out.astype(int) - batch.astype(int)).max()
    assert err < 64  # lossy but sane


def test_batch_lossless_exact():
    batch = _batch(b=2)
    enc = BatchFrameEncoder(quality=100, n_lanes=4)
    stream = enc.encode(batch)
    out = BatchFrameDecoder().decode(stream, exact=True)
    assert np.array_equal(out, batch)


def test_alc2_serialization_roundtrip():
    batch = _batch(b=3)
    stream = BatchFrameEncoder(quality=85, wavelet="cdf97", n_lanes=8).encode(batch)
    data = stream.to_bytes()
    restored = EncodedChunkStream.from_bytes(data)
    assert restored.n_chunks == 3
    assert restored.n_lanes == 8
    assert restored.wavelet_type == stream.wavelet_type
    assert restored.payload == stream.payload
    assert np.array_equal(restored.lane_lens, stream.lane_lens)
    out1 = BatchFrameDecoder().decode(stream)
    out2 = BatchFrameDecoder().decode(restored)
    assert np.array_equal(out1, out2)


def test_alc2_validation():
    with pytest.raises(InvalidBitstream):
        EncodedChunkStream.from_bytes(b"XXXX" + b"\x00" * 100)
    with pytest.raises(InvalidBitstream):
        EncodedChunkStream.from_bytes(b"AL")
    batch = _batch(b=1)
    data = BatchFrameEncoder(n_lanes=4).encode(batch).to_bytes()
    with pytest.raises(InvalidBitstream):
        EncodedChunkStream.from_bytes(data[:-10])


def test_batch_matches_single_chunk_pipeline():
    """Device stage parity: batched encode == per-chunk FrameEncoder symbols."""
    batch = _batch(b=2, t=2, h=6, w=6)
    stream = BatchFrameEncoder(quality=80, n_lanes=4).encode(batch)
    for ci in range(2):
        single = FrameEncoder(quality=80).encode(batch[ci].reshape(-1), 6, 6, 2)
        # same histograms and quant params as the scalar pipeline
        for ch in range(3):
            assert np.array_equal(
                stream.chunk_headers[ci][ch].histogram,
                single.channel_headers[ch].histogram,
            )
            assert (
                stream.chunk_headers[ci][ch].quant_step
                == single.channel_headers[ch].quant_step
            )


def test_sharded_mesh_roundtrip():
    mesh = chunk_mesh(8)
    batch = _batch(b=8, t=2, h=4, w=4)
    enc = BatchFrameEncoder(quality=90, n_lanes=4, mesh=mesh)
    stream = enc.encode(batch)
    out = BatchFrameDecoder(mesh=mesh).decode(stream)
    assert out.shape == batch.shape
    # sharded result must equal unsharded result exactly
    stream2 = BatchFrameEncoder(quality=90, n_lanes=4).encode(batch)
    out2 = BatchFrameDecoder().decode(stream2)
    assert stream.payload == stream2.payload
    assert np.array_equal(out, out2)


def test_nway_python_fallback_matches_native(monkeypatch):
    from alice_codec_tpu.parallel import batch as batch_mod

    arr = _batch(b=1, t=2, h=4, w=4)
    native_stream = BatchFrameEncoder(quality=90, n_lanes=4).encode(arr)
    monkeypatch.setattr(batch_mod, "get_lib", lambda: None)
    py_stream = BatchFrameEncoder(quality=90, n_lanes=4).encode(arr)
    assert native_stream.payload == py_stream.payload
    assert np.array_equal(native_stream.lane_lens, py_stream.lane_lens)
    out = BatchFrameDecoder().decode(py_stream)
    assert out.shape == arr.shape


def test_device_entropy_matches_host_payload():
    """device_entropy=True must produce byte-identical ALC2 payloads."""
    batch = _batch(b=2, t=2, h=8, w=8)
    host = BatchFrameEncoder(quality=85, n_lanes=8).encode(batch)
    dev = BatchFrameEncoder(quality=85, n_lanes=8, device_entropy=True).encode(batch)
    assert np.array_equal(dev.lane_lens, host.lane_lens)
    assert dev.payload == host.payload
    assert dev.to_bytes() == host.to_bytes()


def test_device_entropy_decode_roundtrip():
    batch = _batch(b=2, t=2, h=8, w=8, seed=3)
    stream = BatchFrameEncoder(quality=100, n_lanes=8, device_entropy=True).encode(batch)
    # device-entropy decode
    out_dev = BatchFrameDecoder(device_entropy=True).decode(stream, exact=True)
    assert np.array_equal(out_dev, batch)
    # cross: host decode of device-encoded stream
    out_host = BatchFrameDecoder().decode(stream, exact=True)
    assert np.array_equal(out_host, batch)
    # cross: device decode of host-encoded stream
    stream_h = BatchFrameEncoder(quality=100, n_lanes=8).encode(batch)
    out_x = BatchFrameDecoder(device_entropy=True).decode(stream_h, exact=True)
    assert np.array_equal(out_x, batch)


def test_lane_multiple_padding():
    """Symbol counts not divisible by n_lanes pad uniformly (both coders)."""
    batch = _batch(b=1, t=2, h=6, w=6, seed=4)  # padded_pixels=72, lanes=16
    host = BatchFrameEncoder(quality=90, n_lanes=16).encode(batch)
    dev = BatchFrameEncoder(quality=90, n_lanes=16, device_entropy=True).encode(batch)
    assert host.payload == dev.payload
    out1 = BatchFrameDecoder().decode(host)
    out2 = BatchFrameDecoder(device_entropy=True).decode(dev)
    assert np.array_equal(out1, out2)


@pytest.mark.parametrize("wavelet", ["haar", "cdf97"])
def test_batch_other_wavelets(wavelet):
    batch = _batch(b=2, t=2, h=8, w=8, seed=6)
    stream = BatchFrameEncoder(quality=90, wavelet=wavelet, n_lanes=8).encode(batch)
    assert stream.wavelet_type.name_str == wavelet
    out = BatchFrameDecoder().decode(stream)
    assert out.shape == batch.shape


def test_pallas_entropy_matches_scan_payload():
    """pallas_entropy=True produces the same ALC2 bytes (interpret-safe lanes)."""
    batch = _batch(b=1, t=2, h=8, w=8, seed=7)
    scan_s = BatchFrameEncoder(quality=90, n_lanes=8, device_entropy=True).encode(batch)
    pallas_s = BatchFrameEncoder(
        quality=90, n_lanes=8, device_entropy=True, pallas_entropy=True
    ).encode(batch)
    assert pallas_s.payload == scan_s.payload
    assert np.array_equal(pallas_s.lane_lens, scan_s.lane_lens)
    out = BatchFrameDecoder(device_entropy=True).decode(pallas_s)
    assert out.shape == batch.shape


def test_pallas_decode_matches_all_paths():
    """BatchFrameDecoder(pallas_entropy=True) decodes identically to the
    scan-coder and host decode paths."""
    batch = _batch(b=2, t=2, h=8, w=8, seed=9)
    stream = BatchFrameEncoder(quality=85, n_lanes=8).encode(batch)
    out_pallas = BatchFrameDecoder(pallas_entropy=True).decode(stream)
    out_scan = BatchFrameDecoder(device_entropy=True).decode(stream)
    out_host = BatchFrameDecoder().decode(stream)
    assert np.array_equal(out_pallas, out_scan)
    assert np.array_equal(out_pallas, out_host)
