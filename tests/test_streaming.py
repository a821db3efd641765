"""Pipelined ALC3 chunk streaming (alice_codec_tpu/streaming.py)."""

import numpy as np
import pytest

from alice_codec_tpu import (
    Alc3Codec,
    Alc3StreamReader,
    Alc3StreamWriter,
    decode_stream,
    encode_stream,
)
from alice_codec_tpu.errors import InvalidBitstream


def _frames(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    x = np.arange(w, dtype=np.int32)[None, None, :, None]
    tt = np.arange(n, dtype=np.int32)[:, None, None, None]
    base = (x * 5 + tt * 3) % 256
    noise = rng.integers(0, 8, size=(n, h, w, 1), dtype=np.int32)
    return np.broadcast_to(
        np.clip(base + noise, 0, 255).astype(np.uint8), (n, h, w, 3)
    ).copy()


def test_encode_decode_stream_roundtrip():
    frames = _frames(10, 16, 16)  # 3 chunks of 4 (last padded)
    codec = Alc3Codec(quality=90, s_seg=8)
    containers = list(encode_stream(frames, codec, chunk_size=4))
    assert len(containers) == 3
    chunks = list(decode_stream(containers))
    assert len(chunks) == 3
    out = np.concatenate(chunks)[:10]
    ref = codec.decode(codec.encode(frames[:4].copy()), as_numpy=True)
    np.testing.assert_array_equal(out[:4], ref)
    assert out.shape == frames.shape


def test_encode_stream_lookahead_zero():
    frames = _frames(8, 8, 8, seed=1)
    containers = list(
        encode_stream(frames, chunk_size=4, lookahead=0,
                      quality=85, s_seg=8))
    assert len(containers) == 2
    outs = list(decode_stream(containers, lookahead=0))
    assert outs[0].shape == (4, 8, 8, 3)


def test_stream_file_roundtrip_and_resume(tmp_path):
    frames = _frames(8, 8, 8, seed=2)
    path = tmp_path / "v.alcs3"
    containers = list(
        encode_stream(frames, chunk_size=4, quality=90, s_seg=8))
    with Alc3StreamWriter(path) as wtr:
        for c in containers:
            wtr.append(c)
    back = list(Alc3StreamReader(path))
    assert back == containers

    # truncated tail: drop 3 bytes — the partial container must vanish
    data = path.read_bytes()
    path.write_bytes(data[:-3])
    rdr = Alc3StreamReader(path)
    assert list(rdr) == containers[:-1]

    # resume appends after the last complete container
    with Alc3StreamWriter(path, resume=True) as wtr:
        assert wtr.containers_written == len(containers) - 1
        wtr.append(containers[-1])
    assert list(Alc3StreamReader(path)) == containers


def test_stream_reader_rejects_garbage(tmp_path):
    path = tmp_path / "bad.alcs3"
    path.write_bytes(b"NOPE" + bytes(16))
    with pytest.raises(InvalidBitstream):
        Alc3StreamReader(path)
