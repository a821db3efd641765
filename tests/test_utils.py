"""IO helpers, streaming container (checkpoint/resume), model presets."""

import numpy as np
import pytest

from alice_codec_tpu.errors import InvalidBitstream, InvalidBufferSize
from alice_codec_tpu.models import LOSSLESS, PRESETS, get_preset
from alice_codec_tpu.pipeline import FrameEncoder
from alice_codec_tpu.utils import (
    AlcStreamReader,
    AlcStreamWriter,
    iter_chunks,
    read_raw_rgb,
    write_raw_rgb,
)


def test_raw_rgb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (5, 4, 6, 3), dtype=np.uint8)
    p = tmp_path / "video.rgb"
    write_raw_rgb(p, frames)
    back = read_raw_rgb(p, 6, 4)  # inferred frame count
    assert np.array_equal(back, frames)
    back2 = read_raw_rgb(p, 6, 4, frames=3)
    assert np.array_equal(back2, frames[:3])
    with pytest.raises(InvalidBufferSize):
        read_raw_rgb(p, 6, 4, frames=99)


def test_iter_chunks():
    frames = np.zeros((10, 2, 2, 3), np.uint8)
    chunks = list(iter_chunks(frames, chunk_size=4))
    assert [c[1] for c in chunks] == [4, 4, 2]
    assert chunks[2][0].shape[0] == 2


def test_stream_write_read_resume(tmp_path):
    rng = np.random.default_rng(1)
    path = tmp_path / "video.alcs"
    enc = FrameEncoder(quality=85)
    chunks = []
    with AlcStreamWriter(path) as w:
        for i in range(3):
            rgb = rng.integers(0, 256, 4 * 4 * 2 * 3, dtype=np.uint8)
            chunk = enc.encode(rgb, 4, 4, 2)
            chunks.append(chunk.to_bytes())
            w.append(chunk)
        assert w.chunks_written == 3

    read = list(AlcStreamReader(path))
    assert len(read) == 3
    assert [c.to_bytes() for c in read] == chunks

    # simulate a crash: truncate mid-chunk, then resume
    data = path.read_bytes()
    path.write_bytes(data[: len(data) - 7])
    reader = AlcStreamReader(path)
    recovered = list(reader)
    assert len(recovered) == 2  # last chunk incomplete → dropped

    with AlcStreamWriter(path, resume=True) as w:
        assert w.chunks_written == 2
        rgb = rng.integers(0, 256, 4 * 4 * 2 * 3, dtype=np.uint8)
        w.append(enc.encode(rgb, 4, 4, 2))
    assert len(list(AlcStreamReader(path))) == 3

    with pytest.raises(InvalidBitstream):
        bad = tmp_path / "bad.alcs"
        bad.write_bytes(b"NOPE")
        AlcStreamReader(bad)


def test_presets():
    assert set(PRESETS) == {"realtime", "streaming", "archival", "lossless"}
    assert get_preset("archival").wavelet.name_str == "cdf97"
    with pytest.raises(ValueError):
        get_preset("nope")
    # lossless preset roundtrips exactly on in-gamut content
    rng = np.random.default_rng(2)
    x = (np.arange(8)[None, None, :, None] * 9 % 256)
    rgb = np.broadcast_to(x, (2, 8, 8, 3)).astype(np.uint8).reshape(-1)
    enc = LOSSLESS.encoder()
    dec = LOSSLESS.decoder()
    out = LOSSLESS.decode(dec, enc.encode(rgb, 8, 8, 2))
    assert np.array_equal(out, rgb)
    rc = PRESETS["streaming"].rate_controller()
    assert rc is not None and rc.recommended_quality > 0
    assert PRESETS["archival"].rate_controller() is None