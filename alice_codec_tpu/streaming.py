"""Pipelined chunk streaming over the ALC3 codec.

The roundtrip benches measure *device* time, but a production pipeline
also pays host work per chunk: container serialization (a device→host
fetch of the compressed streams) on encode, parsing + upload on decode.
JAX dispatch is asynchronous, so the two can overlap — the device crunches
chunk ``i+1`` while the host serializes chunk ``i`` — as long as the
dispatch for ``i+1`` is issued *before* the fetch for ``i``.  These
helpers encode that ordering (VERDICT r2 "overlap the pipeline"; the
reference has no analog — it is single-threaded end-to-end,
/root/reference/src/pipeline.rs:377-508).

``encode_stream`` / ``decode_stream`` are generator-based with a bounded
``lookahead`` window (each in-flight 1080p×64 chunk holds ~10-40 MB of
compressed HBM, so unbounded dispatch would crowd the decode workspace).

``Alc3StreamWriter`` / ``Alc3StreamReader`` add the length-prefixed
`.alcs3` file framing with the same crash-safe resume property as the
`.alcs` stream (utils/stream.py): every ALC3 container is self-contained,
so a truncated tail never corrupts recovery.
"""

from __future__ import annotations

import struct
from collections import deque
from pathlib import Path
from typing import Iterable, Iterator

import numpy as np

from .alc3 import Alc3Codec, DeviceChunk
from .core import DEFAULT_CHUNK_SIZE
from .errors import InvalidBitstream
from .parallel.batch import chunk_frames

__all__ = [
    "encode_stream",
    "decode_stream",
    "Alc3StreamWriter",
    "Alc3StreamReader",
]

_MAGIC = b"ALS3"
_VERSION = 1
_HEADER = _MAGIC + bytes([_VERSION, 0, 0, 0])


def encode_stream(
    frames,
    codec: Alc3Codec | None = None,
    *,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    lookahead: int = 2,
    **codec_kwargs,
) -> Iterator[bytes]:
    """Encode (N, H, W, 3) uint8 frames into a stream of ALC3 containers.

    Yields one serialized single-chunk container per ``chunk_size``-frame
    chunk (the final partial chunk is padded by repeating the last frame,
    reference padding convention).  Encodes are dispatched up to
    ``lookahead`` chunks ahead of the serialization point, so the
    device→host fetch inside :meth:`Alc3Codec.to_bytes` overlaps the next
    chunks' device compute.

    ``codec_kwargs`` construct a default :class:`Alc3Codec` when ``codec``
    is not given (quality/wavelet/sparse/...).
    """
    if codec is None:
        codec = Alc3Codec(**codec_kwargs)
    batch, _n = chunk_frames(frames, chunk_size)
    pending: deque[DeviceChunk] = deque()
    for i in range(batch.shape[0]):
        pending.append(codec.encode(batch[i]))  # async dispatch
        if len(pending) > max(lookahead, 0):
            yield Alc3Codec.to_bytes(pending.popleft())
    while pending:
        yield Alc3Codec.to_bytes(pending.popleft())


def decode_stream(
    containers: Iterable[bytes],
    *,
    lookahead: int = 2,
    exact: bool = False,
) -> Iterator[np.ndarray]:
    """Decode a stream of ALC3 containers into (T, H, W, 3) uint8 chunks.

    The mirror of :func:`encode_stream`: container ``i+1`` is parsed,
    uploaded and its decode dispatched before chunk ``i``'s pixels are
    fetched, overlapping host parsing/upload with device decode.
    """
    pending: deque = deque()
    for data in containers:
        codec, chunks = Alc3Codec.from_bytes(data)
        for ch in chunks:
            pending.append(codec.decode(ch, exact=exact))  # async dispatch
            if len(pending) > max(lookahead, 0):
                yield np.asarray(pending.popleft())
    while pending:
        yield np.asarray(pending.popleft())


class Alc3StreamWriter:
    """Append-only `.alcs3` stream writer with crash-safe resume.

    Format: ``"ALS3" | version u8 | reserved[3]`` then per chunk
    ``u32 LE length | ALC3 container bytes``.
    """

    def __init__(self, path, *, resume: bool = False):
        self._path = Path(path)
        # resume must survive a crash ANYWHERE in the previous run —
        # including before the 8-byte header finished writing.  A file
        # shorter than the header (or never created) simply starts fresh;
        # a wrong magic/version is a genuine error and still raises.
        if (resume and self._path.exists()
                and self._path.stat().st_size >= len(_HEADER)):
            reader = Alc3StreamReader(self._path)
            n = sum(1 for _ in reader)
            self.containers_written = n
            with open(self._path, "r+b") as fh:
                fh.truncate(reader.valid_end)  # drop any partial tail
            self._fh = open(self._path, "ab")
        else:
            self._fh = open(self._path, "wb")
            self._fh.write(_HEADER)
            self.containers_written = 0

    def append(self, container: bytes) -> None:
        self._fh.write(struct.pack("<I", len(container)))
        self._fh.write(container)
        self.containers_written += 1

    def flush(self) -> None:
        self._fh.flush()

    def close(self) -> None:
        self._fh.close()

    def __enter__(self) -> "Alc3StreamWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class Alc3StreamReader:
    """Iterate the complete containers of an `.alcs3` stream.

    ``valid_end`` reports the byte offset after the last complete
    container — the resume point for :class:`Alc3StreamWriter`.
    """

    def __init__(self, path):
        self._path = Path(path)
        data = self._path.read_bytes()
        if len(data) < len(_HEADER) or data[:4] != _MAGIC:
            raise InvalidBitstream("bad .alcs3 stream header")
        if data[4] != _VERSION:
            raise InvalidBitstream(f"unsupported .alcs3 version: {data[4]}")
        self._data = data
        self.valid_end = len(_HEADER)

    def __iter__(self) -> Iterator[bytes]:
        data, off = self._data, len(_HEADER)
        while off + 4 <= len(data):
            (length,) = struct.unpack_from("<I", data, off)
            if off + 4 + length > len(data):
                break  # truncated tail: stop at the last complete container
            yield data[off + 4 : off + 4 + length]
            off += 4 + length
            self.valid_end = off
