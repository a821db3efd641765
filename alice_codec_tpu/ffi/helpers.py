"""Plain-bytes helpers the C ABI shim calls via embedded CPython.

Keeps the C++ side free of NumPy/JAX marshalling: everything crossing the
boundary is bytes + ints.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from ..errors import CodecError
from ..pipeline import EncodedChunk, FrameDecoder, FrameEncoder

# JAX work must not run on the C-callback thread state created by the shim's
# PyGILState_Ensure (blocking in XLA's CPU client deadlocks there); run it on
# a normal Python worker thread — the caller's .result() wait releases the
# GIL correctly.
_pool = ThreadPoolExecutor(max_workers=1)


def _run(fn, *args):
    return _pool.submit(fn, *args).result()


def encode(quality: int, rgb: bytes, width: int, height: int, frames: int):
    """Returns an EncodedChunk object or None on codec error."""

    def impl():
        try:
            return FrameEncoder(quality=quality).encode(
                np.frombuffer(rgb, np.uint8), width, height, frames
            )
        except CodecError:
            return None

    return _run(impl)


def decode(chunk: EncodedChunk):
    """Returns RGB bytes or None on codec error."""

    def impl():
        try:
            return FrameDecoder().decode(chunk).tobytes()
        except CodecError:
            return None

    return _run(impl)


def chunk_to_bytes(chunk: EncodedChunk) -> bytes:
    return chunk.to_bytes()


def chunk_from_bytes(data: bytes):
    try:
        return EncodedChunk.from_bytes(data)
    except CodecError:
        return None


def chunk_dims(chunk: EncodedChunk):
    return int(chunk.width), int(chunk.height), int(chunk.frames)
