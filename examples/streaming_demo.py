"""Pipelined streaming demo: frames → chunked ALC3 stream → frames.

Shows the bounded-lookahead overlap API (alice_codec_tpu/streaming.py):
while the host serializes chunk i's container, the device is already
encoding chunks i+1..i+lookahead.  The `.alcs3` file is crash-safe —
re-running with resume=True continues after the last complete container.

Run: JAX_PLATFORMS=cpu python examples/streaming_demo.py   (CPU interpret)
     python examples/streaming_demo.py                     (real TPU)
"""

import os
import tempfile

import numpy as np

from alice_codec_tpu import (
    Alc3Codec,
    Alc3StreamReader,
    Alc3StreamWriter,
    decode_stream,
    encode_stream,
)


def synthetic(n=12, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    x = np.arange(w, dtype=np.int32)[None, None, :, None]
    tt = np.arange(n, dtype=np.int32)[:, None, None, None]
    base = (x * 5 + tt * 11) % 256
    noise = rng.integers(0, 12, size=(n, h, w, 1), dtype=np.int32)
    return np.broadcast_to(
        np.clip(base + noise, 0, 255).astype(np.uint8), (n, h, w, 3)
    ).copy()


def main():
    frames = synthetic()
    codec = Alc3Codec(quality=90, sparse=True, s_seg=8)
    path = os.path.join(tempfile.mkdtemp(), "demo.alcs3")

    # encode → stream file (device compute overlaps host serialization)
    with Alc3StreamWriter(path) as writer:
        for container in encode_stream(frames, codec, chunk_size=4):
            writer.append(container)
    print(f"wrote {writer.containers_written} containers "
          f"({os.path.getsize(path)} bytes) to {path}")

    # stream file → decode (host parsing overlaps device decode)
    chunks = list(decode_stream(Alc3StreamReader(path)))
    out = np.concatenate(chunks)[: frames.shape[0]]
    mse = np.mean((out.astype(np.float64) - frames) ** 2)
    psnr = 10 * np.log10(255.0**2 / mse) if mse else float("inf")
    print(f"decoded {out.shape[0]} frames, PSNR {psnr:.2f} dB")


if __name__ == "__main__":
    main()
