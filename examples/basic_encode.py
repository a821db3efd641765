"""Basic encode/decode example (mirror of reference examples/basic_encode.rs).

Builds a 64×64×4 RGB gradient, encodes at quality 50, decodes, and reports
size + PSNR.
"""

from __future__ import annotations

import numpy as np

import alice_codec_tpu as alc


def main() -> None:
    width, height, frames = 64, 64, 4

    # Gradient test pattern (reference examples/basic_encode.rs:15-27)
    x = np.arange(width, dtype=np.int32)
    y = np.arange(height, dtype=np.int32)
    t = np.arange(frames, dtype=np.int32)
    r = (x[None, None, :] * 4 + t[:, None, None] * 16) % 256
    g = (y[None, :, None] * 4) % 256
    b = np.full((frames, height, width), 128, np.int32)
    rgb = np.stack(np.broadcast_arrays(r, g, b), axis=-1).astype(np.uint8).reshape(-1)

    encoder = alc.FrameEncoder(quality=50)
    chunk = encoder.encode(rgb, width, height, frames)
    print(f"raw size:        {rgb.size} bytes")
    print(f"compressed size: {chunk.compressed_size} bytes")
    print(f"ratio:           {rgb.size / chunk.compressed_size:.2f}x")

    decoded = alc.FrameDecoder().decode(chunk)
    print(f"PSNR:            {alc.psnr(rgb, decoded):.2f} dB")


if __name__ == "__main__":
    main()
