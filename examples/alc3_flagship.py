"""ALC3 flagship-path demo: the fully device-resident TPU codec.

Mirrors examples/basic_encode.py (reference examples/basic_encode.rs)
through the ALC3 path, exercising the mode matrix: fixed-step, RDO,
deep-lossless, sparse, and multi-level.

Run: JAX_PLATFORMS=cpu python examples/alc3_flagship.py   (CPU interpret)
     python examples/alc3_flagship.py                     (real TPU)
"""

import numpy as np

from alice_codec_tpu import Alc3Codec
from alice_codec_tpu.metrics import psnr


def synthetic(t=4, h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    i = np.arange(t * h * w).reshape(t, h, w)
    v = ((i * 7) % 256).astype(np.uint8)
    rgb = np.stack([v, v + 30, v + 60], axis=-1).astype(np.uint8)
    return np.clip(rgb + rng.integers(0, 8, rgb.shape), 0, 255).astype(np.uint8)


def main():
    rgb = synthetic()
    raw = rgb.size

    for name, codec in [
        ("fixed q=50", Alc3Codec(quality=50, wavelet="cdf53", s_seg=8)),
        ("rdo   q=50", Alc3Codec(quality=50, wavelet="cdf53", s_seg=8, rdo=True)),
        ("sparse q=50", Alc3Codec(quality=50, wavelet="cdf53", s_seg=8, sparse=True)),
        ("2-level q=50", Alc3Codec(quality=50, wavelet="cdf53", s_seg=8, levels=2)),
        ("deep  q=100", Alc3Codec(quality=100, wavelet="cdf53", s_seg=8)),
    ]:
        chunk = codec.encode(rgb)
        exact = codec.quality >= 100
        out = codec.decode(chunk, exact=exact, as_numpy=True)
        data = Alc3Codec.to_bytes(chunk)
        _, chunks2 = Alc3Codec.from_bytes(data)
        out2 = codec.decode(chunks2[0], exact=exact, as_numpy=True)
        assert np.array_equal(out, out2), "container roundtrip mismatch"
        db = psnr(rgb.reshape(-1), out.reshape(-1))
        lossless = " (bit-exact)" if np.array_equal(out, rgb) else ""
        print(f"{name:13s} {raw:8d} -> {len(data):7d} bytes "
              f"({raw / len(data):5.2f}x)  PSNR {db:6.2f} dB{lossless}")


if __name__ == "__main__":
    main()
