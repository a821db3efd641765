"""North-star benchmark: 1080p×64-frame chunks/sec/chip, encode+decode.

Runs the full TPU-native pipeline (device encode stage + N-way interleaved
rANS + device decode stage) on the real attached TPU chip and prints ONE
JSON line.

Baseline: the reference publishes targets only (BASELINE.md) — 100 fps
encode + 500 fps decode @1080p single-core ⇒ one 64-frame chunk costs
64/100 + 64/500 s = 0.768 s ⇒ 1.302 chunks/sec encode+decode.  The
driver-recorded `vs_baseline` is ours / 1.302.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Baseline chunks/sec from the reference's stated targets (BASELINE.md).
_BASELINE_CHUNKS_PER_SEC = 1.0 / (64 / 100.0 + 64 / 500.0)


def _test_chunks(b, t, h, w, seed=0):
    """Synthetic video: moving gradient + noise (compressible, nontrivial)."""
    rng = np.random.default_rng(seed)
    x = np.arange(w, dtype=np.int32)[None, None, :, None]
    y = np.arange(h, dtype=np.int32)[None, :, None, None]
    tt = np.arange(t, dtype=np.int32)[:, None, None, None]
    base = (x * 3 + y * 2 + tt * 7) % 256
    noise = rng.integers(0, 16, size=(t, h, w, 1), dtype=np.int32)
    one = np.clip(base + noise, 0, 255).astype(np.uint8)
    return np.broadcast_to(one, (b, t, h, w, 3)).copy()


def main() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/alc_jax_cache")
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.parallel.batch import BatchFrameDecoder, BatchFrameEncoder

    b = int(os.environ.get("ALC_BENCH_CHUNKS", "1"))
    t, h, w = 64, 1080, 1920
    if os.environ.get("ALC_BENCH_SMALL"):  # quick smoke mode
        t, h, w = 16, 270, 480

    # Input staged on device once (production hosts feed chunks by DMA at
    # tens of GB/s; this rig's development tunnel runs at ~35 MB/s and
    # would otherwise dominate the measurement).  Compressed bytes still
    # cross the host boundary every iteration — that is part of the codec.
    print("staging input...", file=sys.stderr, flush=True)
    batch = jax.device_put(jnp.asarray(_test_chunks(b, t, h, w)))
    jax.block_until_ready(batch)
    print("input staged", file=sys.stderr, flush=True)

    # device_entropy: rANS runs on-chip and only compressed bytes cross the
    # host boundary (the TPU-native path); ALC_BENCH_HOST_ENTROPY=1 benches
    # the OpenMP host coder instead.
    device_entropy = not os.environ.get("ALC_BENCH_HOST_ENTROPY")
    dec_device = device_entropy and not os.environ.get("ALC_BENCH_DEC_HOST")
    # Both Pallas rANS kernels (encode + decode) are the default measured
    # path (0.0296 chunks/s vs 0.027 for the lax.scan coders on this rig);
    # ALC_BENCH_PALLAS=0 falls back to the scan coders.  The encode
    # kernel's VMEM budget caps the Pallas path at 4096 lanes.
    use_pallas = os.environ.get("ALC_BENCH_PALLAS", "1") not in ("0", "false")
    lanes = int(os.environ.get("ALC_BENCH_LANES", "4096" if use_pallas else "8192"))
    encoder = BatchFrameEncoder(
        quality=90, wavelet="cdf53", device_entropy=device_entropy, n_lanes=lanes,
        pallas_entropy=use_pallas,
    )
    decoder = BatchFrameDecoder(
        device_entropy=dec_device, pallas_entropy=use_pallas and dec_device
    )

    # Warmup at the measured batch shape (single compile set; the
    # persistent compilation cache makes repeat runs fast).
    print("warmup encode...", file=sys.stderr, flush=True)
    warm = encoder.encode(batch)
    print("warmup decode...", file=sys.stderr, flush=True)
    decoder.decode(warm)
    jax.effects_barrier()
    print("warmup done", file=sys.stderr, flush=True)

    n_iters = int(os.environ.get("ALC_BENCH_ITERS", "3"))
    start = time.perf_counter()
    total_chunks = 0
    compressed = 0
    for _ in range(n_iters):
        stream = encoder.encode(batch)
        out = decoder.decode(stream, as_numpy=False)
        jax.block_until_ready(out)
        total_chunks += batch.shape[0]
        compressed += stream.compressed_size
    del out
    elapsed = time.perf_counter() - start

    chunks_per_sec = total_chunks / elapsed
    raw_bytes = batch.size
    print(
        json.dumps(
            {
                "metric": "1080p64_chunks_per_sec_encode_decode",
                "value": round(chunks_per_sec, 4),
                "unit": "chunks/s/chip",
                "vs_baseline": round(chunks_per_sec / _BASELINE_CHUNKS_PER_SEC, 3),
                "detail": {
                    "shape": [b, t, h, w],
                    "iters": n_iters,
                    "elapsed_s": round(elapsed, 3),
                    "compression_ratio": round(raw_bytes * n_iters / max(compressed, 1), 2),
                    "baseline_chunks_per_sec": round(_BASELINE_CHUNKS_PER_SEC, 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
