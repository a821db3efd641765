"""North-star benchmark + the BASELINE 5-config harness.

Default (no args): the driver's north-star line — 1080p×64-frame
chunks/sec/chip (encode+decode) through the flagship ALC3 fused codec
(alice_codec_tpu/alc3.py: two jitted device programs per chunk; rANS runs
in the lane-major Pallas kernels).  Prints ONE JSON line.

``python bench.py --config N`` (N in 1..5) runs the BASELINE.md config
matrix instead (each also prints one JSON line):

1. Haar lossless encode/decode round-trip, 320×240×8 RGB
2. CDF 5/3 lossy ENCODE at q=90, 1080p×64, AnalyticalRDO device path
3. CDF 9/7 archival sweep q=50..95 with on-device PSNR/SSIM
4. Interleaved rANS batched decode of a multi-chunk `.alc` stream
   (bitstream-compatible wire format)
5. Rate-controlled streaming 4K pipeline (rate_control + segment)

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
# Kept as the vs_baseline denominator for cross-round continuity even
# though the targets are aspirational: the reference pipeline MEASURED
# single-core on this rig's CPU with identical content does 0.0573
# chunks/s (BASELINE_MEASURED.json; alice_codec_tpu/native/baseline_ref.cpp)
# — the detail field vs_measured_single_core reports that honest ratio.
_BASELINE_CHUNKS_PER_SEC = 1.0 / (64 / 100.0 + 64 / 500.0)


def _measured_baseline(key="north_star_serial"):
    """Measured single-core chunks/s from BASELINE_MEASURED.json (or None)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE_MEASURED.json")
    try:
        with open(path) as fh:
            return float(
                json.load(fh)["results"][key]["chunks_per_sec"])
    except Exception:
        return None


def _test_chunk(t, h, w, seed=0):
    """Synthetic COLOR video: moving luminance gradient + sensor noise +
    piecewise-constant color regions.

    Three requirements shaped this generator:

    * **Honest color.**  A grayscale chunk (identical channels) has
      all-zero Co/Cg planes, which lets the sparse encoder elide two of
      the three channels and would flatter every number.  (The
      reference's own benchmark content IS grayscale — a pure ``(i*7) %
      256`` gradient, examples/basic_encode.rs:21-25 — so any color
      content at all is strictly harder than the baseline's.)
    * **Realistic chroma statistics.**  Real chroma is piecewise-smooth:
      color changes at object boundaries and is flat inside them, and
      camera noise is predominantly luminance.  Modeled as a coarse
      random color field (64 px × 16-frame blocks, ±32 amplitude) —
      sharp color edges at region boundaries, compressible interiors.
      Measured symbol densities at q=90/CDF 5/3: Y ≈ 23 %, Co ≈ 10 %,
      Cg ≈ 9 % — chroma ≈ 40 % of luma, matching natural content.  An
      earlier revision used per-channel gradient SLOPES instead, whose
      misaligned %256 wrap edges made chroma as dense as luma (22 % vs
      23 %) — no real video keeps dense high-frequency chroma edges
      disjoint from its luma edges.
    * **Deterministic** per (shape, seed) so every round benches
      identical bytes (the C++ baseline reads the same array from disk).
    """
    rng = np.random.default_rng(seed)
    x = np.arange(w, dtype=np.int32)[None, None, :, None]
    y = np.arange(h, dtype=np.int32)[None, :, None, None]
    tt = np.arange(t, dtype=np.int32)[:, None, None, None]
    base = (x * 3 + y * 2 + tt * 7) % 256
    noise = rng.integers(0, 16, size=(t, h, w, 1), dtype=np.int32)
    blk, tblk = 64, 16
    gt, gh, gw = -(-t // tblk), -(-h // blk), -(-w // blk)
    field = rng.integers(-32, 33, size=(gt, gh, gw, 3), dtype=np.int32)
    color = (field.repeat(tblk, 0)[:t].repeat(blk, 1)[:, :h]
             .repeat(blk, 2)[:, :, :w])
    return np.clip(base + noise + color, 0, 255).astype(np.uint8)


def _stage(arr):
    import jax
    import jax.numpy as jnp

    out = jax.device_put(jnp.asarray(arr))
    jax.block_until_ready(out)
    return out


def _sync(x):
    """Fetch one element — the only reliable completion barrier on the
    dev rig (block_until_ready can return before the tunneled runtime
    finishes executing).  Scalar indexing, not reshape: a flatten would
    compile a full-array-output program, which can trip the HBM
    accounting right after a high-watermark decode."""
    import numpy as np

    return np.asarray(x[(0,) * x.ndim])


def _emit(metric, value, unit, vs_baseline, **detail):
    print(json.dumps({
        "metric": metric,
        "value": round(float(value), 4),
        "unit": unit,
        "vs_baseline": round(float(vs_baseline), 3),
        "detail": detail,
    }))


# ── north star (default) ────────────────────────────────────────


def north_star():
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.alc3 import Alc3Codec

    t, h, w = 64, 1080, 1920
    if os.environ.get("ALC_BENCH_SMALL"):  # quick smoke mode
        t, h, w = 16, 270, 480
    n_iters = int(os.environ.get("ALC_BENCH_ITERS", "3"))

    # Input staged on device once (production hosts feed chunks by DMA at
    # tens of GB/s; this rig's development tunnel runs at ~35 MB/s and
    # would otherwise dominate the measurement).  Compressed data stays
    # HBM-resident in the ALC3 representation — fetching it is container
    # serialization, benchmarked separately (config 4 benches the
    # host-interchange .alc path).
    print("staging input...", file=sys.stderr, flush=True)
    rgb = _stage(_test_chunk(t, h, w))
    print("input staged", file=sys.stderr, flush=True)

    sparse = os.environ.get("ALC_BENCH_DENSE") != "1"
    # Chunks per dispatch: ALC_BENCH_BATCH > 1 routes through
    # encode_batch/decode_batch (one phase-1 grid + one compact/entropy
    # grid + one decode grid per B chunks).  Default is 1: at 1080p×64
    # the B=2 batch measured 1.05 chunks/s vs 1.52 per-chunk on v5e —
    # doubling the live coefficient volumes (2×~0.8 GB i16 + stream
    # buffers) pressures HBM enough that XLA serializes the grids, so
    # batching only pays below ~0.5 MP frames.  Back-to-back per-chunk
    # dispatches already pipeline (the timed loop never syncs between
    # chunks).
    batch = int(os.environ.get("ALC_BENCH_BATCH", "1"))
    codec = Alc3Codec(quality=90, wavelet="cdf53", sparse=sparse)
    print("warmup (compiling)...", file=sys.stderr, flush=True)
    # TWO warmup roundtrips: the sparse encoder's zero-channel elision
    # cache means the first encode runs the all-channels program and
    # every later encode runs the elided-set program — a single warmup
    # iteration would leave the steady-state programs to compile INSIDE
    # the timed loop (which is exactly what sank the round-4 recorded
    # number: ~200 s of in-loop tunnel compiles).
    for _ in range(2):
        if batch > 1:
            rgbb = jnp.broadcast_to(rgb[None], (batch,) + rgb.shape)
            chunks = codec.encode_batch(rgbb)
            out = codec.decode_batch(chunks)[0]
            comp = chunks[0].compressed_size
        else:
            chunk = codec.encode(rgb)
            out = codec.decode(chunk)
            comp = chunk.compressed_size
        _sync(out)
    print("warmup done", file=sys.stderr, flush=True)

    # Sustained pipelined throughput: all iterations are dispatched
    # back-to-back and ONE final fetch forces completion (device programs
    # execute in dispatch order, so the last output transitively syncs
    # the whole stream) — per-iteration fetches would insert a host↔chip
    # round trip between chunks that a production pipeline doesn't have.
    start = time.perf_counter()
    for _ in range(n_iters):
        if batch > 1:
            cs = codec.encode_batch(rgbb)
            outs = codec.decode_batch(cs)
            out = outs[0]
        else:
            c = codec.encode(rgb)
            out = codec.decode(c)
    _sync(out)
    elapsed = time.perf_counter() - start
    n_iters *= batch

    mse = float(jnp.mean(
        (out.astype(jnp.float32) - rgb.astype(jnp.float32)) ** 2))
    chunks_per_sec = n_iters / elapsed
    measured = _measured_baseline()
    _emit(
        "1080p64_chunks_per_sec_encode_decode",
        chunks_per_sec, "chunks/s/chip",
        chunks_per_sec / _BASELINE_CHUNKS_PER_SEC,
        shape=[1, t, h, w],
        iters=n_iters,
        elapsed_s=round(elapsed, 3),
        compression_ratio=round(rgb.size / max(comp, 1), 2),
        psnr_db=round(10 * np.log10(255.0**2 / mse), 2) if mse else None,
        baseline_chunks_per_sec=round(_BASELINE_CHUNKS_PER_SEC, 4),
        measured_single_core_chunks_per_sec=measured,
        vs_measured_single_core=(
            round(chunks_per_sec / measured, 2) if measured else None),
        codec="alc3",
        device=str(jax.devices()[0]),
    )


# ── BASELINE configs ────────────────────────────────────────────


def config1_haar_lossless():
    """Haar lossless round-trip, 320×240×8 (examples/basic_encode.rs)."""
    import jax

    from alice_codec_tpu.alc3 import Alc3Codec

    t, h, w = 8, 240, 320
    rgb_np = _test_chunk(t, h, w)
    rgb = _stage(rgb_np)
    codec = Alc3Codec(quality=100, wavelet="haar")
    out = codec.decode(codec.encode(rgb), exact=True, as_numpy=True)
    assert np.array_equal(out, rgb_np), "lossless roundtrip NOT bit-exact"

    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        c = codec.encode(rgb)
        o = codec.decode(c, exact=True)
        _sync(o)
    elapsed = time.perf_counter() - start
    comp = c.compressed_size
    _emit(
        "haar_lossless_320x240x8_chunks_per_sec",
        n_iters / elapsed, "chunks/s",
        (n_iters / elapsed) / _BASELINE_CHUNKS_PER_SEC,
        bit_exact=True,
        compression_ratio=round(rgb_np.size / max(comp, 1), 2),
        iters=n_iters,
    )


def config2_rdo_encode():
    """CDF 5/3 lossy ENCODE at q=90, 1080p×64, AnalyticalRDO device path."""
    import jax

    from alice_codec_tpu.alc3 import Alc3Codec

    t, h, w = 64, 1080, 1920
    rgb = _stage(_test_chunk(t, h, w))
    codec = Alc3Codec(quality=90, wavelet="cdf53", rdo=True)
    chunk = codec.encode(rgb)  # compile
    _sync(chunk.counts)

    n_iters = 5
    start = time.perf_counter()
    for _ in range(n_iters):
        c = codec.encode(rgb)
        _sync(c.counts)
    elapsed = time.perf_counter() - start
    fps = n_iters * t / elapsed
    _emit(
        "rdo_cdf53_q90_1080p_encode_fps",
        fps, "frames/s",
        fps / 100.0,  # reference target: 100 fps encode @1080p
        chunks_per_sec=round(n_iters / elapsed, 4),
        band_steps_y=[int(s) for s in c.band_steps[0]],
        compression_ratio=round(rgb.size / max(c.compressed_size, 1), 2),
        iters=n_iters,
    )


def config3_cdf97_sweep():
    """CDF 9/7 archival sweep q=50..95 with on-device PSNR/SSIM."""
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.alc3 import Alc3Codec
    from alice_codec_tpu.metrics import psnr_device
    from alice_codec_tpu.ssim import ssim_device

    t, h, w = 64, 1080, 1920
    if os.environ.get("ALC_BENCH_SMALL"):
        t, h, w = 16, 270, 480
    rgb = _stage(_test_chunk(t, h, w))

    qualities = list(range(50, 96, 5))
    rows = []
    total = 0.0
    for q in qualities:
        codec = Alc3Codec(quality=q, wavelet="cdf97")
        start = time.perf_counter()
        chunk = codec.encode(rgb)
        out = codec.decode(chunk)
        _sync(out)
        elapsed = time.perf_counter() - start
        bpp = 8.0 * chunk.compressed_size / (t * h * w)
        del chunk  # free the stream buffers before the metric programs
        # on-device quality metrics on the center frame (full-chunk f32
        # temporaries would crowd HBM alongside the stream buffers)
        mid = t // 2
        p = float(psnr_device(
            rgb[mid].reshape(-1), out[mid].reshape(-1)))
        s = float(ssim_device(
            rgb[mid, :, :, 1].astype(jnp.float32),
            out[mid, :, :, 1].astype(jnp.float32),
        ))
        del out
        total += elapsed
        rows.append({
            "q": q,
            "psnr_db": round(p, 2),
            "ssim": round(s, 4),
            "bpp": round(bpp, 4),
            "roundtrip_s": round(elapsed, 3),
        })
    # first iteration includes compile; steady-state = rest
    steady = len(qualities) - 1
    cps = steady / sum(r["roundtrip_s"] for r in rows[1:])
    _emit(
        "cdf97_sweep_q50_95_chunks_per_sec",
        cps, "chunks/s",
        cps / _BASELINE_CHUNKS_PER_SEC,
        sweep=rows,
        monotone_psnr=all(
            rows[i + 1]["psnr_db"] >= rows[i]["psnr_db"] - 0.1
            for i in range(len(rows) - 1)
        ),
    )


def config4_alc_batched_decode():
    """Interleaved rANS batched decode of a multi-chunk `.alc` stream.

    Wire format is the bitstream-compatible `.alc` (serial byte rANS per
    channel), so this measures the compat path: N-way interleaved device
    decode via BatchFrameDecoder."""
    import jax

    from alice_codec_tpu.parallel.batch import (
        BatchFrameDecoder,
        BatchFrameEncoder,
    )

    # Nominal BASELINE.md shape: a multi-chunk 1080p stream (VERDICT r2
    # weak #3 asked for the full-scale measurement; ALC_BENCH_SMALL keeps
    # the quick 270p smoke shape).  The per-iteration payload upload
    # rides this rig's ~35 MB/s development tunnel — production hosts
    # DMA at PCIe rates — so the recorded number includes that tax.
    b, t, h, w = 4, 64, 1080, 1920
    if os.environ.get("ALC_BENCH_SMALL"):
        b, t, h, w = 4, 16, 270, 480
    batch = _stage(np.stack([_test_chunk(t, h, w, seed=i) for i in range(b)]))
    # scan device coder: the ALC2 Pallas kernels need the per-lane step
    # count to divide the sublane tile, which this shape doesn't satisfy
    encoder = BatchFrameEncoder(
        quality=90, wavelet="cdf53", device_entropy=True, n_lanes=4096,
    )
    # pallas_entropy engages the byte-lane kernel (lane steps are now
    # 8-aligned at every shape); silently falls back to the scan coder
    # if the tile check fails
    decoder = BatchFrameDecoder(device_entropy=True, pallas_entropy=True)
    stream = encoder.encode(batch)
    out = decoder.decode(stream, as_numpy=False)
    _sync(out)

    n_iters = 3
    start = time.perf_counter()
    for _ in range(n_iters):
        out = decoder.decode(stream, as_numpy=False)
        _sync(out)
    elapsed = time.perf_counter() - start
    cps = n_iters * b / elapsed
    _emit(
        "alc_batched_decode_chunks_per_sec",
        cps, "chunks/s",
        cps * (t / 64) / (500.0 / 64),  # reference target: 500 fps decode
        shape=[b, t, h, w],
        wire="alc-compatible",
        iters=n_iters,
    )


def config5_rate_controlled_4k():
    """Rate-controlled streaming 4K pipeline (rate_control + segment),
    chunk stream sharded over the ICI mesh when >1 device is attached."""
    import jax

    from alice_codec_tpu.alc3 import Alc3Codec
    from alice_codec_tpu.rate_control import RateControlConfig, RateController
    from alice_codec_tpu.segment import segment_by_motion

    t, h, w = 16, 2160, 3840
    n_chunks = 6
    rgb = _stage(_test_chunk(t, h, w))

    ctrl = RateController(RateControlConfig(
        target_bitrate_kbps=60_000, framerate=30.0))
    codecs = {}

    # warmup compile at the starting quality; the compressed_size fetch
    # also warms the dev rig's first-host-transfer hook, which otherwise
    # stalls ~90 s inside the timed loop
    q0 = ctrl.recommended_quality
    codecs[q0] = Alc3Codec(quality=q0, wavelet="cdf53")
    c = codecs[q0].encode(rgb)
    _ = c.compressed_size

    qualities = []
    start = time.perf_counter()
    for i in range(n_chunks):
        q = ctrl.recommended_quality
        qualities.append(q)
        codec = codecs.setdefault(q, Alc3Codec(quality=q, wavelet="cdf53"))
        chunk = codec.encode(rgb)
        size_bits = chunk.compressed_size * 8
        for _ in range(t):
            ctrl.update(size_bits // t)
    elapsed = time.perf_counter() - start
    fps = n_chunks * t / elapsed
    # person segmentation across two decoded frames (the aux-codec stage)
    frames = np.asarray(codecs[qualities[-1]].decode(chunk, as_numpy=True))
    res = segment_by_motion(
        frames[1, :, :, 1].reshape(-1), frames[0, :, :, 1].reshape(-1), w, h
    )
    _emit(
        "rate_controlled_4k_encode_fps",
        fps, "frames/s",
        fps / 100.0,
        qualities=qualities,
        final_bitrate_kbps=round(size_bits / (t / 30.0) / 1000, 1),
        segment_fg_pixels=res.foreground_count,
        n_devices=jax.device_count(),
    )


def main() -> None:
    # Persistent compile cache: XLA programs for the 1080p bench shapes are
    # pre-populated in-repo (.jax_cache) so a cold run skips the ~10 min of
    # remote Mosaic/XLA compiles; fresh compiles are written back to it.
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    # jax.config.update, NOT env vars: the dev rig's sitecustomize imports
    # jax at interpreter startup, so env set here is read too late and the
    # cache silently stays "disabled/not initialized".  Threshold 0 because
    # the tunnel defers real compilation — locally-measured compile times
    # sit under the default 1 s write threshold and nothing would persist.
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      cache if os.path.isdir(cache) else "/tmp/alc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    cfg = 0
    if "--config" in sys.argv:
        cfg = int(sys.argv[sys.argv.index("--config") + 1])
    cfg = int(os.environ.get("ALC_BENCH_CONFIG", cfg))
    [north_star, config1_haar_lossless, config2_rdo_encode,
     config3_cdf97_sweep, config4_alc_batched_decode,
     config5_rate_controlled_4k][cfg]()


if __name__ == "__main__":
    sys.exit(main())
