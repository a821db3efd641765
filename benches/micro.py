"""Micro-benchmarks mirroring the reference criterion suite
(reference: benches/wavelet.rs): haar/cdf53 1D-1024, cdf53 2D-64², cdf53
3D-32²×8, quantize-4096 — plus rANS encode/decode throughput.

Usage: python benches/micro.py [--device cpu|tpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(out):
    """Fetch one element — block_until_ready can return before the
    tunneled runtime finishes on the dev rig (ROUND_NOTES)."""
    x = out[0] if isinstance(out, (tuple, list)) else out
    return np.asarray(x[(0,) * x.ndim])


def _time(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        _sync(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - start) / iters


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default=None, choices=["cpu", "tpu"])
    args = parser.parse_args()
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/alc_jax_cache")

    import jax.numpy as jnp

    from alice_codec_tpu.core import WaveletType
    from alice_codec_tpu.ops import quant, rans
    from alice_codec_tpu.ops.wavelet import _fwd1, _fwd2, _fwd3, _inv1

    rng = np.random.default_rng(0)
    results = {}

    sig = jnp.asarray(rng.integers(-512, 512, 1024).astype(np.int32))
    for wt, name in ((WaveletType.HAAR, "haar_1d_1024"),
                     (WaveletType.CDF53, "cdf53_1d_1024")):
        results[f"{name}_forward"] = _time(lambda s, w=wt: _fwd1(s, wavelet=w), sig)
        results[f"{name}_inverse"] = _time(lambda s, w=wt: _inv1(s, wavelet=w), sig)

    img = jnp.asarray(rng.integers(-512, 512, (64, 64)).astype(np.int32))
    results["cdf53_2d_64x64_forward"] = _time(
        lambda x: _fwd2(x, wavelet=WaveletType.CDF53), img
    )

    vol = jnp.asarray(rng.integers(-512, 512, (8, 32, 32)).astype(np.int32))
    results["cdf53_3d_32x32x8_forward"] = _time(
        lambda x: _fwd3(x, wavelet=WaveletType.CDF53), vol
    )

    import jax

    coeffs = jnp.asarray(rng.integers(-1000, 1000, 4096).astype(np.int32))
    qfn = jax.jit(lambda x: quant.quantize(x, 16, 16))
    results["quantize_4096"] = _time(qfn, coeffs)

    # host rANS throughput (MB/s of symbols)
    syms = np.minimum(rng.geometric(0.2, size=4 << 20) - 1, 255).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    # sanitized table: the reference-exact one overflows on this skew
    table = rans.FrequencyTable.from_histogram(hist, sanitize=True)
    t0 = time.perf_counter()
    enc = rans.RansEncoder()
    enc.encode_symbols(syms, table)
    data = enc.finish()
    t_enc = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = rans.RansDecoder(data).decode_n(len(syms), table)
    t_dec = time.perf_counter() - t0
    assert np.array_equal(out, syms)
    results["rans_encode_MBps"] = len(syms) / t_enc / 1e6
    results["rans_decode_MBps"] = len(syms) / t_dec / 1e6

    # ALC3 segment-kernel throughput (Msym/s); small geometry so the CPU
    # interpret path stays tractable — on TPU raise SSEG/NSEG for the
    # production numbers (2048/512 measured 880/578 Msym/s on v5e)
    from alice_codec_tpu.ops.pallas.rans3_kernels import (
        decode_words_pallas,
        encode_words_pallas,
    )

    s_seg = int(os.environ.get("ALC_MICRO_SSEG", "16"))
    n_seg = int(os.environ.get("ALC_MICRO_NSEG", "8"))  # v_seg=8 multiple
    n = n_seg * s_seg * 128
    seg_syms = np.minimum(
        rng.geometric(0.3, size=n) - 1, 255).astype(np.uint8)
    seg_hist = np.bincount(seg_syms, minlength=256).astype(np.uint32)
    seg_table = rans.FrequencyTable.from_histogram(seg_hist, sanitize=True)
    freqs = jnp.asarray(seg_table.freqs.astype(np.int32)[None])
    cums = jnp.asarray(seg_table.cums.astype(np.int32)[None])
    segs = jnp.asarray(seg_syms.reshape(n_seg, s_seg, 128).astype(np.int32))

    t_e = _time(lambda s: encode_words_pallas(s, freqs, cums), segs,
                iters=3, warmup=1)
    streams, counts = encode_words_pallas(segs, freqs, cums)
    t_d = _time(
        lambda st, c: decode_words_pallas(st, c, freqs, cums, s_seg=s_seg),
        streams, counts, iters=3, warmup=1)
    results["alc3_encode_Msym_per_s"] = n / t_e / 1e6
    results["alc3_decode_Msym_per_s"] = n / t_d / 1e6

    # ALC3 sparse compact/expand kernel throughput (Msym/s of PLANE
    # symbols moved).  One 512-row block per plane by default — raise
    # ALC_MICRO_SPARSE_BLOCKS on TPU for production numbers.
    from alice_codec_tpu.ops.pallas.sparse_kernels import (
        BLOCK_ROWS,
        block_value_rows,
        compact_pallas,
        expand_pallas,
        value_row_bases,
    )

    nb = int(os.environ.get("ALC_MICRO_SPARSE_BLOCKS", "1"))
    v_blk = 4 if nb % 4 == 0 else 1
    p = nb * BLOCK_ROWS * 128
    sp = np.where(rng.random((3, p)) < 0.85, 0,
                  rng.integers(1, 256, size=(3, p))).astype(np.uint8)
    sp_j = jnp.asarray(sp)
    kr = int(np.asarray(block_value_rows(sp_j)).max()) + 8
    kr = -(-kr // 8) * 8
    from alice_codec_tpu.ops.sparse_spec import pack_bitmap

    bm = jnp.asarray(np.stack([pack_bitmap(sp[c]) for c in range(3)]))
    vbase, _ = value_row_bases(bm, p, kr)
    t_c = _time(
        lambda s: compact_pallas(s, vbase, p=p, kr=kr, v_blk=v_blk),
        sp_j, iters=3, warmup=1)
    bms, vals = compact_pallas(sp_j, vbase, p=p, kr=kr, v_blk=v_blk)
    t_x = _time(
        lambda b, v: expand_pallas(b, v, vbase, p=p, kr=kr, v_blk=v_blk),
        bms, vals, iters=3, warmup=1)
    results["sparse_compact_Msym_per_s"] = 3 * p / t_c / 1e6
    results["sparse_expand_Msym_per_s"] = 3 * p / t_x / 1e6

    for k, v in results.items():
        if k.endswith("MBps"):
            print(f"{k:36s} {v:10.1f} MB/s")
        elif k.endswith("Msym_per_s"):
            print(f"{k:36s} {v:10.1f} Msym/s")
        else:
            print(f"{k:36s} {v * 1e6:10.2f} µs")


if __name__ == "__main__":
    main()
