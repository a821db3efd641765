"""Per-stage timing breakdown of the ALC3 1080p×64 roundtrip on the chip.

Times each device program of the flagship dense path separately
(fetch-synced — see bench.py _sync), so round-3 optimization targets the
真 bottleneck instead of a guess:

    transform+quantize+symbolize+hist | tables | pallas encode |
    pallas decode | inverse transform | (sparse stages when --sparse)

Usage: python benches/stagebreak.py [--small] [--iters N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    return np.asarray(x[(0,) * x.ndim])


def main():
    small = "--small" in sys.argv
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 3

    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.alc3 import (
        DEFAULT_S_SEG, _encode_chunk, _entropy_decode_jit, _pick_v_seg,
        _segment_geometry, _table_hists,
    )
    from alice_codec_tpu.core import padded_dims
    from alice_codec_tpu.ops.pallas.rans3_kernels import (
        NG, decode_words_pallas, encode_words_pallas,
    )
    from alice_codec_tpu.ops.tables_device import freq_table_device
    from alice_codec_tpu.pipeline import decode_device, encode_device
    from bench import _test_chunk

    t, h, w = (16, 270, 480) if small else (64, 1080, 1920)
    s_seg = DEFAULT_S_SEG
    padded = padded_dims(w, h, t)
    p = int(np.prod(padded))
    n_seg, m = _segment_geometry(p, s_seg)
    v_seg = _pick_v_seg(n_seg)
    step = jnp.int32(8)

    rgb = jax.device_put(jnp.asarray(_test_chunk(t, h, w)))
    jax.block_until_ready(rgb)
    # warm the dev rig's first-host-transfer hook OUTSIDE timed regions
    # (measured ~250 s stall on the first fetch in a process)
    t0 = time.perf_counter()
    _ = np.asarray(rgb[0, 0, 0, 0])
    print(f"first-fetch warm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    print(f"shape {t}x{h}x{w} p={p} n_seg={n_seg} v_seg={v_seg}", file=sys.stderr)

    import functools

    @functools.partial(jax.jit, static_argnames=("padded",))
    def stage_transform(rgb, step, *, padded):
        return encode_device(rgb, step, step, wavelet_type=1, padded=padded)

    from alice_codec_tpu.core import WaveletType
    wt = WaveletType.CDF53

    def timed(name, fn, *args, sync=None, n=iters, **kw):
        out = fn(*args, **kw)
        tree = jax.tree.leaves(out)
        _sync(tree[0] if sync is None else sync(out))
        start = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
            tree = jax.tree.leaves(out)
            _sync(tree[0] if sync is None else sync(out))
        dt = (time.perf_counter() - start) / n
        print(f"{name:36s} {dt*1000:9.1f} ms", flush=True)
        return out, dt

    # encode stages
    enc_t = functools.partial(
        encode_device, wavelet_type=wt, padded=padded)
    (symbols, hists), t_fwd = timed("fwd transform+quant+sym+hist", enc_t, rgb, step, step)

    def tables(hists):
        return jax.jit(jax.vmap(freq_table_device))(
            _table_hists(hists, p, s_seg=s_seg, v_seg=v_seg))
    (fc), t_tab = timed("freq tables", tables, hists)
    freqs, cums = fc

    def seg(symbols):
        sym = symbols.astype(jnp.int32)
        if m != p:
            sym = jnp.pad(sym, ((0, 0), (0, m - p)))
        return sym.reshape(3 * n_seg, s_seg, NG)
    seg_j = jax.jit(seg)
    sym_seg, t_seg = timed("segment reshape/pad", seg_j, symbols)

    (streams_counts), t_enc = timed(
        "pallas encode kernel", encode_words_pallas, sym_seg, freqs, cums,
        v_seg=v_seg)
    streams, counts = streams_counts

    # decode stages
    out_sym, t_dec = timed(
        "pallas decode kernel (incl tables)", _entropy_decode_jit,
        streams, counts, hists, padded=padded, s_seg=s_seg, v_seg=v_seg)

    steps3 = jnp.full((3,), 8, jnp.int32)
    dec_t = functools.partial(
        decode_device, wavelet_type=wt, dims=(w, h, t), padded=padded)
    _, t_inv = timed("inverse transform", dec_t, out_sym, steps3, steps3)

    # full fused paths for reference
    codec_roundtrip = None
    print("-" * 50)
    print(f"encode total ~ {1000*(t_fwd+t_tab+t_seg+t_enc):.1f} ms; "
          f"decode total ~ {1000*(t_dec+t_inv):.1f} ms")
    nsym = 3 * p
    print(f"entropy encode {nsym/t_enc/1e6:.0f} Msym/s, "
          f"decode(+tables) {nsym/t_dec/1e6:.0f} Msym/s")


if __name__ == "__main__":
    main()
