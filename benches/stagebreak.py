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

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# reuse the bench's persistent compile cache (fresh Mosaic/XLA compiles of
# the 1080p programs take ~10 min through the dev tunnel otherwise)
_cache = os.path.join(_REPO, ".jax_cache")
# jax.config.update, NOT env vars: the rig's sitecustomize imports jax at
# interpreter startup, so env set here arrives too late (see bench.main).
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    _cache if os.path.isdir(_cache) else "/tmp/alc_jax_cache",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def _sync(x):
    return np.asarray(x[(0,) * x.ndim])


def main():
    small = "--small" in sys.argv
    iters = int(sys.argv[sys.argv.index("--iters") + 1]) if "--iters" in sys.argv else 3
    if "--sparse" in sys.argv:
        return sparse_main(small, iters)

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


def sparse_main(small, iters):
    """Per-stage timing of the SPARSE path (the flagship default)."""
    import functools

    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.alc3 import (
        Alc3Codec, _encode_chunk_sparse, _pick_v_blk, _pick_v_seg,
        _segment_geometry, _sparse_entropy_expand, _sparse_pp,
    )
    from alice_codec_tpu.core import WaveletType, padded_dims
    from alice_codec_tpu.ops.pallas.sparse_kernels import (
        BLOCK_ROWS, block_geometry, compact_pallas, plane_row_bases,
    )
    from alice_codec_tpu.pipeline import decode_device, encode_sparse_phase1
    from bench import _test_chunk

    t, h, w = (16, 270, 480) if small else (64, 1080, 1920)
    padded = padded_dims(w, h, t)
    p = int(np.prod(padded))
    pp = _sparse_pp(p)
    wt = WaveletType.CDF53
    codec = Alc3Codec(quality=90, wavelet="cdf53", sparse=True)
    s_seg = codec.s_seg
    step = jnp.int32(codec.step)

    rgb = jax.device_put(jnp.asarray(_test_chunk(t, h, w)))
    jax.block_until_ready(rgb)
    t0 = time.perf_counter()
    _ = np.asarray(rgb[0, 0, 0, 0])
    print(f"first-fetch warm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    print(f"shape {t}x{h}x{w} p={p} pp={pp}", file=sys.stderr)

    def timed(name, fn, *args, n=iters, sync=None, **kw):
        def _s(out):
            x = sync(out) if sync is not None else jax.tree.leaves(out)[0]
            _sync(x)

        out = fn(*args, **kw)
        _s(out)
        start = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
            _s(out)
        dt = (time.perf_counter() - start) / n
        print(f"{name:36s} {dt*1000:9.1f} ms", flush=True)
        return out, dt

    # ── encode stages ────────────────────────────────────────────
    (sym_rows), t_p1 = timed(
        "phase1 transform+quant+sym+rows", encode_sparse_phase1,
        rgb, step, step, wavelet_type=wt, padded=padded, pp=pp,
        interleaved=True)
    symbols, ch_rows, _flags = sym_rows

    # warm the codec's kcap cache, then time phase 2 as dispatched
    chunk = codec.encode(rgb)
    krs = tuple(k // 128 for k in chunk.kcaps)
    nb_seg, _ = _segment_geometry(pp // 8, s_seg)
    _, t_p2 = timed(
        "phase2 compact+hists+tables+entropy", _encode_chunk_sparse,
        symbols, ch_rows, pp=pp, s_seg=s_seg, krs=krs,
        v_b=_pick_v_seg(nb_seg))

    # phase-2 internals: compact alone
    _, nbk = block_geometry(pp, BLOCK_ROWS)
    bases, _ = plane_row_bases(krs, BLOCK_ROWS)
    cnt = jnp.sum((symbols.reshape(3, nbk, BLOCK_ROWS // 8, 8 * 128) != 0
                   ).astype(jnp.int32), axis=-1)
    rows = jnp.sum(-(-cnt // 128), axis=-1)
    excl = jnp.minimum(jnp.cumsum(rows, axis=-1) - rows,
                       jnp.asarray(krs, jnp.int32)[:, None])
    vbase = (excl + jnp.asarray(bases, jnp.int32)[:, None]).reshape(-1)
    vbase = jax.block_until_ready(vbase)
    _, t_cp = timed(
        "  compact kernel alone", compact_pallas, symbols, vbase,
        p=pp, kr=krs, br=BLOCK_ROWS, v_blk=_pick_v_blk(nbk))

    # ── decode stages ────────────────────────────────────────────
    ent = functools.partial(
        jax.jit(_sparse_entropy_expand,
                static_argnames=("p", "s_seg", "kcaps", "v_b", "nc")),
        chunk.streams, chunk.counts, chunk.hists)
    (dsym), t_ee = timed(
        "entropy decode + expand", ent, p=p, s_seg=s_seg,
        kcaps=chunk.kcaps, v_b=_pick_v_seg(nb_seg))

    steps3 = jnp.full((3,), codec.step, jnp.int32)
    dec_t = functools.partial(
        decode_device, wavelet_type=wt, dims=(w, h, t), padded=padded,
        interleaved=True)
    _, t_inv = timed("inverse transform", dec_t, dsym, steps3, steps3)

    # full e2e for reference
    _, t_enc = timed("full encode()", codec.encode, rgb,
                     sync=lambda c: c.counts)
    _, t_dec = timed("full decode()", codec.decode, chunk)

    print("-" * 50)
    print(f"stage sum: encode {1000*(t_p1+t_p2):.1f} ms "
          f"decode {1000*(t_ee+t_inv):.1f} ms | "
          f"e2e encode {1000*t_enc:.1f} ms decode {1000*t_dec:.1f} ms")
    print(f"roundtrip (stage sum) {1000*(t_p1+t_p2+t_ee+t_inv):.1f} ms "
          f"=> {1/(t_p1+t_p2+t_ee+t_inv):.2f} chunks/s")


if __name__ == "__main__":
    main()
