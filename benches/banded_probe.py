"""Probe: band-major (parity-deinterleaved) symbol order for dense ALC3.

Measures, at 1080p×64 q=90 on the north-star content:
  1. cost of the XLA 3-axis parity permutation of the u8 symbol plane
     (both directions);
  2. fraction of 2048·128-symbol segments that are all-zero under the
     interleaved vs band-major order (elision hit rate);
  3. dense entropy encode+decode time on the band-major plane with
     zero-segment elision.

Usage: python benches/banded_probe.py [--small]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    small = "--small" in sys.argv
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.alc3 import (
        Alc3Codec, _segment_geometry, _table_hists, HIST_STRIDE)
    from alice_codec_tpu.core import WaveletType, padded_dims
    from alice_codec_tpu.ops.pallas.rans3_kernels import (
        NG, decode_words_pallas, encode_words_pallas)
    from alice_codec_tpu.ops.quant import build_histogram
    from alice_codec_tpu.ops.tables_device import freq_table_device
    from alice_codec_tpu.pipeline import _hist_sample, _transform_symbols
    from bench import _test_chunk

    t, h, w = (16, 270, 480) if small else (64, 1080, 1920)
    padded = padded_dims(w, h, t)
    pw, ph, pf = padded
    p = pw * ph * pf
    codec = Alc3Codec(quality=90, wavelet="cdf53", sparse=False)
    s_seg = codec.s_seg
    step = jnp.int32(codec.step)

    rgb = jax.device_put(jnp.asarray(_test_chunk(t, h, w)))
    jax.block_until_ready(rgb)
    _ = np.asarray(rgb[0, 0, 0, 0])
    print("warm", file=sys.stderr, flush=True)

    def timed(name, fn, *args, n=3):
        out = fn(*args)
        x = jax.tree.leaves(out)[0]
        _ = np.asarray(x[(0,) * x.ndim])
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn(*args)
            x = jax.tree.leaves(out)[0]
            _ = np.asarray(x[(0,) * x.ndim])
        dt = (time.perf_counter() - t0) / n
        print(f"{name:40s} {dt*1000:9.1f} ms", flush=True)
        return out, dt

    sym_fn = jax.jit(lambda r: _transform_symbols(
        r, step, step, wavelet_type=WaveletType.CDF53, padded=padded,
        interleaved=True))
    sym = jax.block_until_ready(sym_fn(rgb))  # (3, P) u8, interleaved order

    # T+H parity split only: W (the minor axis) stays put, so the
    # transpose is a sublane-level copy, not a lane shuffle.  3 of the 4
    # (t,h)-parity groups are temporally/spatially high — mostly zero.
    @jax.jit
    def band_permute(s):
        v = s.reshape(3, pf // 2, 2, ph // 2, 2, pw)
        return v.transpose(0, 2, 4, 1, 3, 5).reshape(3, p)

    @jax.jit
    def band_unpermute(s):
        v = s.reshape(3, 2, 2, pf // 2, ph // 2, pw)
        return v.transpose(0, 3, 1, 4, 2, 5).reshape(3, p)

    bsym, t_perm = timed("band permute (3,P) u8", band_permute, sym)
    _, t_unperm = timed("band unpermute", band_unpermute, bsym)
    ok = bool(jnp.array_equal(band_unpermute(bsym), sym))
    print("permute roundtrip ok:", ok)

    # elision hit rates
    n_seg, m = _segment_geometry(p, s_seg)
    def elide_frac(s):
        pad = jnp.pad(s, ((0, 0), (0, m - p)))
        segs = pad.reshape(3 * n_seg, s_seg * NG)
        return float(jnp.mean(jnp.all(segs == 0, axis=-1)))
    print(f"segments/channel {n_seg}  all-zero frac: "
          f"interleaved {elide_frac(sym):.3f}  banded {elide_frac(bsym):.3f}")

    # dense entropy enc+dec on the banded plane
    hists = jax.vmap(build_histogram)(_hist_sample(bsym, HIST_STRIDE))
    th = _table_hists(hists, p, s_seg=s_seg)
    freqs, cums = jax.vmap(freq_table_device)(th)

    def enc(s):
        pad = jnp.pad(s.astype(jnp.int32), ((0, 0), (0, m - p)))
        return encode_words_pallas(
            pad.reshape(3 * n_seg, s_seg, NG), freqs, cums)

    (streams, counts), t_enc = timed("banded dense entropy encode", enc, bsym)
    cz = np.asarray(counts)
    print(f"elided segments on wire: {(cz == 0).sum()}/{cz.size}  "
          f"bytes {int(cz.sum())*2}")

    def dec(st, c):
        return decode_words_pallas(st, c, freqs, cums, s_seg=s_seg)

    _, t_dec = timed("banded dense entropy decode", dec, streams, counts)

    # same entropy on the INTERLEAVED plane for reference
    hists_i = jax.vmap(build_histogram)(_hist_sample(sym, HIST_STRIDE))
    fi, ci = jax.vmap(freq_table_device)(_table_hists(hists_i, p, s_seg=s_seg))

    def enc_i(s):
        pad = jnp.pad(s.astype(jnp.int32), ((0, 0), (0, m - p)))
        return encode_words_pallas(pad.reshape(3 * n_seg, s_seg, NG), fi, ci)

    (sti, cti), t_ei = timed("interleaved dense entropy encode", enc_i, sym)
    czi = np.asarray(cti)
    print(f"  interleaved elided: {(czi == 0).sum()}/{czi.size}  "
          f"bytes {int(czi.sum())*2}")
    _, t_di = timed("interleaved dense entropy decode",
                    lambda: decode_words_pallas(sti, cti, fi, ci,
                                                s_seg=s_seg))
    print("-" * 60)
    print(f"banded dense total: perm {1000*(t_perm+t_unperm):.0f} + "
          f"enc {1000*t_enc:.0f} + dec {1000*t_dec:.0f} ms")


if __name__ == "__main__":
    main()
