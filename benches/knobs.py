"""On-chip knob sweep: rANS kernel v_seg and sparse kernel v_blk.

Measures encode/decode_words_pallas at v_seg ∈ {2,4,8,16} and
compact/expand_pallas at v_blk ∈ {1,2,4,8} at production scale
(s_seg=2048, 512 segments; 128 compaction blocks), to pick
per-direction defaults.

Usage: python benches/knobs.py [--small]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# jax.config, not env: the rig's sitecustomize imports jax at interpreter
# startup so env vars here arrive too late (see bench.main).
import jax as _jax

_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(x):
    return np.asarray(x[(0,) * x.ndim])


def _time(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        _sync(jax_tree_first(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        _sync(jax_tree_first(out))
    return (time.perf_counter() - t0) / iters


def jax_tree_first(out):
    import jax

    return jax.tree.leaves(out)[0]


def main():
    small = "--small" in sys.argv
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.ops import rans
    from alice_codec_tpu.ops.pallas.rans3_kernels import (
        decode_words_pallas, encode_words_pallas)
    from alice_codec_tpu.ops.pallas.sparse_kernels import (
        BLOCK_ROWS, block_value_rows, compact_pallas, expand_pallas,
        value_row_bases)

    rng = np.random.default_rng(0)

    s_seg = 256 if small else 2048
    n_seg = 32 if small else 512
    n = n_seg * s_seg * 128
    syms = np.minimum(rng.geometric(0.3, size=n) - 1, 255).astype(np.uint8)
    hist = np.bincount(syms, minlength=256).astype(np.uint32)
    table = rans.FrequencyTable.from_histogram(hist, sanitize=True)
    freqs = jnp.asarray(table.freqs.astype(np.int32)[None])
    cums = jnp.asarray(table.cums.astype(np.int32)[None])
    segs = jnp.asarray(syms.reshape(n_seg, s_seg, 128).astype(np.int32))
    jax.block_until_ready(segs)
    _ = np.asarray(segs[0, 0, 0])
    print("warm", file=sys.stderr, flush=True)

    if "--sparse-only" in sys.argv:
        _sparse_sweep(rng, small)
        return

    streams8, counts8 = encode_words_pallas(segs, freqs, cums, v_seg=8)
    for v in (2, 4, 8, 16):
        if n_seg % v:
            continue
        t_e = _time(lambda s, vv=v: encode_words_pallas(
            s, freqs, cums, v_seg=vv), segs)
        print(f"encode v_seg={v:2d}  {n / t_e / 1e6:7.0f} Msym/s", flush=True)
    for v in (2, 4, 8, 16):
        if n_seg % v:
            continue
        t_d = _time(lambda st, c, vv=v: decode_words_pallas(
            st, c, freqs, cums, s_seg=s_seg, v_seg=vv), streams8, counts8)
        print(f"decode v_seg={v:2d}  {n / t_d / 1e6:7.0f} Msym/s", flush=True)

    _sparse_sweep(rng, small)


def _sparse_sweep(rng, small):
    import jax.numpy as jnp

    from alice_codec_tpu.ops.pallas.sparse_kernels import (
        BLOCK_ROWS, block_value_rows, compact_pallas, expand_pallas,
        value_row_bases)
    from alice_codec_tpu.ops.sparse_spec import pack_bitmap

    nb = 8 if small else 128
    p = nb * BLOCK_ROWS * 128
    sp = np.where(rng.random((3, p)) < 0.85, 0,
                  rng.integers(1, 256, size=(3, p))).astype(np.uint8)
    sp_j = jnp.asarray(sp)
    kr = int(np.asarray(block_value_rows(sp_j)).max()) + 8
    kr = -(-kr // 8) * 8

    bm = jnp.asarray(np.stack([pack_bitmap(sp[c]) for c in range(3)]))
    vbase, _ = value_row_bases(bm, p, kr)
    bms, vals = compact_pallas(sp_j, vbase, p=p, kr=kr, v_blk=4)
    for v in (1, 2, 4, 8, 16):
        if nb % v:
            continue
        t_c = _time(lambda s, vv=v: compact_pallas(
            s, vbase, p=p, kr=kr, v_blk=vv), sp_j)
        print(f"compact v_blk={v:2d}  {3 * p / t_c / 1e6:7.0f} Msym/s",
              flush=True)
    for v in (1, 2, 4, 8, 16):
        if nb % v:
            continue
        t_x = _time(lambda b, vv, vv2=v: expand_pallas(
            b, vv, vbase, p=p, kr=kr, v_blk=vv2), bms, vals)
        print(f"expand  v_blk={v:2d}  {3 * p / t_x / 1e6:7.0f} Msym/s",
              flush=True)
    for algo in ("search", "dot", "butterfly"):
        t_c = _time(lambda s, aa=algo: compact_pallas(
            s, vbase, p=p, kr=kr, algo=aa), sp_j)
        print(f"compact algo={algo:6s}  {3 * p / t_c / 1e6:7.0f} Msym/s",
              flush=True)
    for se in (True, False):
        for un in (1, 2, 4, 8):
            t_c = _time(lambda s, uu=un, ss=se: compact_pallas(
                s, vbase, p=p, kr=kr, unroll=uu, skip_empty=ss), sp_j)
            print(f"compact skip={int(se)} u={un}  "
                  f"{3 * p / t_c / 1e6:7.0f} Msym/s", flush=True)
            t_x = _time(lambda b, vv, uu=un, ss=se: expand_pallas(
                b, vv, vbase, p=p, kr=kr, unroll=uu, skip_empty=ss),
                bms, vals)
            print(f"expand  skip={int(se)} u={un}  "
                  f"{3 * p / t_x / 1e6:7.0f} Msym/s", flush=True)


if __name__ == "__main__":
    main()
