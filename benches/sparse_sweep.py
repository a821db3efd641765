"""On-chip sweep of the sparse compact/expand kernel variants at the
north-star's production geometry and density.

The round-4 stage profile puts compact at ~106 ms and expand at ~90 ms
of a ~320 ms 1080p×64 roundtrip — both are >100× off their HBM bound,
i.e. entirely per-tile-overhead-bound.  This sweep measures every
(algo, unroll, v_blk, skip_empty) point on the real chip so the
defaults are chosen from data, at the bench content's measured density
(luma 23% nonzero pixels / 73% nonzero bitmap bytes; chroma all-zero).

Usage: python benches/sparse_sweep.py [--small] [--expand]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax as _jax

_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(x):
    return np.asarray(x[(0,) * x.ndim])


def _time(fn, *args, iters=3, warmup=1, **kw):
    import jax

    for _ in range(warmup):
        _sync(jax.tree.leaves(fn(*args, **kw))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
        _sync(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def run():
    small = "--small" in sys.argv
    do_expand = "--expand" in sys.argv
    import jax.numpy as jnp

    from alice_codec_tpu.ops.pallas.sparse_kernels import (
        BLOCK_ROWS, block_value_rows, compact_pallas, expand_pallas,
        value_row_bases,
    )
    from alice_codec_tpu.ops.sparse_spec import pack_bitmap

    nb = 8 if small else 2032
    p = nb * BLOCK_ROWS * 128
    rng = np.random.default_rng(0)
    luma = np.where(rng.random(p) < 0.77, 0,
                    rng.integers(1, 256, size=p)).astype(np.uint8)
    sp = np.stack([luma, np.zeros(p, np.uint8), np.zeros(p, np.uint8)])
    sp_j = jnp.asarray(sp)
    bm = jnp.asarray(np.stack([pack_bitmap(sp[c]) for c in range(3)]))
    kr = int(np.asarray(block_value_rows(sp_j)).max()) + 8
    kr = -(-kr // 8) * 8
    vbase, _ = value_row_bases(bm, p, kr)
    _sync(vbase)
    bms = vals = None

    # targeted point list (tunnel compiles are minutes each — a full
    # cartesian sweep is infeasible; pick the informative corners)
    algos = [a for a in ("search", "butterfly", "dot")
             if f"--{a}" in sys.argv] or ["butterfly", "dot"]
    unrolls = (2,) if "--u2" in sys.argv else (2, 4)
    print(f"p={p} nb={nb} kr={kr} (density luma 23%)", flush=True)
    for algo in algos:
        for unroll in unrolls:
            for v_blk in (16,):
                if nb % v_blk:
                    continue
                for skip in (True,):
                    try:
                        t = _time(
                            compact_pallas, sp_j, vbase, p=p, kr=kr,
                            v_blk=v_blk, unroll=unroll, skip_empty=skip,
                            algo=algo)
                    except Exception as e:  # noqa: BLE001
                        print(f"compact {algo:10s} u={unroll} v={v_blk} "
                              f"skip={int(skip)}  FAIL {type(e).__name__}",
                              flush=True)
                        continue
                    print(f"compact {algo:10s} u={unroll} v={v_blk} "
                          f"skip={int(skip)}  {t*1e3:8.1f} ms "
                          f"{3*p/t/1e6:7.0f} Msym/s", flush=True)
                    if bms is None:
                        bms, vals = compact_pallas(
                            sp_j, vbase, p=p, kr=kr, v_blk=v_blk)
    if do_expand and bms is not None:
        for unroll in (2, 4):
            for v_blk in (8, 16):
                if nb % v_blk:
                    continue
                for skip in (True, False):
                    try:
                        t = _time(
                            expand_pallas, bms, vals, vbase, p=p, kr=kr,
                            v_blk=v_blk, unroll=unroll, skip_empty=skip)
                    except Exception as e:  # noqa: BLE001
                        print(f"expand  u={unroll} v={v_blk} "
                              f"skip={int(skip)}  FAIL {type(e).__name__}",
                              flush=True)
                        continue
                    print(f"expand  u={unroll} v={v_blk} "
                          f"skip={int(skip)}  {t*1e3:8.1f} ms "
                          f"{3*p/t/1e6:7.0f} Msym/s", flush=True)


if __name__ == "__main__":
    run()
