"""Per-kernel breakdown of sparse phase 1 at 1080p×64 on the chip.

phase1 = color+pad (XLA) → spatial lift (Pallas) → temporal lift +
quantize + zigzag (Pallas) → block_value_rows (XLA).  stagebreak times
the fused program; this times each piece so the optimization target is
the real one (round 4: phase1 sat at ~83 ms through both the i16 and
the roll/register changes — something inside doesn't move).

Usage: python benches/phase1_probe.py [--small]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax as _jax

_jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _sync(x):
    import jax

    return np.asarray(jax.tree.leaves(x)[0][(0,) * jax.tree.leaves(x)[0].ndim])


def _time(name, fn, *args, iters=3):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt*1000:9.1f} ms", flush=True)
    return dt


def main():
    small = "--small" in sys.argv
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.core import WaveletType, padded_dims
    from alice_codec_tpu.ops.pallas import lift_kernels as lk
    from alice_codec_tpu.ops.pallas.sparse_kernels import block_value_rows
    from alice_codec_tpu.pipeline import _color_pad
    from bench import _test_chunk

    t, h, w = (16, 270, 480) if small else (64, 1080, 1920)
    padded = padded_dims(w, h, t)
    wt = WaveletType.CDF53
    rgb = jax.device_put(jnp.asarray(_test_chunk(t, h, w)))
    jax.block_until_ready(rgb)
    _ = np.asarray(rgb[0, 0, 0, 0])
    print(f"shape {t}x{h}x{w}", file=sys.stderr, flush=True)

    cp = jax.jit(partial(_color_pad, padded=padded, dtype=jnp.int16))
    _time("color+pad (XLA, u8->i16)", cp, rgb)
    chans = cp(rgb)

    steps = lk._steps(wt, inverse=False, exact=False)
    spatial = jax.jit(lk._spatial_call(chans.shape, jnp.int16, steps,
                                       (1, 0), False))
    _time("spatial lift kernel (W then H)", spatial, chans)
    sp = spatial(chans)

    temporal = jax.jit(lk._temporal_call(
        chans.shape, jnp.int16, partial(lk._temporal_quant_kernel, steps),
        jnp.uint8, 2, False))
    q = jnp.stack([jnp.full((3,), 8, jnp.int32), jnp.full((3,), 8, jnp.int32)])
    _time("temporal lift+quant kernel", temporal, sp, q)
    sym = temporal(sp, q).reshape(3, -1)

    _time("block_value_rows (XLA)", jax.jit(block_value_rows), sym)

    # and the pure temporal (no quant fusion) for reference
    temporal_plain = jax.jit(lk._temporal_call(
        chans.shape, jnp.int16, partial(lk._temporal_kernel, steps),
        jnp.int16, 0, False))
    _time("temporal lift only", temporal_plain, sp)




def compact_floor():
    """Floor probe: compact_pallas on an all-zero plane set (every tile
    skipped) isolates the grid/IO/bitmap baseline from the compaction
    math; a dense plane at the same geometry gives the math's share."""
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.ops.pallas.sparse_kernels import (
        BLOCK_ROWS, block_value_rows, compact_pallas, value_row_bases)
    from alice_codec_tpu.ops.sparse_spec import pack_bitmap

    rng = np.random.default_rng(0)
    nb = 512
    p = nb * BLOCK_ROWS * 128
    for name, dens in (("zeros", 0.0), ("d=0.23", 0.23), ("dense", 1.0)):
        sp = np.where(rng.random((3, p)) < 1 - dens, 0,
                      rng.integers(1, 256, size=(3, p))).astype(np.uint8)
        sp_j = jax.device_put(jnp.asarray(sp))
        jax.block_until_ready(sp_j)
        kr = max(8, int(np.asarray(block_value_rows(sp_j)).max()))
        kr = -(-kr // 8) * 8
        bm = jnp.asarray(np.stack([pack_bitmap(sp[c]) for c in range(3)]))
        vbase, _ = value_row_bases(bm, p, kr)
        _time(f"compact {name}", partial(
            compact_pallas, p=p, kr=kr), sp_j, vbase)


if __name__ == "__main__":
    compact_floor() if "--floor" in sys.argv else main()
