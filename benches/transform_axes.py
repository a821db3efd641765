"""Per-axis wavelet pass timing at 1080p — which axis pass is slow?

Times forward_1d/inverse_1d along W (lanes), H (sublanes), T (outer) on
the (3, 64, 1080, 1920) int32 volume, plus color+pad, quantize+zigzag,
and the new MXU histogram, all fetch-synced.

Usage: python benches/transform_axes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from alice_codec_tpu.core import WaveletType
    from alice_codec_tpu.ops import quant
    from alice_codec_tpu.ops.wavelet import forward_1d, inverse_1d

    shape = (3, 64, 1080, 1920)
    x = jnp.asarray(
        np.random.default_rng(0).integers(-1000, 1000, shape, np.int32))
    jax.block_until_ready(x)
    _ = np.asarray(x[0, 0, 0, 0])  # warm first fetch
    print("warm", file=sys.stderr)

    wt = WaveletType.CDF53

    def timed(name, fn, *args, n=3):
        out = fn(*args)
        _ = np.asarray(out[(0,) * out.ndim])
        t0 = time.perf_counter()
        for _i in range(n):
            out = fn(*args)
            _ = np.asarray(out[(0,) * out.ndim])
        dt = (time.perf_counter() - t0) / n
        print(f"{name:28s} {dt*1000:8.1f} ms", flush=True)
        return out

    for ax, nm in ((-1, "W (lanes)"), (-2, "H (sublanes)"), (-3, "T (outer)")):
        f = jax.jit(lambda v, a=ax: forward_1d(v, wt, axis=a))
        timed(f"fwd  {nm}", f, x)
        g = jax.jit(lambda v, a=ax: inverse_1d(v, wt, axis=a))
        timed(f"inv  {nm}", g, x)

    q = jax.jit(lambda v: quant.to_symbols(
        quant.quantize(v, jnp.int32(8), jnp.int32(8))))
    sym = timed("quantize+zigzag", q, x)
    h = jax.jit(lambda s: jax.vmap(quant.build_histogram)(s.reshape(3, -1)))
    hh = h(sym)
    _ = np.asarray(hh[0, 0])
    t0 = time.perf_counter()
    for _i in range(3):
        hh = h(sym)
        _ = np.asarray(hh[0, 0])
    print(f"{'histogram (MXU)':28s} {(time.perf_counter()-t0)/3*1000:8.1f} ms")

    from alice_codec_tpu.ops import color
    rgbu8 = jnp.asarray(np.random.default_rng(1).integers(
        0, 256, (64, 1080, 1920, 3), np.uint8))
    jax.block_until_ready(rgbu8)
    c = jax.jit(lambda r: jnp.stack(color.rgb_to_ycocg_r(r)).astype(jnp.int32))
    timed("color to planes", c, rgbu8)


if __name__ == "__main__":
    main()
