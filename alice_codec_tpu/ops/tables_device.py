"""On-device frequency-table normalization (sanitized variant).

Bit-exact jit port of ``FrequencyTable.from_histogram(sanitize=True)``
(ops/rans.py; reference normalization math src/rans.rs:102-150 plus the
overflow sanitization documented there), so the fused device encode/decode
programs never synchronize with the host to build entropy tables: the
histogram computed on device feeds straight into the device rANS coders,
and the decoder rebuilds the identical table from the header histogram.

Integer exactness notes:

* ``floor(count·PROB_SCALE/total)`` would overflow int32 (count up to
  ~10^8), so the quotient is produced by a PROB_BITS-step shift-subtract
  long division in uint32 — exact for any ``total < 2^31``.
* The sanitize excess-removal loop (take from the argmax until the sum
  fits PROB_SCALE) is a ``lax.while_loop`` with first-max argmax — the
  same tie-breaking as ``np.argmax``.

PROB_BITS comes from the ALC3 wire spec (ops/rans_word.py — 11 bits
since wire v6); the `.alc`-compat path builds its 12-bit tables on the
host (ops/rans.py FrequencyTable) and does not use this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rans_word import PROB_BITS, PROB_SCALE

__all__ = ["freq_table_device"]


def _div_scale_floor(h: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    """Exact ``floor(h * PROB_SCALE / total)`` for uint32 h < total < 2^31.

    Long division: the quotient has at most PROB_BITS bits because
    h < total ⇒ h·4096/total < 4096.
    """
    r = h.astype(jnp.uint32)
    t = total.astype(jnp.uint32)
    q = jnp.zeros_like(r)
    for bit in range(PROB_BITS - 1, -1, -1):
        r = r << 1
        ge = r >= t
        r = jnp.where(ge, r - t, r)
        q = jnp.where(ge, q | jnp.uint32(1 << bit), q)
    return q.astype(jnp.int32)


@jax.jit
def freq_table_device(hist: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(256,) histogram → (freqs, cums) int32, each (256,).

    Matches ``ops.rans_word.freq_table_words`` exactly (ALC3 wire v7):
    zero-count symbols get frequency 0 (absent-symbol promise — see the
    spec's docstring), present symbols at least 1, oversubscription is
    drained from the current argmax, the argmax absorbs any remaining
    rounding deficit, and cums are the exclusive prefix sum.  An all-zero
    histogram yields the uniform table (all 8s for 256 symbols at
    PROB_BITS=11).
    """
    h = hist.astype(jnp.uint32)
    total = h.sum(dtype=jnp.uint32)
    freqs = jnp.where(
        h > 0,
        jnp.maximum(_div_scale_floor(h, jnp.maximum(total, 1)), 1),
        0,
    )

    def drain(carry):
        f, excess = carry
        imax = jnp.argmax(f)  # first max, like np.argmax
        take = jnp.minimum(excess, f[imax] - 1)
        return f.at[imax].add(-take), excess - take

    def cond(carry):
        f, excess = carry
        take = jnp.minimum(excess, f[jnp.argmax(f)] - 1)
        return (excess > 0) & (take > 0)

    excess = freqs.sum() - PROB_SCALE
    freqs, _ = jax.lax.while_loop(cond, drain, (freqs, excess))

    deficit = PROB_SCALE - freqs.sum()
    freqs = freqs.at[jnp.argmax(freqs)].add(deficit)
    cums = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(freqs)[:-1]])

    uniform = jnp.full_like(freqs, PROB_SCALE // 256)
    uniform_cums = jnp.arange(256, dtype=jnp.int32) * (PROB_SCALE // 256)
    is_zero = total == 0
    return (
        jnp.where(is_zero, uniform, freqs),
        jnp.where(is_zero, uniform_cums, cums),
    )
