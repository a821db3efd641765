"""Quantization, RDO, symbol mapping and histograms (JAX, TPU-native).

Re-implements the reference quantization layer bit-exactly:

* ``Quantizer``        — dead-zone quantizer, reference src/quant.rs:57-146
* ``FastQuantizer``    — magic-number division, reference src/quant.rs:171-332
* ``AnalyticalRDO``    — closed-form Laplacian RDO, reference src/quant.rs:377-505
* ``to_symbols``/``from_symbols`` — zigzag mapping incl. the u8 wrap quirk,
  reference src/quant.rs:547-590
* ``build_histogram``  — 256-bin histogram, reference src/quant.rs:594-600

Device functions (``quantize``, ``dequantize``, ``to_symbols``,
``from_symbols``, ``build_histogram``) are jittable jnp ops.  The host
classes (``Quantizer`` etc.) mirror the reference's object API and defer to
the same arithmetic.

TPU note: the reference's magic-number division is an x86 ``idiv``
workaround.  The Granlund–Montgomery round-up magic number used by the
reference (shift = 32 + ceil(log2(step)), reciprocal = ceil(2^shift/step))
is *exact* for all u32 inputs, so on device we use plain integer division —
it produces bit-identical results (the reference's own oracle test asserts
this equivalence, src/quant.rs:848-864).  ``FastQuantizer.quantize`` below
still evaluates the literal magic-number arithmetic (in uint64 NumPy) so the
equivalence is independently testable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import SubBand3D
from ..errors import InvalidQuantStep

__all__ = [
    "quantize",
    "dequantize",
    "to_symbols",
    "from_symbols",
    "to_symbols16",
    "from_symbols16",
    "build_histogram",
    "band_index_inter",
    "band_broadcast_inter",
    "quantize_bands_inter",
    "dequantize_bands_inter",
    "band_moments_inter",
    "band_broadcast",
    "quantize_bands",
    "dequantize_bands",
    "band_moments",
    "Quantizer",
    "FastQuantizer",
    "AnalyticalRDO",
    "quantize_subband",
    "dequantize_subband",
]


# ── Device (jnp) primitives ─────────────────────────────────────


def quantize(values: jnp.ndarray, step, dead_zone) -> jnp.ndarray:
    """Dead-zone quantize int32 coefficients.

    values in (-dead_zone, dead_zone) → 0; otherwise
    ``sign(v) * ((|v| - dead_zone/2) / step)`` with truncating division,
    matching reference src/quant.rs:89-97 exactly (Rust ``/`` truncates
    toward zero; both branches reduce to this abs form).
    """
    v = values.astype(jnp.int32)
    step = jnp.asarray(step, jnp.int32)
    dead_zone = jnp.asarray(dead_zone, jnp.int32)
    av = jnp.abs(v)
    # (av - dz/2) >= 0 whenever av >= dz, so floor == trunc on the live lane.
    q = (av - (dead_zone >> 1)) // step
    return jnp.where(av < dead_zone, 0, jnp.sign(v) * q)


def dequantize(qvalues: jnp.ndarray, step) -> jnp.ndarray:
    """Inverse of :func:`quantize`: ``q * step`` (reference src/quant.rs:104-110)."""
    return qvalues.astype(jnp.int32) * jnp.asarray(step, jnp.int32)


def to_symbols(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Zigzag signed→unsigned byte symbols: 0→0, n→2n-1, -n→2n.

    Reproduces the reference's ``as u8`` wrap for |2q| > 255
    (src/quant.rs:547-563) via an explicit mod-256 truncation.
    """
    c = coeffs.astype(jnp.int32)
    s = jnp.where(c > 0, 2 * c - 1, -2 * c)
    return (s & 0xFF).astype(jnp.uint8)


def from_symbols(symbols: jnp.ndarray) -> jnp.ndarray:
    """Inverse zigzag: 0→0, odd s→(s+1)/2, even s→-(s/2) (src/quant.rs:572-590)."""
    s = symbols.astype(jnp.int32)
    return jnp.where(s % 2 == 1, (s + 1) // 2, -(s // 2))


def to_symbols16(coeffs: jnp.ndarray) -> jnp.ndarray:
    """16-bit zigzag (ALC3 deep mode): the same mapping as
    :func:`to_symbols` but without the reference's u8 wrap, so any
    |q| ≤ 32767 survives — the escape mechanism that makes q=100
    end-to-end lossless on arbitrary content (the reference wraps at
    |q| > 127, src/quant.rs:558-559).  Returns int32 in [0, 65535]."""
    c = coeffs.astype(jnp.int32)
    s = jnp.where(c > 0, 2 * c - 1, -2 * c)
    return s & 0xFFFF


def from_symbols16(symbols: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_symbols16`."""
    s = symbols.astype(jnp.int32)
    return jnp.where(s % 2 == 1, (s + 1) // 2, -(s // 2))


def build_histogram(symbols: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of byte symbols, uint32 (src/quant.rs:594-600).

    Works on any shape; counts all elements.  Implemented as a rank-1
    one-hot factorization on the MXU: ``hist[16a+b] = Σ_i
    oh_hi[i,a]·oh_lo[i,b] = (oh_hiᵀ @ oh_lo)[a,b]`` — building two (N,16)
    nibble one-hots costs 32 VPU compares per symbol instead of the naive
    (N,256) form's 256, and the N-contraction rides the MXU.  The
    contraction is chunked so every f32 partial count stays ≤ 2²² (exact
    in f32); chunk partials accumulate in uint32 — counts are exact for
    any N (bit-compatible tables depend on it).
    """
    flat = symbols.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    if n == 0:
        return jnp.zeros(256, jnp.uint32)
    if n < (1 << 14):  # tiny inputs: the simple fused compare-reduce
        bins = jnp.arange(256, dtype=jnp.int32)
        onehot = (flat[:, None] == bins[None, :]).astype(jnp.uint32)
        return jnp.sum(onehot, axis=0, dtype=jnp.uint32)
    # chunk: big enough to amortize the MXU dispatch, but never larger
    # than the (128-aligned) input — a fixed 2^22 chunk would pad a
    # 200k-symbol plane 20× and build ~134 MB of dead one-hot temporaries
    chunk = min(1 << 22, -(-n // 128) * 128)
    pad = (-n) % chunk
    if pad:
        # pad with an out-of-range sentinel so padding counts nowhere
        flat = jnp.concatenate(
            [flat, jnp.full(pad, -1, jnp.int32)])
    k = flat.shape[0] // chunk
    f3 = flat.reshape(k, chunk)
    bins16 = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((f3 >> 4)[..., None] == bins16).astype(jnp.bfloat16)
    oh_lo = ((f3 & 15)[..., None] == bins16).astype(jnp.bfloat16)
    # (k, 16, chunk) × (k, chunk, 16) → (k, 16, 16); exact: operands are
    # 0/1 (bf16-exact) and partial sums ≤ 2^22 < 2^24
    parts = jax.lax.dot_general(
        oh_hi, oh_lo, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # the -1 sentinel misses both one-hots, so padding adds zero counts
    return jnp.sum(parts.astype(jnp.uint32), axis=0).reshape(256)


# ── Host object API (mirrors reference classes) ─────────────────


# ── Per-sub-band device primitives (AnalyticalRDO's device half) ─
#
# After one forward_3d level the 8 sub-bands are contiguous octants of the
# (T, H, W) volume ([low | high] per axis, reference src/wavelet.rs
# layout), so a per-band scalar becomes a per-element volume by a reshape
# to (..., 2, T/2, 2, H/2, 2, W/2) and a broadcast — no gather, no
# jnp.where over band masks; XLA fuses it into the consumer elementwise op.


def band_broadcast(values8: jnp.ndarray, vol_shape: tuple[int, ...]) -> jnp.ndarray:
    """Broadcast per-sub-band scalars to a transformed-volume layout.

    ``values8``: (..., 8) indexed by ``int(SubBand3D)`` (bits y, x, t —
    core.py); ``vol_shape``: target (..., T, H, W) with even T/H/W.
    Returns an int32 volume where each element holds its band's value.
    """
    t, h, w = vol_shape[-3:]
    ht, hh, hw = t // 2, h // 2, w // 2
    lead = values8.shape[:-1]
    # (..., 8) → (..., y2, x2, t2) → (..., t2, 1, y2, 1, x2, 1)
    v = values8.astype(jnp.int32).reshape(*lead, 2, 2, 2)
    v = jnp.moveaxis(v, -1, -3)  # (..., t2, y2, x2)
    v = v[..., :, None, :, None, :, None]
    vol = jnp.broadcast_to(v, (*lead, 2, ht, 2, hh, 2, hw))
    return vol.reshape(*lead, t, h, w)


def quantize_bands(coeffs: jnp.ndarray, steps8, dead_zones8) -> jnp.ndarray:
    """Dead-zone quantize with per-sub-band steps (AnalyticalRDO device
    path, reference manual pipeline src/quant.rs:472-524).

    ``coeffs``: (..., T, H, W) int32 transformed volume; ``steps8`` /
    ``dead_zones8``: (..., 8) int32.  Same arithmetic as :func:`quantize`
    per element — bit-equal to quantizing each extracted sub-band with its
    own ``Quantizer`` (the reference's FastQuantizer magic-number division
    is exact, so plain integer division matches it bit-for-bit).
    """
    step_v = band_broadcast(jnp.asarray(steps8), coeffs.shape)
    dz_v = band_broadcast(jnp.asarray(dead_zones8), coeffs.shape)
    return quantize(coeffs, step_v, dz_v)


def dequantize_bands(qcoeffs: jnp.ndarray, steps8) -> jnp.ndarray:
    """Inverse of :func:`quantize_bands`: per-band ``q * step``."""
    step_v = band_broadcast(jnp.asarray(steps8), qcoeffs.shape)
    return qcoeffs.astype(jnp.int32) * step_v


def band_index_inter(vol_shape: tuple[int, int, int]) -> jnp.ndarray:
    """Per-element SubBand3D index for the INTERLEAVED wavelet layout
    (wavelet.forward_3d_inter, single level): band bits come straight
    from index parity — bit y = h&1, x = w&1, t = t&1 (the same
    ``y*4 + x*2 + t`` order band_broadcast uses)."""
    t, h, w = vol_shape[-3:]
    it = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 0) & 1
    ih = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 1) & 1
    iw = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 2) & 1
    return ih * 4 + iw * 2 + it


def band_broadcast_inter(values8: jnp.ndarray,
                         vol_shape: tuple[int, ...]) -> jnp.ndarray:
    """Interleaved-layout :func:`band_broadcast`: per-band scalars to a
    volume via parity masks — 8 fused wheres, no gather, no reshape."""
    b = band_index_inter(vol_shape)
    v8 = jnp.asarray(values8).astype(jnp.int32)
    lead = v8.shape[:-1]
    out = jnp.zeros((*lead, *vol_shape[-3:]), jnp.int32)
    for k in range(8):
        out = jnp.where(b == k, v8[..., k, None, None, None], out)
    return out


def quantize_bands_inter(coeffs: jnp.ndarray, steps8, dead_zones8):
    """:func:`quantize_bands` for the interleaved layout."""
    step_v = band_broadcast_inter(jnp.asarray(steps8), coeffs.shape)
    dz_v = band_broadcast_inter(jnp.asarray(dead_zones8), coeffs.shape)
    return quantize(coeffs, step_v, dz_v)


def dequantize_bands_inter(qcoeffs: jnp.ndarray, steps8) -> jnp.ndarray:
    """:func:`dequantize_bands` for the interleaved layout."""
    step_v = band_broadcast_inter(jnp.asarray(steps8), qcoeffs.shape)
    return qcoeffs.astype(jnp.int32) * step_v


def band_moments_inter(coeffs: jnp.ndarray):
    """:func:`band_moments` for the interleaved layout: identical per-band
    sums (order-independent integer arithmetic) via parity masks."""
    import jax

    b = band_index_inter(coeffs.shape)
    with jax.enable_x64(True):
        c64 = coeffs.astype(jnp.int64)
        s1 = jnp.stack([
            jnp.sum(jnp.where(b == k, c64, 0), axis=(-3, -2, -1))
            for k in range(8)
        ], axis=-1)
        s2 = jnp.stack([
            jnp.sum(jnp.where(b == k, c64 * c64, 0), axis=(-3, -2, -1))
            for k in range(8)
        ], axis=-1)
    return s1, s2


def band_moments(coeffs: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact per-sub-band integer moments on device.

    ``coeffs``: (..., T, H, W) int32.  Returns ``(s1, s2)`` each (..., 8)
    int64 — sum and sum-of-squares per band (order-independent integer
    arithmetic, so host and device agree exactly; the per-band element
    count is ``T*H*W // 8``, static).  Feed
    :meth:`AnalyticalRDO.steps_from_moments`.
    """
    import jax

    t, h, w = coeffs.shape[-3:]
    ht, hh, hw = t // 2, h // 2, w // 2
    lead = coeffs.shape[:-3]
    v = coeffs.reshape(*lead, 2, ht, 2, hh, 2, hw)
    with jax.enable_x64(True):
        c = v.astype(jnp.int64)
        # reduce the half-dims → (..., t2, y2, x2)
        s1 = jnp.sum(c, axis=(-5, -3, -1))
        s2 = jnp.sum(c * c, axis=(-5, -3, -1))
    # (..., t2, y2, x2) → (..., y2, x2, t2) → (..., 8) in SubBand3D order
    s1 = jnp.moveaxis(s1, -3, -1).reshape(*lead, 8)
    s2 = jnp.moveaxis(s2, -3, -1).reshape(*lead, 8)
    return s1, s2


class Quantizer:
    """Dead-zone quantizer (reference src/quant.rs:57-146).

    >>> q = Quantizer(8)
    >>> q.quantize(20)
    2
    >>> q.dequantize(2)
    16
    """

    __slots__ = ("step", "dead_zone")

    def __init__(self, step: int, dead_zone: int | None = None):
        self.step = int(step)
        self.dead_zone = int(step if dead_zone is None else dead_zone)

    @classmethod
    def with_dead_zone(cls, step: int, dead_zone: int) -> "Quantizer":
        return cls(step, dead_zone)

    def quantize(self, value: int) -> int:
        av = abs(value)
        if av < self.dead_zone:
            return 0
        q = (av - (self.dead_zone >> 1)) // self.step
        return -q if value < 0 else q

    def dequantize(self, qvalue: int) -> int:
        return 0 if qvalue == 0 else qvalue * self.step

    def quantize_buffer(self, values: np.ndarray) -> np.ndarray:
        """Vectorized NumPy quantize (reference src/quant.rs:117-128)."""
        v = np.asarray(values, np.int32)
        av = np.abs(v)
        q = (av - (self.dead_zone >> 1)) // np.int32(self.step)
        return np.where(av < self.dead_zone, 0, np.sign(v) * q).astype(np.int32)

    def dequantize_buffer(self, qvalues: np.ndarray) -> np.ndarray:
        return (np.asarray(qvalues, np.int32) * np.int32(self.step)).astype(np.int32)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Quantizer(step={self.step}, dead_zone={self.dead_zone})"


class FastQuantizer:
    """Magic-number-division quantizer (reference src/quant.rs:171-332).

    Precomputes ``reciprocal = ceil(2^(32+extra) / step)`` and divides via a
    64-bit multiply + shift.  Bit-identical to :class:`Quantizer` for all
    inputs (the round-up magic is exact for u32 dividends); kept for API
    parity and as the oracle counterpart in tests.
    """

    __slots__ = ("reciprocal", "shift", "step", "dead_zone")

    def __init__(self, step: int, dead_zone: int | None = None):
        step = int(step)
        if step <= 0:
            raise InvalidQuantStep(step)
        # extra_bits = 32 - leading_zeros(step as u32) = floor(log2(step)) + 1
        extra_bits = step.bit_length()
        self.shift = 32 + extra_bits
        power = 1 << self.shift
        self.reciprocal = (power + step - 1) // step  # ceil division
        self.step = step
        self.dead_zone = int(step if dead_zone is None else dead_zone)

    @classmethod
    def with_dead_zone(cls, step: int, dead_zone: int) -> "FastQuantizer":
        return cls(step, dead_zone)

    def _fast_div(self, x: int) -> int:
        return ((x * self.reciprocal) >> self.shift) & 0xFFFFFFFF

    def quantize(self, value: int) -> int:
        av = abs(value)
        if av < self.dead_zone:
            return 0
        adjusted = (av - (self.dead_zone >> 1)) & 0xFFFFFFFF
        q_abs = self._fast_div(adjusted)
        return -q_abs if value < 0 else q_abs

    def dequantize(self, qvalue: int) -> int:
        return 0 if qvalue == 0 else qvalue * self.step

    def quantize_buffer(self, values: np.ndarray) -> np.ndarray:
        """Vectorized magic-number quantize in uint64 NumPy."""
        v = np.asarray(values, np.int64)
        av = np.abs(v)
        adjusted = (av - (self.dead_zone >> 1)).astype(np.uint64)
        prod = adjusted * np.uint64(self.reciprocal)
        # reciprocal < 2^34 and adjusted < 2^32 can overflow u64 for huge
        # inputs; real coefficient magnitudes keep the product in range
        # exactly as the reference's u64 arithmetic does.
        q = (prod >> np.uint64(self.shift)).astype(np.int64)
        out = np.where(av < self.dead_zone, 0, np.sign(v) * q)
        return out.astype(np.int32)

    def dequantize_buffer(self, qvalues: np.ndarray) -> np.ndarray:
        return (np.asarray(qvalues, np.int32) * np.int32(self.step)).astype(np.int32)

    def __repr__(self) -> str:  # pragma: no cover
        return f"FastQuantizer(step={self.step}, dead_zone={self.dead_zone})"


class AnalyticalRDO:
    """Closed-form rate-distortion optimizer (reference src/quant.rs:377-505).

    λ_optimal = 6·ln(2)·σ² / R_target;  step = round(sqrt(12·λ)), scaled per
    sub-band by its quantization strength, with dead-zone = 1.5×step.
    """

    __slots__ = ("target_bpp", "quality")

    def __init__(self, target_bpp: float, quality: int = 75):
        self.target_bpp = float(target_bpp)
        self.quality = quality

    @classmethod
    def with_quality(cls, quality: int) -> "AnalyticalRDO":
        """Quality → approximate bpp: (q/100)²·23.9 + 0.1 (src/quant.rs:398-412)."""
        quality = min(int(quality), 100)
        q = quality / 100.0
        # Rust's f64::mul_add is a fused multiply-add; math.fma exists on
        # 3.13+, otherwise the unfused form differs by at most 1 ulp.
        fma = getattr(math, "fma", None)
        bpp = fma(q * q, 23.9, 0.1) if fma else q * q * 23.9 + 0.1
        return cls(bpp, quality)

    @staticmethod
    def estimate_variance(coeffs) -> float:
        """Population variance in f64, floored at 1.0 (src/quant.rs:415-435)."""
        c = np.asarray(coeffs, np.int64)
        if c.size == 0:
            return 1.0
        inv_n = 1.0 / float(c.size)
        mean = float(c.sum()) * inv_n
        var = float(((c.astype(np.float64) - mean) ** 2).sum()) * inv_n
        return max(var, 1.0)

    def compute_optimal_lambda(self, variance: float) -> float:
        return (6.0 * math.log(2.0) * variance) / self.target_bpp

    def lambda_to_step(self, lam: float) -> int:
        # libm::round rounds half away from zero, unlike Python's round().
        step = math.sqrt(12.0 * lam)
        return max(int(math.floor(step + 0.5)), 1)

    def compute_quantizer(self, coeffs, subband: SubBand3D) -> Quantizer:
        variance = self.estimate_variance(coeffs)
        lam = self.compute_optimal_lambda(variance)
        base_step = self.lambda_to_step(lam)
        step = max(base_step * subband.quant_strength, 1)
        dead_zone = step + step // 2
        return Quantizer.with_dead_zone(step, dead_zone)

    def compute_all_quantizers(self, subbands) -> list[Quantizer]:
        """Quantizers for the 8 sub-bands of a 3D decomposition (src/quant.rs:472-490)."""
        return [
            self.compute_quantizer(coeffs, band)
            for coeffs, band in zip(subbands, SubBand3D, strict=True)
        ]

    @staticmethod
    def variance_from_moments(n: int, s1: int, s2: int) -> float:
        """Population variance from exact integer moments, floored at 1.0.

        ``var = (s2 - s1²/n) / n`` in f64 — algebraically equal to
        :meth:`estimate_variance`'s elementwise form; the integer moments
        are order-independent, so the device reduction
        (:func:`band_moments`) and a host loop produce identical steps.
        """
        if n == 0:
            return 1.0
        mean = s1 / n
        var = s2 / n - mean * mean
        return max(var, 1.0)

    def step_from_moments(self, n: int, s1: int, s2: int,
                          subband: SubBand3D) -> tuple[int, int]:
        """(step, dead_zone) for one band from device moments
        (src/quant.rs:472-490 composition, dead_zone = 1.5×step)."""
        var = self.variance_from_moments(n, s1, s2)
        base_step = self.lambda_to_step(self.compute_optimal_lambda(var))
        step = max(base_step * subband.quant_strength, 1)
        return step, step + step // 2

    def steps_from_moments(self, n: int, s1_8, s2_8) -> tuple[np.ndarray, np.ndarray]:
        """Per-band (steps, dead_zones) int32 (8,) arrays from
        :func:`band_moments` output for one channel; ``n`` is the per-band
        element count (volume size // 8)."""
        steps = np.empty(8, np.int32)
        dzs = np.empty(8, np.int32)
        for band in SubBand3D:
            s, d = self.step_from_moments(
                n, int(s1_8[int(band)]), int(s2_8[int(band)]), band
            )
            steps[int(band)] = s
            dzs[int(band)] = d
        return steps, dzs


def quantize_subband(coeffs, quantizer: Quantizer) -> np.ndarray:
    """Quantize sub-band coefficients (reference src/quant.rs:518-524)."""
    return quantizer.quantize_buffer(coeffs)


def dequantize_subband(coeffs, quantizer: Quantizer) -> np.ndarray:
    """Dequantize sub-band coefficients (reference src/quant.rs:531-537)."""
    return quantizer.dequantize_buffer(coeffs)
