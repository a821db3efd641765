"""Integer lifting-scheme wavelets (1D/2D/3D) — JAX, TPU-native.

Bit-exact re-implementation of the reference lifting wavelet
(reference: src/wavelet.rs).  Filters:

* CDF 9/7 — 4 lifting steps, coeffs (×2^12): -6497, -217, 3616, 1817
  (src/wavelet.rs:66-92)
* Haar    — [-4096, 2048] (src/wavelet.rs:96-109)
* CDF 5/3 — [-4096, 1024] (src/wavelet.rs:113-127)

Core update (src/wavelet.rs:180-217)::

    delta = ((even_l + even_r) as i64 * coeff + 4096) >> 13

computed here **entirely in int32** via the exact decomposition::

    avg = hi*8192 + lo   (hi = avg >> 13 arithmetic, lo = avg & 8191)
    delta = coeff*hi + ((coeff*lo + 4096) >> 13)

which avoids int64 emulation on the TPU VPU while matching the i64
arithmetic bit-for-bit (coeff*lo fits in 26 bits; coeff*hi fits whenever the
true delta fits, i.e. for all non-overflowing inputs).

Design: instead of the reference's per-row/per-column scalar loops with
explicit gather/scatter of strided slices, transforms are expressed as
whole-array slicing along one axis, vectorized over every other axis — one
XLA program per axis pass, fully parallel across the VPU.  The interleaved →
[low | high] reorder falls out of the even/odd split for free.

Two inverse modes:

* ``exact=False`` (default, bitstream-compat): replays lifting steps with
  negated coefficients like the reference (src/wavelet.rs:157-176).  This is
  only ±1-exact: when ``avg*coeff ≡ 4096 (mod 8192)`` the rounding of the
  negated step does not cancel the forward step.  Required to reproduce
  reference decoder output byte-for-byte.
* ``exact=True``: subtracts the *identical* forward delta, giving guaranteed
  perfect reconstruction for every input (a capability the reference lacks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import WaveletType

__all__ = [
    "LIFTING_STEPS",
    "forward_1d",
    "inverse_1d",
    "forward_2d",
    "inverse_2d",
    "forward_3d",
    "inverse_3d",
    "forward_3d_multi",
    "inverse_3d_multi",
    "forward_1d_inter",
    "inverse_1d_inter",
    "forward_3d_inter",
    "inverse_3d_inter",
    "Wavelet1D",
    "Wavelet2D",
    "Wavelet3D",
]

# (coeff, predict) pairs per filter; coeff scaled by 2^12.
LIFTING_STEPS: dict[WaveletType, tuple[tuple[int, bool], ...]] = {
    WaveletType.CDF97: ((-6497, True), (-217, False), (3616, True), (1817, False)),
    WaveletType.HAAR: ((-4096, True), (2048, False)),
    WaveletType.CDF53: ((-4096, True), (1024, False)),
}


def _delta(avg: jnp.ndarray, coeff: int) -> jnp.ndarray:
    """Exact int32 evaluation of ``(avg_i64 * coeff + 4096) >> 13``.

    Power-of-two coefficients (all of Haar and CDF 5/3) reduce to a single
    shift — ``(avg·2^k + 4096) >> 13 = (avg + 2^(12-k)) >> (13-k)`` — which
    is bit-identical to the i64 form and ~3× fewer VPU ops on the hot
    CDF 5/3 path."""
    if coeff == -4096:
        return (1 - avg) >> 1
    if coeff == 4096:
        return (avg + 1) >> 1
    if coeff == 2048:
        return (avg + 2) >> 2
    if coeff == -2048:
        return (2 - avg) >> 2
    if coeff == 1024:
        return (avg + 4) >> 3
    if coeff == -1024:
        return (4 - avg) >> 3
    hi = avg >> 13          # arithmetic shift = floor(avg / 8192)
    lo = avg & 8191         # non-negative remainder
    return coeff * hi + ((coeff * lo + 4096) >> 13)


def _sl(x: jnp.ndarray, axis: int, sl: slice) -> jnp.ndarray:
    """``x[..., sl, ...]`` with the slice at ``axis`` (negative ok)."""
    idx = [slice(None)] * x.ndim
    idx[axis % x.ndim] = sl
    return x[tuple(idx)]


def _cat(parts, axis: int) -> jnp.ndarray:
    return jnp.concatenate(parts, axis=axis)


def _lift(even: jnp.ndarray, odd: jnp.ndarray, coeff: int, predict: bool,
          axis: int = -1):
    """One lifting step on split even/odd arrays along ``axis``.

    Predict (src/wavelet.rs:180-197): odd[i] += Δ(even[i] + even[i+1]),
    mirroring the last even at the right edge.
    Update (src/wavelet.rs:201-217): even[i] += Δ(odd[i-1] + odd[i]),
    mirroring odd[0] at the left edge.
    """
    ax = axis % even.ndim
    ne, no = even.shape[ax], odd.shape[ax]
    if predict:
        if ne > no:
            # Odd-length signal: every odd sample has a real right neighbor.
            even_l = _sl(even, ax, slice(None, -1))
            even_r = _sl(even, ax, slice(1, None))
            odd = odd + _delta(even_l + even_r, coeff)
        else:
            even_r = _cat(
                [_sl(even, ax, slice(1, None)), _sl(even, ax, slice(-1, None))],
                ax)
            odd = odd + _delta(even + even_r, coeff)
    else:
        odd_l = _cat(
            [_sl(odd, ax, slice(None, 1)), _sl(odd, ax, slice(None, -1))], ax)
        delta = _delta(odd_l + odd, coeff)
        if ne > no:
            # Odd-length: the trailing even sample is never updated.
            even = _cat(
                [_sl(even, ax, slice(None, -1)) + delta,
                 _sl(even, ax, slice(-1, None))], ax)
        else:
            even = even + delta
    return even, odd


def forward_1d(x: jnp.ndarray, wavelet: WaveletType, axis: int = -1) -> jnp.ndarray:
    """Forward transform along ``axis`` (length must be ≥2).

    Output layout: ``[low-pass..., high-pass...]`` — the even/odd split plays
    the role of the reference's deinterleave (src/wavelet.rs:220-233).
    Vectorized over every other axis.  Working along the native axis (no
    moveaxis) keeps XLA from materializing a full-volume transpose per pass
    — the round-2 transform spent most of its time in those relayouts.
    """
    ax = axis % x.ndim
    n = x.shape[ax]
    if n < 2:
        return x
    even = _sl(x, ax, slice(0, None, 2))
    odd = _sl(x, ax, slice(1, None, 2))
    for coeff, predict in LIFTING_STEPS[wavelet]:
        even, odd = _lift(even, odd, coeff, predict, ax)
    if n % 2 == 1:
        # Reference deinterleave quirk for odd n (src/wavelet.rs:220-233):
        # only n//2 evens are copied; the final slot stays zero.
        zero = jnp.zeros_like(_sl(even, ax, slice(None, 1)))
        return _cat([_sl(even, ax, slice(None, -1)), odd, zero], ax)
    return _cat([even, odd], ax)


def inverse_1d(x: jnp.ndarray, wavelet: WaveletType, axis: int = -1,
               *, exact: bool = False) -> jnp.ndarray:
    """Inverse transform along ``axis``.

    ``exact=False`` replays steps with negated coefficients (reference
    semantics, ±1 approximate); ``exact=True`` subtracts the identical
    forward delta (perfect reconstruction).
    """
    ax = axis % x.ndim
    n = x.shape[ax]
    if n < 2:
        return x
    half = n // 2
    if n % 2 == 0:
        even = _sl(x, ax, slice(None, half))
        odd = _sl(x, ax, slice(half, None))
    else:
        # Reference interleave quirk for odd n (src/wavelet.rs:236-248):
        # the trailing even slot is zero-filled.
        zero = jnp.zeros_like(_sl(x, ax, slice(None, 1)))
        even = _cat([_sl(x, ax, slice(None, half)), zero], ax)
        odd = _sl(x, ax, slice(half, 2 * half))
    for coeff, predict in reversed(LIFTING_STEPS[wavelet]):
        if exact:
            # Undo by subtracting the same delta the forward step added.
            ne, no = even.shape[ax], odd.shape[ax]
            if predict:
                if ne > no:
                    odd = odd - _delta(
                        _sl(even, ax, slice(None, -1))
                        + _sl(even, ax, slice(1, None)), coeff)
                else:
                    even_r = _cat(
                        [_sl(even, ax, slice(1, None)),
                         _sl(even, ax, slice(-1, None))], ax)
                    odd = odd - _delta(even + even_r, coeff)
            else:
                odd_l = _cat(
                    [_sl(odd, ax, slice(None, 1)),
                     _sl(odd, ax, slice(None, -1))], ax)
                delta = _delta(odd_l + odd, coeff)
                if ne > no:
                    even = _cat(
                        [_sl(even, ax, slice(None, -1)) - delta,
                         _sl(even, ax, slice(-1, None))], ax)
                else:
                    even = even - delta
        else:
            even, odd = _lift(even, odd, -coeff, predict, ax)
    # interleave even/odd back: stack on a fresh trailing axis then fold it
    # into ``ax`` (pure reshape when ax is the minor axis; a cheap local
    # relayout otherwise — never a full-volume transpose)
    ev = _sl(even, ax, slice(None, half))
    body = jnp.stack([ev, odd], axis=ax + 1)
    body = body.reshape(*x.shape[:ax], 2 * half, *x.shape[ax + 1 :])
    if n % 2 == 1:
        return _cat([body, _sl(even, ax, slice(-1, None))], ax)
    return body


def _apply_axis(x: jnp.ndarray, axis: int, fn) -> jnp.ndarray:
    """Apply an axis-aware transform along ``axis``."""
    return fn(x, axis=axis)


# ── Interleaved-layout transform (ALC3 fast path) ───────────────
#
# The [low|high] layout above exists for reference parity
# (src/wavelet.rs:220-233 deinterleaves after lifting).  For ALC3 —
# whose wire format is our own — the deinterleave buys nothing: the
# coefficients can stay IN PLACE (low at even indices, high at odd),
# which turns every lifting step into rolls + parity-masked elementwise
# updates.  No strided even/odd split, no [low|high] concatenate, no
# interleave on the inverse: each step is one fused elementwise pass,
# and the band of any coefficient is recoverable from its index parity
# (quant.band_broadcast_inter).  Same integer arithmetic (_delta), so
# the coefficient VALUES are identical to the reference layout —
# forward_1d_inter(x) is a fixed permutation of forward_1d(x).
#
# Multi-level decomposition keeps the in-place property: level l lifts
# the subgrid of indices ≡ 0 (mod 2^l) with neighbor distance 2^l —
# no LLL extraction/reinsertion.


def _lift_inter(x: jnp.ndarray, coeff: int, predict: bool, ax: int,
                s: int, inverse_exact: bool = False,
                active=None) -> jnp.ndarray:
    """One in-place lifting step on the stride-``s`` subgrid along ``ax``.

    predict: x[i] += Δ(x[i-s] + x[i+s]) for i ≡ s (mod 2s), the right
    neighbor mirroring to x[i-s] at the last target (reference
    src/wavelet.rs:180-197 edge rule).
    update:  x[i] += Δ(x[i-s] + x[i+s]) for i ≡ 0 (mod 2s), the left
    neighbor mirroring to x[i+s] at i=0 (src/wavelet.rs:201-217).
    ``inverse_exact`` subtracts the delta instead (exact undo).
    ``active``: optional bool mask restricting targets (multi-level 3D:
    only positions on the level's subgrid along the OTHER axes lift).
    """
    n = x.shape[ax]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
    nl = jnp.roll(x, s, ax)
    nr = jnp.roll(x, -s, ax)
    m2 = 2 * s - 1
    if predict:
        tgt = (idx & m2) == s
        nbr = nl + jnp.where(idx == n - s, nl, nr)
    else:
        tgt = (idx & m2) == 0
        nbr = jnp.where(idx == 0, nr, nl) + nr
    if active is not None:
        tgt = tgt & active
    d = _delta(nbr, coeff)
    return jnp.where(tgt, x - d if inverse_exact else x + d, x)


def forward_1d_inter(x: jnp.ndarray, wavelet: WaveletType, axis: int = -1,
                     level: int = 0, active=None) -> jnp.ndarray:
    """Forward lifting along ``axis`` in the interleaved layout.

    ``level``: dyadic depth — lifts the subgrid of indices ≡ 0
    (mod 2^level).  The axis length must be divisible by 2^(level+1).
    Coefficient values match :func:`forward_1d` on the level's subgrid
    (low at even subgrid slots, high at odd).  ``active``: extra target
    mask (see :func:`_lift_inter`)."""
    ax = axis % x.ndim
    s = 1 << level
    if x.shape[ax] % (2 * s):
        raise ValueError(
            f"axis length {x.shape[ax]} not divisible by {2 * s} "
            f"(level {level})")
    for coeff, predict in LIFTING_STEPS[wavelet]:
        x = _lift_inter(x, coeff, predict, ax, s, active=active)
    return x


def inverse_1d_inter(x: jnp.ndarray, wavelet: WaveletType, axis: int = -1,
                     level: int = 0, *, exact: bool = False,
                     active=None) -> jnp.ndarray:
    """Inverse of :func:`forward_1d_inter` (same two modes as
    :func:`inverse_1d`: compat ±1 replay, or exact undo)."""
    ax = axis % x.ndim
    s = 1 << level
    for coeff, predict in reversed(LIFTING_STEPS[wavelet]):
        if exact:
            x = _lift_inter(x, coeff, predict, ax, s, inverse_exact=True,
                            active=active)
        else:
            x = _lift_inter(x, -coeff, predict, ax, s, active=active)
    return x


def _level_active(shape, k: int, ax: int):
    """Mask of positions on the level-``k`` subgrid along the two volume
    axes OTHER than ``ax`` (the interleaved LLL-box restriction; None at
    level 0 — everything lifts)."""
    if k == 0:
        return None
    nd = len(shape)
    m = (1 << k) - 1
    axes = [a for a in (nd - 1, nd - 2, nd - 3) if a != ax % nd]
    act = None
    for a in axes:
        ok = (jax.lax.broadcasted_iota(jnp.int32, shape, a) & m) == 0
        act = ok if act is None else (act & ok)
    return act


def forward_3d_inter(volume: jnp.ndarray, wavelet: WaveletType,
                     levels: int = 1, start_level: int = 0) -> jnp.ndarray:
    """Interleaved 3D forward on ``(..., T, H, W)``: rows → columns →
    temporal per level, subgrids in place (dims divisible by
    2^levels).  Level k lifts only the LLL subgrid (indices ≡ 0 mod 2^k
    on every axis), matching forward_3d_multi's box recursion.
    ``start_level`` skips the first levels (the Pallas fused kernels
    handle level 0; this applies the remaining subgrid levels)."""
    for k in range(start_level, levels):
        for ax in (-1, -2, -3):
            volume = forward_1d_inter(
                volume, wavelet, axis=ax, level=k,
                active=_level_active(volume.shape, k, ax))
    return volume


def inverse_3d_inter(volume: jnp.ndarray, wavelet: WaveletType,
                     levels: int = 1, *, exact: bool = False,
                     stop_level: int = 0) -> jnp.ndarray:
    """Inverse of :func:`forward_3d_inter`.  ``stop_level`` stops before
    the last levels (the Pallas fused kernels finish level 0)."""
    for k in reversed(range(stop_level, levels)):
        for ax in (-3, -2, -1):
            volume = inverse_1d_inter(
                volume, wavelet, axis=ax, level=k, exact=exact,
                active=_level_active(volume.shape, k, ax))
    return volume




def forward_2d(image: jnp.ndarray, wavelet: WaveletType) -> jnp.ndarray:
    """2D forward: rows then columns (reference src/wavelet.rs:292-316).

    ``image`` shape ``(..., H, W)``; result quadrants [LL|HL / LH|HH] in the
    reference's [low|high] per-axis layout.
    """
    fwd = partial(forward_1d, wavelet=wavelet)
    image = _apply_axis(image, -1, fwd)   # rows (along W)
    image = _apply_axis(image, -2, fwd)   # columns (along H)
    return image


def inverse_2d(image: jnp.ndarray, wavelet: WaveletType, *, exact: bool = False) -> jnp.ndarray:
    """2D inverse: columns then rows (reference src/wavelet.rs:319-340)."""
    inv = partial(inverse_1d, wavelet=wavelet, exact=exact)
    image = _apply_axis(image, -2, inv)
    image = _apply_axis(image, -1, inv)
    return image


def forward_3d(volume: jnp.ndarray, wavelet: WaveletType) -> jnp.ndarray:
    """3D forward on ``(..., T, H, W)``: spatial per frame, then temporal.

    Matches reference src/wavelet.rs:392-438 (rows → columns → t) — the
    reference's frame-by-frame and pixel-by-pixel loops are data-independent,
    so vectorizing them is bit-identical.
    """
    fwd = partial(forward_1d, wavelet=wavelet)
    volume = _apply_axis(volume, -1, fwd)   # rows
    volume = _apply_axis(volume, -2, fwd)   # columns
    volume = _apply_axis(volume, -3, fwd)   # temporal
    return volume


def inverse_3d(volume: jnp.ndarray, wavelet: WaveletType, *, exact: bool = False) -> jnp.ndarray:
    """3D inverse: temporal first, then columns, then rows (src/wavelet.rs:441-484)."""
    inv = partial(inverse_1d, wavelet=wavelet, exact=exact)
    volume = _apply_axis(volume, -3, inv)
    volume = _apply_axis(volume, -2, inv)
    volume = _apply_axis(volume, -1, inv)
    return volume


def forward_3d_multi(
    volume: jnp.ndarray, wavelet: WaveletType, levels: int = 1
) -> jnp.ndarray:
    """Multi-level 3D decomposition (SURVEY §5.7 extension; the reference
    is single-level, src/wavelet.rs:392-438).

    Level k re-decomposes the previous level's LLL octant in place, the
    standard dyadic pyramid.  Every dim of ``volume`` must be divisible
    by ``2**levels``.  ``levels=1`` is exactly :func:`forward_3d`.
    """
    if levels < 1:
        return volume
    t, h, w = volume.shape[-3:]
    if any(d % (1 << levels) for d in (t, h, w)):
        raise ValueError(
            f"dims {(t, h, w)} not divisible by 2^{levels} for "
            f"{levels}-level decomposition"
        )
    out = forward_3d(volume, wavelet)
    for k in range(1, levels):
        st, sh, sw = t >> k, h >> k, w >> k
        low = out[..., :st, :sh, :sw]
        out = out.at[..., :st, :sh, :sw].set(forward_3d(low, wavelet))
    return out


def inverse_3d_multi(
    volume: jnp.ndarray, wavelet: WaveletType, levels: int = 1,
    *, exact: bool = False,
) -> jnp.ndarray:
    """Inverse of :func:`forward_3d_multi` (deepest level first)."""
    if levels < 1:
        return volume
    t, h, w = volume.shape[-3:]
    out = volume
    for k in range(levels - 1, 0, -1):
        st, sh, sw = t >> k, h >> k, w >> k
        low = out[..., :st, :sh, :sw]
        out = out.at[..., :st, :sh, :sw].set(
            inverse_3d(low, wavelet, exact=exact)
        )
    return inverse_3d(out, wavelet, exact=exact)


def extract_subbands_3d(volume: jnp.ndarray) -> dict:
    """Split a forward-3D-transformed volume into its 8 sub-bands.

    After one decomposition level the layout along each axis is
    ``[low | high]`` (reference src/wavelet.rs:392-438 → §result comment:
    LLL..HHH).  ``volume``: (..., T, H, W) with even dims.  Returns
    ``{SubBand3D: (..., T/2, H/2, W/2) array}`` views; letters are (y, x, t)
    per the reference enum (src/lib.rs:113-132).
    """
    from ..core import SubBand3D

    t, h, w = volume.shape[-3:]
    ht, hh, hw = t // 2, h // 2, w // 2
    out = {}
    for band in SubBand3D:
        yh = (int(band) >> 2) & 1  # y high?
        xh = (int(band) >> 1) & 1  # x high?
        th = int(band) & 1         # t high?
        out[band] = volume[
            ...,
            th * ht : (th + 1) * ht,
            yh * hh : (yh + 1) * hh,
            xh * hw : (xh + 1) * hw,
        ]
    return out


def combine_subbands_3d(bands: dict, *, like: jnp.ndarray | None = None) -> jnp.ndarray:
    """Inverse of :func:`extract_subbands_3d`: reassemble the full volume."""
    from ..core import SubBand3D

    sample = bands[SubBand3D.LLL]
    ht, hh, hw = sample.shape[-3:]
    shape = (*sample.shape[:-3], 2 * ht, 2 * hh, 2 * hw)
    vol = jnp.zeros(shape, sample.dtype)
    for band, data in bands.items():
        yh = (int(band) >> 2) & 1
        xh = (int(band) >> 1) & 1
        th = int(band) & 1
        vol = vol.at[
            ...,
            th * ht : (th + 1) * ht,
            yh * hh : (yh + 1) * hh,
            xh * hw : (xh + 1) * hw,
        ].set(data)
    return vol


# Module-level jitted entry points (cached across calls).
_fwd1 = jax.jit(forward_1d, static_argnames=("wavelet", "axis"))
_inv1 = jax.jit(inverse_1d, static_argnames=("wavelet", "axis", "exact"))
_fwd2 = jax.jit(forward_2d, static_argnames=("wavelet",))
_inv2 = jax.jit(inverse_2d, static_argnames=("wavelet", "exact"))
_fwd3 = jax.jit(forward_3d, static_argnames=("wavelet",))
_inv3 = jax.jit(inverse_3d, static_argnames=("wavelet", "exact"))


# ── Object API mirroring the reference types ────────────────────


class Wavelet1D:
    """1D lifting wavelet (reference src/wavelet.rs:47-249).

    >>> import numpy as np
    >>> w = Wavelet1D.cdf53()
    >>> sig = np.array([10, 20, 30, 40, 50, 60, 70, 80], np.int32)
    >>> bool(np.array_equal(w.inverse(w.forward(sig)), sig))
    True
    """

    def __init__(self, wavelet: WaveletType):
        self.wavelet = wavelet

    @classmethod
    def cdf97(cls) -> "Wavelet1D":
        return cls(WaveletType.CDF97)

    @classmethod
    def cdf53(cls) -> "Wavelet1D":
        return cls(WaveletType.CDF53)

    @classmethod
    def haar(cls) -> "Wavelet1D":
        return cls(WaveletType.HAAR)

    @property
    def steps(self) -> tuple[tuple[int, bool], ...]:
        return LIFTING_STEPS[self.wavelet]

    def forward(self, signal):
        import numpy as np

        sig = jnp.asarray(np.asarray(signal, np.int32))
        return np.asarray(_fwd1(sig, wavelet=self.wavelet))

    def inverse(self, signal, *, exact: bool = False):
        import numpy as np

        sig = jnp.asarray(np.asarray(signal, np.int32))
        return np.asarray(_inv1(sig, wavelet=self.wavelet, exact=exact))


class Wavelet2D(Wavelet1D):
    """2D wavelet: rows then columns (reference src/wavelet.rs:265-341)."""

    @classmethod
    def new(cls, wavelet_1d: Wavelet1D) -> "Wavelet2D":
        return cls(wavelet_1d.wavelet)

    def forward(self, image, width: int | None = None, height: int | None = None):
        import numpy as np

        img = np.asarray(image, np.int32)
        if img.ndim == 1:
            img = img.reshape(height, width)
        out = _fwd2(jnp.asarray(img), wavelet=self.wavelet)
        return np.asarray(out).reshape(np.asarray(image).shape)

    def inverse(self, image, width: int | None = None, height: int | None = None,
                *, exact: bool = False):
        import numpy as np

        img = np.asarray(image, np.int32)
        if img.ndim == 1:
            img = img.reshape(height, width)
        out = _inv2(jnp.asarray(img), wavelet=self.wavelet, exact=exact)
        return np.asarray(out).reshape(np.asarray(image).shape)


class Wavelet3D(Wavelet1D):
    """3D wavelet over (t, y, x) video volumes (reference src/wavelet.rs:359-485)."""

    @classmethod
    def new(cls, wavelet_1d: Wavelet1D) -> "Wavelet3D":
        return cls(wavelet_1d.wavelet)

    def forward(self, volume, width: int | None = None, height: int | None = None,
                depth: int | None = None):
        import numpy as np

        vol = np.asarray(volume, np.int32)
        if vol.ndim == 1:
            vol = vol.reshape(depth, height, width)
        out = _fwd3(jnp.asarray(vol), wavelet=self.wavelet)
        return np.asarray(out).reshape(np.asarray(volume).shape)

    def inverse(self, volume, width: int | None = None, height: int | None = None,
                depth: int | None = None, *, exact: bool = False):
        import numpy as np

        vol = np.asarray(volume, np.int32)
        if vol.ndim == 1:
            vol = vol.reshape(depth, height, width)
        out = _inv3(jnp.asarray(vol), wavelet=self.wavelet, exact=exact)
        return np.asarray(out).reshape(np.asarray(volume).shape)
