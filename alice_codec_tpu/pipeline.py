"""End-to-end encode/decode pipeline and the `.alc` container.

TPU-native re-architecture of the reference pipeline (reference:
src/pipeline.rs).  The split of work:

* **Device (one jitted XLA program per chunk shape)** — color conversion,
  edge-replicating pad to even dims, 3D lifting wavelet, dead-zone
  quantization, zigzag symbol mapping and the 256-bin histograms.  All of it
  fuses; the program is ``vmap``-able over chunk batches and shardable over
  a device mesh (see parallel/).
* **Host (native C++)** — frequency-table normalization and the serial
  byte-stream rANS that the `.alc` wire format requires
  (reference src/rans.rs), via ops/rans.py.

Wire format (bit-compatible with the reference, src/pipeline.rs:123-313)::

    "ALCC" | version=1 | wavelet u8 | width u32 | height u32 | frames u32   (18 B)
    3 × ChannelHeader {compressed_len u32, quant_step i32,
                       quant_dead_zone i32, num_symbols u32,
                       histogram[256] u32}                                  (3×1040 B)
    payload: concatenated per-channel rANS streams

Quality → step mapping, padding rules, per-channel processing order and all
integer arithmetic match the reference exactly, so chunks interop with the
reference encoder/decoder in both directions.
"""

from __future__ import annotations

import os
import struct
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core import WaveletType, checked_pixel_count, padded_dims, quality_to_step
from .errors import (
    InvalidBitstream,
    InvalidBufferSize,
    InvalidDimensions,
)
from .ops import color, quant, wavelet
from .ops.rans import FrequencyTable, RansDecoder, RansEncoder

__all__ = ["ChannelHeader", "EncodedChunk", "FrameEncoder", "FrameDecoder"]

_MAGIC = b"ALCC"
_FORMAT_VERSION = 1
_FIXED_HEADER_BYTES = 18
_CHANNEL_HEADER_BYTES = 1040


# ── Device programs ─────────────────────────────────────────────


def _color_pad(rgb, padded, dtype=jnp.int32):
    """color → edge-pad: uint8 (T,H,W,3) → ``dtype`` (3, pT, pH, pW).

    ``dtype=jnp.int16`` feeds the i16-storage Pallas lift kernels (half
    the HBM traffic; exact for 8-bit input — lift_kernels docstring);
    the XLA lift paths keep i32."""
    pw, ph, pf = padded
    t, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    y, co, cg = color.rgb_to_ycocg_r(rgb)           # (T,H,W) i16 each
    chans = jnp.stack([y, co, cg]).astype(dtype)    # (3,T,H,W)
    # Edge-replicating pad to even dims (reference src/pipeline.rs:77-114).
    return jnp.pad(
        chans,
        ((0, 0), (0, pf - t), (0, ph - h), (0, pw - w)),
        mode="edge",
    )


def _transform(rgb, wavelet_type, padded, levels=1, interleaved=False):
    """color → edge-pad → forward 3D wavelet: uint8 (T,H,W,3) → int32
    coefficients (3, pT, pH, pW) (shared by the fixed-step and RDO
    encode programs).  ``levels`` > 1 runs the dyadic multi-level
    decomposition (SURVEY §5.7 extension); ``padded`` must then be
    divisible by 2**levels (core.padded_dims_levels)."""
    chans = _color_pad(rgb, padded)
    if interleaved:
        # ALC3 fast path: in-place interleaved layout — no [low|high]
        # relayouts (see wavelet.forward_3d_inter).  Level 0 (>87% of
        # the lifting work) runs in the fused Pallas kernels — two HBM
        # passes instead of six roll/mask XLA passes (measured 167 ms of
        # the 1080p phase-1 program); remaining levels use the XLA
        # subgrid lifts.  Shapes the kernels can't tile fall back to the
        # per-channel lax.map (whose roll/mask temporaries live per
        # channel — the fused 3-channel XLA form OOMs at 1080p).
        from .ops.pallas.lift_kernels import forward_3d_pallas, lift3d_ok

        if lift3d_ok(chans.shape, 4):
            out = forward_3d_pallas(chans, wavelet_type)
            if levels > 1:
                out = jax.lax.map(
                    lambda c: wavelet.forward_3d_inter(
                        c, wavelet_type, levels, start_level=1),
                    out)
            return out
        return jax.lax.map(
            lambda c: wavelet.forward_3d_inter(c, wavelet_type, levels),
            chans)
    if levels == 1:
        return wavelet.forward_3d(chans, wavelet_type)
    return wavelet.forward_3d_multi(chans, wavelet_type, levels)


def _inverse_3d(coeffs, wavelet_type, levels, exact, interleaved):
    if interleaved:
        # mirror of _transform: XLA subgrid inverses down to level 1,
        # Pallas fused kernels for level 0; lax.map fallback otherwise.
        from .ops.pallas.lift_kernels import inverse_3d_pallas, lift3d_ok

        if lift3d_ok(coeffs.shape, 4):
            if levels > 1:
                coeffs = jax.lax.map(
                    lambda c: wavelet.inverse_3d_inter(
                        c, wavelet_type, levels, exact=exact,
                        stop_level=1),
                    coeffs)
            return inverse_3d_pallas(coeffs, wavelet_type, exact=exact)
        return jax.lax.map(
            lambda c: wavelet.inverse_3d_inter(c, wavelet_type, levels,
                                               exact=exact),
            coeffs)
    if levels == 1:
        return wavelet.inverse_3d(coeffs, wavelet_type, exact=exact)
    return wavelet.inverse_3d_multi(coeffs, wavelet_type, levels,
                                    exact=exact)


def _hist_sample(sym2d, stride: int):
    """Row-subsample a (nc, N) symbol plane for histogram building: the
    first 128-lane row of every ``stride`` rows (one strided slice — no
    gather).  The histogram seeds the rANS tables, which ride the wire,
    so ANY consistent histogram is correct as long as every symbol that
    occurs keeps nonzero mass — ALC3 callers floor the sampled histogram
    up to the plane's exact maximum (alc3._covered_hist) so the wire-v7
    tables may zero absent symbols; a 1/stride sample costs <0.1% rate at
    production sizes and cuts the dominant one-hot histogram pass by
    ``stride``×.
    Planes smaller than one stride block are returned whole."""
    if stride <= 1:
        return sym2d
    nc, n = sym2d.shape
    blk = stride * 128
    nb = n // blk
    if nb == 0:
        return sym2d
    s = sym2d[:, : nb * blk].reshape(nc, nb, stride, 128)[:, :, 0, :]
    return s.reshape(nc, nb * 128)


def _symbolize(qcoeffs, padded, hist_stride: int = 1):
    """zigzag symbols + per-channel histograms from quantized coeffs."""
    pw, ph, pf = padded
    symbols = quant.to_symbols(qcoeffs).reshape(3, pf * ph * pw)
    hists = jax.vmap(quant.build_histogram)(
        _hist_sample(symbols, hist_stride))
    return symbols, hists


def _transform_symbols(rgb, step, dead_zone, *, wavelet_type, padded,
                       levels=1, interleaved=False):
    """Fixed-step transform → quantize → zigzag: uint8 (T,H,W,3) →
    uint8 symbols (3, P).  On the interleaved single-level path the
    quantize/zigzag runs inside the temporal lift kernel's output pass
    (lift_kernels.forward_quant_pallas) — no separate XLA pass over the
    i32 coefficient volume."""
    from .ops.pallas.lift_kernels import forward_quant_pallas, lift3d_ok

    pw, ph, pf = padded
    if interleaved and levels == 1 and lift3d_ok((3, pf, ph, pw), 2):
        # i16 coefficient storage: exact for 8-bit input, half the HBM
        # traffic of the i32 form (lift_kernels docstring bounds)
        chans = _color_pad(rgb, padded, dtype=jnp.int16)
        s3 = jnp.broadcast_to(
            jnp.asarray(step, jnp.int32).reshape(-1), (3,))
        d3 = jnp.broadcast_to(
            jnp.asarray(dead_zone, jnp.int32).reshape(-1), (3,))
        sym = forward_quant_pallas(chans, wavelet_type, s3, d3)
        return sym.reshape(3, pf * ph * pw)
    coeffs = _transform(rgb, wavelet_type, padded, levels, interleaved)
    qcoeffs = quant.quantize(coeffs, step, dead_zone)
    return quant.to_symbols(qcoeffs).reshape(3, pf * ph * pw)


@partial(jax.jit, static_argnames=("wavelet_type", "padded", "levels",
                                   "hist_stride", "interleaved"))
def encode_device(
    rgb: jnp.ndarray,
    step: jnp.ndarray,
    dead_zone: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    padded: tuple[int, int, int],
    levels: int = 1,
    hist_stride: int = 1,
    interleaved: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused device encode stage.

    ``rgb``: uint8 ``(T, H, W, 3)``.  Returns ``(symbols, histograms)`` with
    symbols uint8 ``(3, pT*pH*pW)`` (channel order Y, Co, Cg, frame-major
    like the reference) and histograms uint32 ``(3, 256)``.
    """
    symbols = _transform_symbols(
        rgb, step, dead_zone, wavelet_type=wavelet_type, padded=padded,
        levels=levels, interleaved=interleaved)
    hists = jax.vmap(quant.build_histogram)(
        _hist_sample(symbols, hist_stride))
    return symbols, hists


@partial(jax.jit, static_argnames=("wavelet_type", "padded", "interleaved"))
def transform_moments_device(
    rgb: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    padded: tuple[int, int, int],
    interleaved: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RDO phase 1: transform + exact per-band integer moments.

    Returns ``(coeffs (3,pT,pH,pW) int32, s1 (3,8) int64, s2 (3,8)
    int64)``; the host turns the (tiny) moments into per-band steps
    (AnalyticalRDO.steps_from_moments) and feeds phase 2
    (:func:`encode_bands_device`).  Reference manual-pipeline composition:
    src/quant.rs:472-524.
    """
    coeffs = _transform(rgb, wavelet_type, padded, interleaved=interleaved)
    if interleaved:
        s1, s2 = quant.band_moments_inter(coeffs)
    else:
        s1, s2 = quant.band_moments(coeffs)
    return coeffs, s1, s2


@partial(jax.jit, static_argnames=("padded", "hist_stride",
                                   "interleaved"))
def encode_bands_device(
    coeffs: jnp.ndarray,
    steps8: jnp.ndarray,
    dead_zones8: jnp.ndarray,
    *,
    padded: tuple[int, int, int],
    hist_stride: int = 1,
    interleaved: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """RDO phase 2: per-sub-band quantize → symbols + histograms.

    ``steps8``/``dead_zones8``: (3, 8) int32 per-channel per-band."""
    qb = (quant.quantize_bands_inter if interleaved
          else quant.quantize_bands)
    qcoeffs = qb(coeffs, steps8, dead_zones8)
    return _symbolize(qcoeffs, padded, hist_stride)


@partial(jax.jit, static_argnames=(
    "wavelet_type", "dims", "padded", "exact", "levels", "interleaved",
    "active"))
def decode_device(
    symbols: jnp.ndarray,
    step: jnp.ndarray,
    dead_zone: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    dims: tuple[int, int, int],
    padded: tuple[int, int, int],
    exact: bool = False,
    levels: int = 1,
    interleaved: bool = False,
    active: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """Fused device decode stage: symbols (3, P) uint8 → RGB (T,H,W,3) uint8.

    ``step``/``dead_zone`` are shape-(3,) per-channel arrays (from the
    channel headers).  ``exact`` selects the exact-undo wavelet inverse; the
    default replays the reference's negated-coefficient inverse for
    bit-identical output.

    ``active`` (static): channels known to carry nonzero symbols — the
    zero-channel elision mirror of :func:`encode_sparse_phase1`.  A
    channel whose symbols are all zero dequantizes and inverse-lifts to
    exactly zero, so the fused path runs the inverse kernels only over
    the active channels and feeds zeros for the rest (bit-exact).  The
    sparse decoder derives this from the per-plane capacities it
    already holds statically (kcap == 0 ⟺ no nonzero symbols).
    """
    from .ops.pallas.lift_kernels import inverse_dequant_pallas, lift3d_ok

    w, h, t = dims
    pw, ph, pf = padded
    del dead_zone  # stored in headers but unused by dequantization
    fused = (interleaved and levels == 1 and lift3d_ok((3, pf, ph, pw), 2))
    if fused and active is not None and tuple(sorted(active)) != (0, 1, 2):
        act = tuple(sorted(active))
        sym4 = symbols.reshape(3, pf, ph, pw)
        steps3 = step.astype(jnp.int32).reshape(-1)
        if act:
            sub = jnp.stack([sym4[c] for c in act])
            vol = inverse_dequant_pallas(
                sub, wavelet_type,
                steps3[jnp.asarray(act, jnp.int32)], exact=exact)
        zero = jnp.zeros((t, h, w), jnp.int16)
        chans = [
            (vol[act.index(c), :t, :h, :w].astype(jnp.int16)
             if c in act else zero)
            for c in range(3)
        ]
        return color.ycocg_r_to_rgb(chans[0], chans[1], chans[2])
    if fused:
        # un-zigzag + dequantize run inside the temporal inverse
        # kernel's input pass — no XLA pass over the coefficient
        # volume, which lives in i16 (half the HBM traffic)
        volume = inverse_dequant_pallas(
            symbols.reshape(3, pf, ph, pw), wavelet_type,
            step.astype(jnp.int32).reshape(-1), exact=exact)
    else:
        qcoeffs = quant.from_symbols(symbols).reshape(3, pf, ph, pw)
        coeffs = qcoeffs * step.astype(jnp.int32).reshape(3, 1, 1, 1)
        volume = _inverse_3d(coeffs, wavelet_type, levels, exact,
                             interleaved)
    # i32 → i16 truncating cast, strip padding (src/pipeline.rs:602-611).
    chans = volume[:, :t, :h, :w].astype(jnp.int16)
    return color.ycocg_r_to_rgb(chans[0], chans[1], chans[2])


@partial(jax.jit, static_argnames=("wavelet_type", "padded", "levels",
                                   "hist_stride", "interleaved"))
def encode_deep_device(
    rgb: jnp.ndarray,
    step: jnp.ndarray,
    dead_zone: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    padded: tuple[int, int, int],
    levels: int = 1,
    hist_stride: int = 1,
    interleaved: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Deep (16-bit symbol) encode stage — ALC3's escape mechanism.

    Quantized coefficients map through the UNWRAPPED 16-bit zigzag and
    split into lo/hi byte planes, each with its own histogram: returns
    ``(planes (6, P) uint8, hists (6, 256) uint32)`` in plane order
    Y-lo, Y-hi, Co-lo, Co-hi, Cg-lo, Cg-hi.  With q=100 (step=1) and the
    exact-undo inverse this is end-to-end lossless for any input — the
    u8 path wraps at |q| > 127 (reference limit src/quant.rs:558-559);
    the hi plane is near-constant zero on lossy content, so its rANS
    cost is a few bits per segment.
    """
    pw, ph, pf = padded
    coeffs = _transform(rgb, wavelet_type, padded, levels, interleaved)
    qcoeffs = quant.quantize(coeffs, step, dead_zone)
    s16 = quant.to_symbols16(qcoeffs).reshape(3, pf * ph * pw)
    planes = jnp.stack([s16 & 255, s16 >> 8], axis=1)  # (3, 2, P)
    planes = planes.reshape(6, pf * ph * pw).astype(jnp.uint8)
    hists = jax.vmap(quant.build_histogram)(_hist_sample(planes, hist_stride))
    return planes, hists


@partial(jax.jit, static_argnames=(
    "wavelet_type", "dims", "padded", "exact", "levels", "interleaved"))
def decode_deep_device(
    planes: jnp.ndarray,
    step: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    dims: tuple[int, int, int],
    padded: tuple[int, int, int],
    exact: bool = False,
    levels: int = 1,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Inverse of :func:`encode_deep_device`: (6, P) uint8 planes → RGB."""
    w, h, t = dims
    pw, ph, pf = padded
    s16 = planes.reshape(3, 2, pf * ph * pw).astype(jnp.int32)
    s16 = s16[:, 0] | (s16[:, 1] << 8)
    qcoeffs = quant.from_symbols16(s16).reshape(3, pf, ph, pw)
    coeffs = qcoeffs * step.astype(jnp.int32).reshape(3, 1, 1, 1)
    volume = _inverse_3d(coeffs, wavelet_type, levels, exact, interleaved)
    chans = volume[:, :t, :h, :w].astype(jnp.int16)
    return color.ycocg_r_to_rgb(chans[0], chans[1], chans[2])


@partial(jax.jit, static_argnames=("wavelet_type", "dims", "padded", "exact",
                                  "interleaved"))
def decode_bands_device(
    symbols: jnp.ndarray,
    steps8: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    dims: tuple[int, int, int],
    padded: tuple[int, int, int],
    exact: bool = False,
    interleaved: bool = False,
) -> jnp.ndarray:
    """Per-sub-band decode stage (inverse of the RDO encode path):
    symbols (3, P) uint8 + ``steps8`` (3, 8) int32 → RGB uint8."""
    w, h, t = dims
    pw, ph, pf = padded
    qcoeffs = quant.from_symbols(symbols).reshape(3, pf, ph, pw)
    db = (quant.dequantize_bands_inter if interleaved
          else quant.dequantize_bands)
    coeffs = db(qcoeffs, steps8)
    volume = _inverse_3d(coeffs, wavelet_type, 1, exact, interleaved)
    chans = volume[:, :t, :h, :w].astype(jnp.int16)
    return color.ycocg_r_to_rgb(chans[0], chans[1], chans[2])


# ── Sparse (significance-bitmap) stage — ALC3 sparse mode ───────
#
# Quantized symbol streams are mostly zero (75-100% per channel at
# production qualities), yet the entropy kernels pay the same per-symbol
# cost for a zero as for a value.  Sparse mode splits each channel into
# a significance BITMAP plane (P/8 bytes) and a COMPACTED nonzero-value
# plane, each rANS-coded with its own table: the kernels then touch
# ~P/8 + nnz symbols instead of P — a 3-5× entropy-stage reduction at
# production qualities, at roughly neutral rate (the bitmap carries
# exactly the information the zero-symbol probability mass carried
# before).  Round 3 moved compaction/expansion into Pallas kernels with
# a block-major layout (ops/pallas/sparse_kernels.py holds the layout
# spec; ops/sparse_spec.py the NumPy oracle) — the round-2 XLA
# gather/cumsum forms ran at 17-100 Msym/s and made sparse a rate win
# only.


@partial(jax.jit, static_argnames=("wavelet_type", "padded", "levels", "pp",
                                   "interleaved", "active"))
def encode_sparse_phase1(
    rgb: jnp.ndarray,
    step: jnp.ndarray,
    dead_zone: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    padded: tuple[int, int, int],
    pp: int,
    levels: int = 1,
    interleaved: bool = False,
    active: tuple[int, ...] = (0, 1, 2),
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sparse phase 1: transform + quantize + zigzag + value-row counts.

    ``pp``: channel symbol count padded to whole compaction blocks
    (``alc3._sparse_pp``).  Returns ``(symbols (na, pp) uint8, ch_rows
    (na,) int32 — value rows each ACTIVE channel needs under tile-major
    padding, flags (3,) bool — per-channel any-nonzero of the color
    transform output)``; symbols stay in HBM and the host fetches only
    the tiny row counts + flags to pick phase-2 capacities.

    ``active`` (static) lists the channels to transform — the
    zero-channel elision fast path: a channel whose YCoCg-R plane is
    exactly zero (grayscale content ⇒ Co=Cg=0; black ⇒ all three)
    lifts, quantizes and zigzags to exactly zero (``_delta(0,c)=0``,
    ``quantize(0)=0``, ``zigzag(0)=0``), so skipping its transform is
    bit-exact.  The caller dispatches OPTIMISTICALLY with a cached
    active set and validates against ``flags`` (computed from the real
    color output regardless of ``active``): any channel flagged nonzero
    but not in ``active`` forces a full re-dispatch
    (alc3._sparse_encode_planes)."""
    from .ops.pallas.lift_kernels import forward_quant_pallas, lift3d_ok
    from .ops.pallas.sparse_kernels import block_value_rows

    pw, ph, pf = padded
    p = pf * ph * pw
    active = tuple(sorted(active))
    fused = (interleaved and levels == 1 and lift3d_ok((3, pf, ph, pw), 2))
    if fused:
        chans = _color_pad(rgb, padded, dtype=jnp.int16)
        flags = jnp.stack([jnp.any(chans[c] != 0) for c in range(3)])
        s3 = jnp.broadcast_to(
            jnp.asarray(step, jnp.int32).reshape(-1), (3,))
        d3 = jnp.broadcast_to(
            jnp.asarray(dead_zone, jnp.int32).reshape(-1), (3,))
        sub = (chans if active == (0, 1, 2)
               else jnp.stack([chans[c] for c in active]))
        ai = jnp.asarray(active, jnp.int32)
        symbols = forward_quant_pallas(
            sub, wavelet_type, s3[ai], d3[ai]
        ).reshape(len(active), p)
    else:
        symbols = _transform_symbols(
            rgb, step, dead_zone, wavelet_type=wavelet_type, padded=padded,
            levels=levels, interleaved=interleaved)
        flags = jnp.ones((3,), bool)
        if active != (0, 1, 2):
            symbols = jnp.stack([symbols[c] for c in active])
    if pp != p:
        symbols = jnp.pad(symbols, ((0, 0), (0, pp - p)))
    return symbols, block_value_rows(symbols), flags


@partial(jax.jit, static_argnames=("wavelet_type", "padded", "levels", "pp",
                                   "interleaved"))
def encode_deep_sparse_phase1(
    rgb: jnp.ndarray,
    step: jnp.ndarray,
    dead_zone: jnp.ndarray,
    *,
    wavelet_type: WaveletType,
    padded: tuple[int, int, int],
    pp: int,
    levels: int = 1,
    interleaved: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """deep×sparse phase 1: the 6 lo/hi byte planes of
    :func:`encode_deep_device`, block-padded, plus per-plane value-row
    counts — each byte plane then rides the sparse pipeline independently
    (its own bitmap + compacted values)."""
    from .ops.pallas.sparse_kernels import block_value_rows

    pw, ph, pf = padded
    p = pf * ph * pw
    planes, _ = encode_deep_device(
        rgb, step, dead_zone, wavelet_type=wavelet_type, padded=padded,
        levels=levels, interleaved=interleaved,
    )
    if pp != p:
        planes = jnp.pad(planes, ((0, 0), (0, pp - p)))
    return planes, block_value_rows(planes)


# ── Container types ─────────────────────────────────────────────


@dataclass
class ChannelHeader:
    """Per-channel metadata (reference src/pipeline.rs:123-137)."""

    compressed_len: int = 0
    quant_step: int = 1
    quant_dead_zone: int = 1
    num_symbols: int = 0
    histogram: np.ndarray = field(default_factory=lambda: np.zeros(256, np.uint32))

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<IiiI",
            self.compressed_len,
            self.quant_step,
            self.quant_dead_zone,
            self.num_symbols,
        )
        return head + np.ascontiguousarray(self.histogram, np.uint32).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "ChannelHeader":
        compressed_len, step, dz, num_symbols = struct.unpack_from("<IiiI", data, 0)
        hist = np.frombuffer(data, np.uint32, count=256, offset=16).copy()
        return cls(compressed_len, step, dz, num_symbols, hist)


@dataclass
class EncodedChunk:
    """Compressed representation of an RGB frame chunk.

    Mirrors the reference ``EncodedChunk`` (src/pipeline.rs:172-313)
    including serialization.  ``.alc`` bytes produced here decode with the
    reference implementation and vice versa.
    """

    width: int
    height: int
    frames: int
    wavelet_type: WaveletType
    channel_headers: list[ChannelHeader]
    compressed_data: bytes

    @property
    def compressed_size(self) -> int:
        """Total size of the compressed payload in bytes."""
        return len(self.compressed_data)

    @property
    def wavelet(self) -> str:
        """Wavelet name string ("cdf53" | "cdf97" | "haar")."""
        return self.wavelet_type.name_str

    def to_bytes(self) -> bytes:
        """Serialize to a self-contained `.alc` byte buffer (src/pipeline.rs:200-226)."""
        buf = bytearray()
        buf += _MAGIC
        buf.append(_FORMAT_VERSION)
        buf.append(int(self.wavelet_type))
        buf += struct.pack("<III", self.width, self.height, self.frames)
        for ch in self.channel_headers:
            buf += ch.to_bytes()
        buf += self.compressed_data
        return bytes(buf)

    @classmethod
    def from_bytes(cls, data: bytes) -> "EncodedChunk":
        """Parse `.alc` bytes (validation per src/pipeline.rs:235-313)."""
        data = bytes(data)
        min_len = _FIXED_HEADER_BYTES + 3 * _CHANNEL_HEADER_BYTES
        if len(data) < min_len:
            raise InvalidBitstream(
                f"data too short: {len(data)} bytes (minimum {min_len})"
            )
        if data[0:4] != _MAGIC:
            raise InvalidBitstream("bad magic (expected ALCC)")
        version = data[4]
        if version != _FORMAT_VERSION:
            raise InvalidBitstream(
                f"unsupported version: {version} (expected {_FORMAT_VERSION})"
            )
        wavelet_type = WaveletType.from_u8(data[5])
        width, height, frames = struct.unpack_from("<III", data, 6)

        headers = []
        off = _FIXED_HEADER_BYTES
        total_compressed = 0
        for _ in range(3):
            hdr = ChannelHeader.from_bytes(data[off : off + _CHANNEL_HEADER_BYTES])
            headers.append(hdr)
            off += _CHANNEL_HEADER_BYTES
            total_compressed += hdr.compressed_len
        if len(data) < off + total_compressed:
            raise InvalidBitstream(
                f"truncated payload: need {off + total_compressed - len(data)} more bytes"
            )
        payload = data[off : off + total_compressed]
        return cls(width, height, frames, wavelet_type, headers, payload)

    def __repr__(self) -> str:
        return (
            f"EncodedChunk({self.width}x{self.height}x{self.frames}, "
            f"{self.compressed_size} bytes, {self.wavelet})"
        )


def _decode_channel(
    stream: bytes, n_symbols: int, histogram, *, strict: bool = False
) -> np.ndarray:
    """rANS-decode one channel, auto-detecting the table variant.

    Decode with the reference-exact table first and verify the rANS
    final-state invariant (a correctly decoded stream always ends with
    state == RANS32_L and every byte consumed — the decoder walks back to
    the encoder's initial state).  On violation the stream was encoded
    with the sanitized table (overflow regime); retry with it.

    ``strict``: when neither table satisfies the invariant the stream is
    genuinely corrupt; raise ``InvalidBitstream`` instead of returning the
    garbage symbols (the permissive default mirrors the reference decoder,
    which performs no such check at all — src/rans.rs:351-381).
    """
    from .ops.rans import RANS32_L

    table = FrequencyTable.from_histogram(histogram)
    dec = RansDecoder(stream)
    syms = dec.decode_n(n_symbols, table)
    if dec.state == RANS32_L and dec.pos == len(stream):
        return syms
    table_s = FrequencyTable.from_histogram(histogram, sanitize=True)
    if not np.array_equal(table_s.freqs, table.freqs):
        dec = RansDecoder(stream)
        syms_s = dec.decode_n(n_symbols, table_s)
        if dec.state == RANS32_L and dec.pos == len(stream):
            return syms_s
    if strict:
        raise InvalidBitstream(
            "rANS final-state invariant violated: corrupt channel stream"
        )
    return syms  # neither satisfies the invariant (foreign corrupt stream)


def _empty_chunk(width: int, height: int, frames: int, wt: WaveletType) -> EncodedChunk:
    return EncodedChunk(
        width,
        height,
        frames,
        wt,
        [ChannelHeader() for _ in range(3)],
        b"",
    )


# ── FrameEncoder / FrameDecoder ─────────────────────────────────


class FrameEncoder:
    """Video frame encoder (reference src/pipeline.rs:335-508, API per
    src/python.rs:365-436).

    >>> import numpy as np
    >>> rgb = np.full(4 * 4 * 2 * 3, 128, np.uint8)
    >>> chunk = FrameEncoder(quality=80).encode(rgb, 4, 4, 2)
    >>> out = FrameDecoder().decode(chunk)
    >>> out.shape == rgb.shape
    True
    """

    def __init__(self, quality: int = 90, wavelet: str | WaveletType = "cdf53"):
        self.quality = int(quality)
        self.wavelet_type = (
            wavelet if isinstance(wavelet, WaveletType) else WaveletType.from_name(wavelet)
        )

    @classmethod
    def with_wavelet(cls, quality: int, wavelet_type: WaveletType) -> "FrameEncoder":
        return cls(quality, wavelet_type)

    def encode(
        self, rgb_frames, width: int, height: int, frames: int
    ) -> EncodedChunk:
        """Encode interleaved RGB bytes ``[R0,G0,B0, R1,G1,B1, ...]``.

        Accepts a flat uint8 array (reference layout) or ``(T, H, W, 3)``.
        """
        w, h, f = int(width), int(height), int(frames)
        n_pixels = checked_pixel_count(w, h, f)

        rgb = np.ascontiguousarray(rgb_frames, np.uint8)

        if n_pixels == 0:
            if rgb.size != 0:
                raise InvalidBufferSize(0, rgb.size)
            return _empty_chunk(w, h, f, self.wavelet_type)
        if w == 0 or h == 0:
            raise InvalidDimensions(w, h)
        if rgb.size != n_pixels * 3:
            raise InvalidBufferSize(n_pixels * 3, rgb.size)

        rgb = rgb.reshape(f, h, w, 3)
        padded = padded_dims(w, h, f)
        pw, ph, pf = padded
        padded_pixels = pw * ph * pf

        step = quality_to_step(self.quality)
        dead_zone = step  # Quantizer::new semantics (src/quant.rs:70-75)

        symbols_dev, hists_dev = encode_device(
            jnp.asarray(rgb),
            jnp.int32(step),
            jnp.int32(dead_zone),
            wavelet_type=self.wavelet_type,
            padded=padded,
        )
        symbols = np.asarray(jax.device_get(symbols_dev))
        hists = np.asarray(jax.device_get(hists_dev)).astype(np.uint32)

        def encode_channel(ch: int) -> bytes:
            # Reference-exact table first: whenever the reference's coder can
            # represent this stream, our bytes match it exactly.  If a slot
            # overflows PROB_SCALE (the reference would corrupt the stream —
            # see ops/rans.py), re-encode with the sanitized table; the
            # decoder detects which table was used via the rANS final-state
            # invariant.
            table = FrequencyTable.from_histogram(hists[ch])
            enc = RansEncoder()
            enc.encode_symbols(symbols[ch], table)
            if enc.overflowed:
                table = FrequencyTable.from_histogram(hists[ch], sanitize=True)
                enc = RansEncoder()
                enc.encode_symbols(symbols[ch], table)
            return enc.finish()

        # The native coder releases the GIL: channels run concurrently on
        # multi-core hosts (the serial per-stream chain is the format's).
        if (os.cpu_count() or 1) >= 2:
            with ThreadPoolExecutor(3) as pool:
                compressed_channels = list(pool.map(encode_channel, range(3)))
        else:
            compressed_channels = [encode_channel(ch) for ch in range(3)]

        headers: list[ChannelHeader] = []
        payload = bytearray()
        for ch, compressed in enumerate(compressed_channels):
            headers.append(
                ChannelHeader(
                    compressed_len=len(compressed),
                    quant_step=step,
                    quant_dead_zone=dead_zone,
                    num_symbols=padded_pixels,
                    histogram=hists[ch],
                )
            )
            payload += compressed

        return EncodedChunk(
            w, h, f, self.wavelet_type, headers, bytes(payload)
        )


class FrameDecoder:
    """Video frame decoder (reference src/pipeline.rs:519-631)."""

    def __init__(self) -> None:
        pass

    def decode(
        self, chunk: EncodedChunk, *, exact: bool = False,
        strict: bool = False,
    ) -> np.ndarray:
        """Decode a chunk back to flat interleaved RGB uint8 bytes.

        ``exact=True`` uses the exact-undo wavelet inverse (better
        reconstruction); the default matches reference decoder output
        bit-for-bit.  ``strict=True`` raises ``InvalidBitstream`` when a
        channel stream fails the rANS final-state invariant (detected
        corruption) instead of returning garbage pixels.
        """
        w, h, f = int(chunk.width), int(chunk.height), int(chunk.frames)
        n_pixels = checked_pixel_count(w, h, f)
        if n_pixels == 0:
            return np.empty(0, np.uint8)

        padded = padded_dims(w, h, f)
        pw, ph, pf = padded
        padded_pixels = pw * ph * pf

        symbols = np.empty((3, padded_pixels), np.uint8)
        steps = np.empty(3, np.int32)
        streams = []
        offset = 0
        for ch_idx, hdr in enumerate(chunk.channel_headers):
            if hdr.num_symbols != padded_pixels:
                raise InvalidBitstream(
                    f"channel {ch_idx}: num_symbols {hdr.num_symbols} != "
                    f"padded_pixels {padded_pixels}"
                )
            end = offset + hdr.compressed_len
            if end > len(chunk.compressed_data):
                raise InvalidBitstream(f"channel {ch_idx}: compressed data overrun")
            streams.append(chunk.compressed_data[offset:end])
            offset = end
            steps[ch_idx] = hdr.quant_step

        def decode_channel(ch_idx: int) -> None:
            symbols[ch_idx] = _decode_channel(
                streams[ch_idx], padded_pixels,
                chunk.channel_headers[ch_idx].histogram, strict=strict,
            )

        if (os.cpu_count() or 1) >= 2:
            with ThreadPoolExecutor(3) as pool:
                list(pool.map(decode_channel, range(3)))
        else:
            for ch_idx in range(3):
                decode_channel(ch_idx)

        rgb_dev = decode_device(
            jnp.asarray(symbols),
            jnp.asarray(steps),
            jnp.asarray(steps),  # dead_zone unused by dequantize
            wavelet_type=chunk.wavelet_type,
            dims=(w, h, f),
            padded=padded,
            exact=exact,
        )
        return np.asarray(jax.device_get(rgb_dev)).reshape(-1)
