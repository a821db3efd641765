"""ALC3: the fully-fused TPU-native chunk codec.

This is the flagship performance path.  Where `.alc` (pipeline.py) is the
reference-compatible format and ALC2 (parallel/batch.py) generalizes its
byte-lane streams, ALC3 re-architects the wire itself for the TPU
(ops/rans_word.py): word-rANS segments in emission order, encoded and
decoded by the Pallas kernels in ops/pallas/rans3_kernels.py.

The codec is a handful of jitted device programs per chunk shape:

* encode (one program): uint8 RGB → color → pad → 3D wavelet → quantize
  → zigzag → histogram → **on-device frequency tables** → Pallas segment
  encode.  Output (streams, counts, histograms) stays in HBM; nothing
  touches the host.
* decode (two dispatches — the fused form sat at the 1080p HBM ceiling):
  (streams, counts, histograms) → on-device tables → Pallas segment
  decode → symbols; then dequantize → inverse wavelet → color → uint8.
* mode variants (rdo / deep / sparse / multi-level) swap stage programs
  but keep the same structure.

A roundtrip therefore never leaves the device — the HBM-resident
``DeviceChunk`` is the TPU analog of the reference's in-RAM
``EncodedChunk`` (src/pipeline.rs:172).  Container serialization
(:meth:`Alc3Codec.to_bytes` / :meth:`from_bytes`) compacts the padded
segment streams into host bytes for storage/interchange, and is bit-stable
against the NumPy spec (tests/test_alc3.py): a pure-host decoder
(ops/rans_word.decode_channel_words) reads the same container.

Container layout (little-endian)::

    "ALC3" | version u8 (=_VERSION3) | wavelet u8 | w u32 | h u32 | f u32
    n_chunks u32 | s_seg u32 | n_segments u32
    per chunk × n_chunks:
        flags u8 (bit 0: RDO steps; bit 1: deep symbols; bits 2-3:
            decomposition depth − 1; bit 4: sparse significance coding)
        per plane × (6 if deep else 3):
            ChannelHeader (1040 B, identical to .alc; compressed_len bytes)
            n_segments × u32 per-segment word counts
            [flags&1] 8 × i32 per-band quant steps (SubBand3D order)
    payload: per chunk/plane/segment, the meaningful u16 words (LE)

Deep chunks code the unwrapped 16-bit zigzag as lo/hi byte planes
(plane order Y-lo, Y-hi, Co-lo, Co-hi, Cg-lo, Cg-hi) — the escape
mechanism that makes q=100 end-to-end lossless on arbitrary content
(the reference's u8 zigzag wraps at |q| > 127, src/quant.rs:558-559).

Every chunk remains independently decodable (self-contained headers and
histograms), preserving the checkpoint/resume property of `.alc`.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .core import WaveletType, padded_dims, padded_dims_levels, quality_to_step
from .errors import InvalidBitstream, InvalidBufferSize
from .ops.pallas.rans3_kernels import (
    DEFAULT_V_SEG,
    NG,
    decode_words_pallas,
    encode_words_pallas,
    stream_rows,
)
from .ops.pallas.sparse_kernels import (
    BLOCK_ROWS,
    TILE_ROWS,
    DEFAULT_V_BLK,
    block_geometry,
    block_value_rows,
    compact_pallas,
    expand_pallas,
    plane_row_bases,
    value_row_bases,
)
from .ops.quant import AnalyticalRDO
from .ops.tables_device import freq_table_device
from .pipeline import (
    ChannelHeader,
    decode_bands_device,
    decode_deep_device,
    decode_device,
    encode_bands_device,
    encode_deep_device,
    encode_deep_sparse_phase1,
    encode_device,
    encode_sparse_phase1,
    transform_moments_device,
)

__all__ = ["DEFAULT_S_SEG", "DeviceChunk", "Alc3Codec"]

#: Default segment length (symbol rows per segment).  262144 symbols per
#: segment: large enough that the 2·128-word state flush costs <1% of the
#: compressed size, small enough that a segment's worst-case stream block
#: (s_seg+3 rows ≈ 1 MB) pipelines comfortably in VMEM.
DEFAULT_S_SEG = 2048

_MAGIC3 = b"ALC3"
#: v5: sparse value planes pad per 8-row TILE (sparse_kernels wire v5 —
#: row-aligned tiles, no serial kernel chains); v4: coefficients ride the
#: INTERLEAVED wavelet layout (low at even indices —
#: wavelet.forward_3d_inter), a fixed permutation of the v3 symbol
#: ordering; v3: sparse planes moved to the block-major layout of
#: ops/pallas/sparse_kernels.py.
_VERSION3 = 7  # v6: PROB_BITS 12 → 11; v7: zero-frequency absent symbols
               # + elided dense-plane bitmaps (ops/rans_word.py rationale)
#: histogram subsampling stride for ALC3 table seeding (see
#: pipeline._hist_sample) — the full-plane one-hot histogram was the
#: single biggest transform-stage item at 1080p (98 ms measured).  The
#: stored (wire) histograms are the sampled ones, so encode and decode
#: build identical tables; _table_hists scales the padding mass by the
#: same stride to keep proportions.
HIST_STRIDE = 16

_FLAG_RDO = 1
_FLAG_DEEP = 2
_FLAG_SPARSE = 16  # bits 2-3 hold the decomposition depth


def _segment_geometry(
    padded_pixels: int, s_seg: int, v_seg: int = DEFAULT_V_SEG
) -> tuple[int, int]:
    """(n_segments per channel, padded symbol count per channel).

    n_segments is rounded up to a multiple of ``v_seg`` so the kernels'
    V-batched grid divides evenly; the extra all-zero segments cost a few
    hundred wire bytes each.
    """
    seg = s_seg * NG
    n_seg = -(-padded_pixels // seg)
    n_seg += (-n_seg) % v_seg
    return n_seg, n_seg * seg


def _table_hists(hists, nsym: int, *, s_seg: int,
                 v_seg: int = DEFAULT_V_SEG):
    """Histograms for table construction: the kernels code the full
    padded segment grid, so the (m − nsym) padding zeros must carry
    probability mass — without this every padding zero costs ~7 bits
    (tables would give symbol 0 only its content frequency).  Applied
    identically on encode and decode (m is derived from the static
    geometry), so the STORED histograms remain the true content
    histograms (.alc parity)."""
    _, m = _segment_geometry(nsym, s_seg, v_seg)
    if m == nsym:
        return hists
    pad = -(-(m - nsym) // HIST_STRIDE)  # scaled like the sampled hists
    return hists.at[..., 0].add(jnp.uint32(pad))


def _pick_v_seg(n_seg: int) -> int:
    """Largest batching factor ≤ DEFAULT_V_SEG dividing the segment count
    (containers may carry any n_seg; execution adapts)."""
    v = DEFAULT_V_SEG
    while n_seg % v:
        v //= 2
    return v


@partial(jax.jit, static_argnames=(
    "wavelet_type", "padded", "s_seg", "v_seg", "levels"))
def _encode_chunk(rgb, step, dead_zone, *, wavelet_type, padded, s_seg,
                  v_seg, levels=1):
    """Full fused encode: RGB (T,H,W,3) uint8 → (streams, counts, hists)."""
    symbols, hists = encode_device(
        rgb, step, dead_zone, wavelet_type=wavelet_type, padded=padded,
        levels=levels, hist_stride=HIST_STRIDE, interleaved=True,
    )
    hists = _covered_hist(hists, symbols)
    p = padded[0] * padded[1] * padded[2]
    freqs, cums = jax.vmap(freq_table_device)(
        _table_hists(hists, p, s_seg=s_seg, v_seg=v_seg))
    n_seg, m = _segment_geometry(p, s_seg, v_seg)
    sym = symbols.astype(jnp.int32)
    if m != p:
        sym = jnp.pad(sym, ((0, 0), (0, m - p)))
    sym = sym.reshape(3 * n_seg, s_seg, NG)
    streams, counts = encode_words_pallas(sym, freqs, cums, v_seg=v_seg)
    return streams, counts, hists


def _segment_symbols(symbols, n_planes, *, padded, s_seg, v_seg):
    """(n_planes, P) symbols → (n_planes·n_seg, s_seg, NG) segment rows."""
    p = padded[0] * padded[1] * padded[2]
    n_seg, m = _segment_geometry(p, s_seg, v_seg)
    sym = symbols.astype(jnp.int32)
    if m != p:
        sym = jnp.pad(sym, ((0, 0), (0, m - p)))
    return sym.reshape(n_planes * n_seg, s_seg, NG)


@partial(jax.jit, static_argnames=(
    "wavelet_type", "padded", "s_seg", "v_seg", "levels"))
def _encode_chunk_deep(rgb, step, dead_zone, *, wavelet_type, padded,
                       s_seg, v_seg, levels=1):
    """Deep (16-bit symbol) fused encode: 6 planes, 6 tables."""
    planes, hists = encode_deep_device(
        rgb, step, dead_zone, wavelet_type=wavelet_type, padded=padded,
        levels=levels, hist_stride=HIST_STRIDE, interleaved=True,
    )
    hists = _covered_hist(hists, planes)
    p = padded[0] * padded[1] * padded[2]
    freqs, cums = jax.vmap(freq_table_device)(
        _table_hists(hists, p, s_seg=s_seg, v_seg=v_seg))
    sym = _segment_symbols(planes, 6, padded=padded, s_seg=s_seg,
                           v_seg=v_seg)
    streams, counts = encode_words_pallas(sym, freqs, cums, v_seg=v_seg)
    return streams, counts, hists


@partial(jax.jit, static_argnames=("padded", "s_seg", "v_seg"))
def _entropy_decode_deep_jit(streams, counts, hists, *, padded, s_seg,
                             v_seg):
    p = padded[0] * padded[1] * padded[2]
    freqs, cums = jax.vmap(freq_table_device)(
        _table_hists(hists, p, s_seg=s_seg, v_seg=v_seg))
    sym = decode_words_pallas(
        streams, counts, freqs, cums, s_seg=s_seg, v_seg=v_seg
    )
    return sym.reshape(6, -1)[:, :p].astype(jnp.uint8)


def _decode_chunk_deep(streams, counts, hists, steps, *, wavelet_type, dims,
                       padded, s_seg, v_seg, exact=False, levels=1):
    # two dispatches — see _decode_chunk on the HBM peak
    planes = _entropy_decode_deep_jit(streams, counts, hists, padded=padded,
                                      s_seg=s_seg, v_seg=v_seg)
    return decode_deep_device(
        planes, steps, wavelet_type=wavelet_type, dims=dims,
        padded=padded, exact=exact, levels=levels, interleaved=True,
    )


def _encode_batch_core(rgb, step, dead_zone, *, wavelet_type, padded,
                       s_seg, v_seg, levels=1):
    """Batched fused encode: (B,T,H,W,3) → one kernel dispatch.

    Chunks are independent, so B chunks are simply 3·B table groups for
    the segment kernels — the whole batch is ONE pallas grid (plus a
    vmapped transform), not a Python loop (round-1 weakness #4)."""
    b = rgb.shape[0]
    symbols, hists = jax.vmap(
        lambda r: encode_device(
            r, step, dead_zone, wavelet_type=wavelet_type, padded=padded,
            levels=levels, hist_stride=HIST_STRIDE, interleaved=True,
        )
    )(rgb)                                    # (B,3,P), (B,3,256)
    p = padded[0] * padded[1] * padded[2]
    hists = _covered_hist(
        hists.reshape(b * 3, 256), symbols.reshape(b * 3, p)
    ).reshape(b, 3, 256)
    flat_hists = _table_hists(
        hists.reshape(b * 3, 256), p, s_seg=s_seg, v_seg=v_seg)
    freqs, cums = jax.vmap(freq_table_device)(flat_hists)
    n_seg, m = _segment_geometry(p, s_seg, v_seg)
    sym = symbols.reshape(b * 3, p).astype(jnp.int32)
    if m != p:
        sym = jnp.pad(sym, ((0, 0), (0, m - p)))
    sym = sym.reshape(b * 3 * n_seg, s_seg, NG)
    streams, counts = encode_words_pallas(sym, freqs, cums, v_seg=v_seg)
    return streams, counts, hists


_encode_chunk_batch = jax.jit(
    _encode_batch_core,
    static_argnames=("wavelet_type", "padded", "s_seg", "v_seg", "levels"),
)


def _decode_batch_core(streams, counts, hists, steps, *, wavelet_type,
                       dims, padded, s_seg, v_seg, exact=False, levels=1):
    """Batched fused decode: one kernel dispatch + vmapped inverse
    transform.  ``hists``: (B,3,256); ``steps``: (B,3)."""
    b = hists.shape[0]
    p0 = padded[0] * padded[1] * padded[2]
    freqs, cums = jax.vmap(freq_table_device)(
        _table_hists(hists.reshape(b * 3, 256), p0, s_seg=s_seg,
                     v_seg=v_seg))
    sym = decode_words_pallas(
        streams, counts, freqs, cums, s_seg=s_seg, v_seg=v_seg
    )
    p = padded[0] * padded[1] * padded[2]
    sym = sym.reshape(b, 3, -1)[:, :, :p].astype(jnp.uint8)
    return jax.vmap(
        lambda s, st: decode_device(
            s, st, st, wavelet_type=wavelet_type, dims=dims, padded=padded,
            exact=exact, levels=levels, interleaved=True,
        )
    )(sym, steps)


_decode_chunk_batch = jax.jit(
    _decode_batch_core,
    static_argnames=("wavelet_type", "dims", "padded", "s_seg", "v_seg",
                     "exact", "levels"),
)


def _sparse_pp(p: int) -> int:
    """Channel symbols padded to whole compaction blocks (the sparse wire
    codes this padded plane; decoders strip back to ``p``).  Padded to
    DEFAULT_V_BLK blocks so the kernels always get their full chain
    interleaving (1080p×64 gives 2025 blocks — an odd count that would
    otherwise force v_blk=1, serializing the kernels)."""
    blk = BLOCK_ROWS * NG * DEFAULT_V_BLK
    return -(-p // blk) * blk


def _pick_v_blk(nb: int) -> int:
    """Compaction blocks per kernel slot: largest factor ≤ DEFAULT_V_BLK
    dividing the per-channel block count."""
    v = DEFAULT_V_BLK
    while nb % v:
        v //= 2
    return v


#: Per-plane dense/sparse crossover, as a fraction of the plane's total
#: value rows.  Round-5 calibration (1080p×64 stage profile): the compact
#: kernel scans non-skipped positions at ~1.3 Gpos/s and expand is
#: comparable, while the round-4 fused-LUT entropy kernels code straight
#: through at ~1.07 Genc / 1.77 Gdec sym/s — so at row densities past a
#: few percent the bitmap+values detour costs MORE wall-clock than dense
#: coding unless whole tiles skip (`pl.when` on empty 8-row tiles), and
#: wire v7 makes dense zeros nearly free in rate too (~0.04 bits/pos at
#: 10 % density).  The sparse wire still wins on genuinely sparse planes,
#: where tile skips drop the compact scan cost toward zero and value
#: segments elide.  5 % is the measured indifference point on the bench
#: content (ALC_DENSE_FRAC overrides for experiments).  A dense plane
#: stays INSIDE the sparse wire: kcap equals the full dense capacity
#: (the decoder's marker — its value section IS the raw symbol plane and
#: the expand kernel is skipped), and since wire v7 its never-read
#: all-ones bitmap ships as elided count-0 segments.
DENSE_ROW_FRAC = float(os.environ.get("ALC_DENSE_FRAC", "0.05"))


def _bucket_nv(need_rows: int, s_seg: int, max_nv: int | None = None) -> int:
    """Value-plane segment count covering ``need_rows`` value rows.

    Multiples of DEFAULT_V_SEG (so the kernels get their full V-batching
    AND the wire geometry agrees with :func:`_segment_geometry`'s
    padding — from_bytes recomputes ns with the default v_seg) on a
    3-bit mantissa grid — bounded capacity waste with a bounded number
    of jit specializations per octave (round 2 used power-of-2 buckets:
    up to 2× waste, which the value kernels paid 1:1 in wall-clock).

    ``max_nv``: the dense plane's segment count (a DEFAULT_V_SEG
    multiple) — the bucket is clamped to it so a near-dense plane never
    rounds up past the from_bytes capacity bound (the value plane can
    never need more rows than the dense plane has).

    ``need_rows == 0`` returns 0 — the plane has no nonzero symbols at
    all, and the wire elides it entirely (kcap 0: no bitmap or value
    streams; the decoder reconstructs exact zeros).  Callers that must
    keep a plane coded (the mesh paths, whose phase-2 program is shared
    across shards) clamp the result themselves."""
    if need_rows == 0:
        return 0
    nvu = max(DEFAULT_V_SEG, -(-need_rows // s_seg))
    nvu = -(-nvu // DEFAULT_V_SEG) * DEFAULT_V_SEG
    g = 1 << max((DEFAULT_V_SEG - 1).bit_length(), (nvu - 1).bit_length() - 3)
    nvu = -(-nvu // g) * g
    if max_nv is not None:
        nvu = min(nvu, max_nv)
    return nvu


def _covered_hist(hists, symbols):
    """Wire v7 coverage floor for header histograms (see
    ops/rans_word.freq_table_words): every bin up to the plane's EXACT
    symbol maximum is lifted to ≥ 1, so a zero bin in the (row-sampled)
    histogram is a promise the symbol never occurs and the tables can
    give absent symbols frequency 0 — refunding the min-1 floor's
    ~12.5 % probability-mass tax at PROB_BITS=11.  The max is one exact
    device reduction over the plane (XLA fuses it into the producer);
    ``hists``: (n, 256) uint32, ``symbols``: (n, P) uint8/int32."""
    mx = jnp.max(symbols.astype(jnp.int32), axis=-1)
    idx = jnp.arange(256, dtype=jnp.int32)
    return jnp.where(idx[None, :] <= mx[:, None],
                     jnp.maximum(hists, jnp.uint32(1)), hists)


def _sampled_len(n: int, stride: int = HIST_STRIDE) -> int:
    """Length of pipeline._hist_sample's output for an ``n``-symbol plane
    (used to synthesize the all-zeros histogram of an elided plane)."""
    blk = stride * NG
    nb = n // blk
    return nb * NG if nb else n


@partial(jax.jit, static_argnames=("pp", "s_seg", "krs", "v_b",
                                   "wire_active", "wire_nc", "dense"))
def _encode_chunk_sparse(symbols, ch_rows, *, pp, s_seg, krs, v_b,
                         wire_active=None, wire_nc=None, dense=()):
    """Sparse phase 2: Pallas compact → bitmap + value planes → entropy
    kernels.

    ``symbols``: (npv, pp) uint8 — the PROVIDED planes (all wire planes,
    or only the transform-active subset when the encoder elided zero
    channels); ``krs``: per-provided-plane value capacity rows (kcap =
    krs[i]·128, segment-aligned — planes differ: chroma is far sparser
    than luma).  ``krs[i] == 0`` elides plane i from the wire entirely
    (no bitmap or value streams — a plane with zero nonzero symbols has
    an all-zero bitmap, so kcap 0 alone reconstructs it exactly).

    ``dense``: provided-plane indices coded DENSE within the sparse wire
    (see DENSE_ROW_FRAC): the plane's value section is the raw symbol
    plane (zero-padded to its full-capacity kcap) and its bitmap is
    all-ones — no compact kernel touches it.  ``krs[i]`` for a dense
    plane must be the full dense capacity (kcap == the dense plane
    symbol count), which is what marks it for decoders.

    ``wire_active``: wire plane index of each provided plane (default
    ``range(npv)``); ``wire_nc``: total wire planes (default npv).  The
    returned hists are in FULL wire layout ``(2·wire_nc, 256)`` —
    bitmap rows then value rows, with synthesized rows (all-zeros plane
    histogram / zeros) for elided planes.  Streams/counts carry the
    CODED planes only: the bitmap group's ``na·nb`` streams first (wire
    plane order), then each coded plane's value streams."""
    br = BLOCK_ROWS
    npv = symbols.shape[0]
    if wire_active is None:
        wire_active = tuple(range(npv))
    if wire_nc is None:
        wire_nc = npv
    coded = tuple(i for i in range(npv) if krs[i] > 0)
    sp = tuple(c for c in coded if c not in dense)
    _, nbk = block_geometry(pp, br)
    from .ops.quant import build_histogram
    from .pipeline import _hist_sample

    values = {}
    bm_parts = {}
    if sp:
        sym_sp = (symbols if len(sp) == npv
                  else jnp.stack([symbols[c] for c in sp]))
        krs_sp = tuple(krs[c] for c in sp)
        # per-TILE nonzero counts → ceil rows per tile → rows per kernel
        # block (wire v5 tile-major padding; must agree with
        # sparse_kernels.block_value_rows / value_row_bases exactly)
        blk = TILE_ROWS * NG
        cnt = jnp.sum(
            (sym_sp.reshape(len(sp), nbk, br // TILE_ROWS, blk) != 0
             ).astype(jnp.int32), axis=-1)
        rows = jnp.sum(-(-cnt // NG), axis=-1)
        # clamp to capacity: encode() dispatches phase 2 OPTIMISTICALLY
        # with the cached buckets and re-dispatches bigger if ch_rows
        # overflowed — the clamp keeps the kernel's value-window DMAs in
        # bounds meanwhile
        excl = jnp.minimum(jnp.cumsum(rows, axis=-1) - rows,
                           jnp.asarray(krs_sp, jnp.int32)[:, None])
        bases, _ = plane_row_bases(krs_sp, br)
        vbase = (excl + jnp.asarray(bases, jnp.int32)[:, None]).reshape(-1)
        bm, vals = compact_pallas(
            sym_sp, vbase, p=pp, kr=krs_sp, br=br, v_blk=_pick_v_blk(nbk))
        # per-plane value slices (capacity rows only; mask the
        # UNSPECIFIED rows between ch_rows and capacity to the zero
        # padding symbol)
        for i, c in enumerate(sp):
            region = jax.lax.dynamic_slice_in_dim(vals, bases[i], krs[c])
            ridx = jnp.arange(krs[c], dtype=jnp.int32)
            region = jnp.where(ridx[:, None] < ch_rows[c], region, 0)
            values[c] = region.reshape(krs[c] * NG).astype(jnp.uint8)
            bm_parts[c] = bm[i].astype(jnp.uint8)
    for c in dense:
        # dense plane: raw symbols (zero-padded to full capacity), bitmap
        # all-ones — reconstructs identically through a generic expand
        values[c] = jnp.pad(symbols[c], (0, krs[c] * NG - pp))
        bm_parts[c] = jnp.full((pp // 8,), 255, jnp.uint8)
    bitmaps = jnp.stack([bm_parts[c] if c in bm_parts
                         else jnp.zeros((pp // 8,), jnp.uint8)
                         for c in range(npv)])
    bm_hists = _covered_hist(
        jax.vmap(build_histogram)(_hist_sample(bitmaps, HIST_STRIDE)),
        bitmaps)
    # full wire-layout histogram block: real rows for provided planes,
    # synthesized rows for elided ones (an elided plane's true bitmap
    # histogram is all mass at 0; its value plane has no symbols)
    zero_bm_hist = jnp.zeros((256,), jnp.uint32).at[0].set(
        _sampled_len(pp // 8))
    zero_v_hist = jnp.zeros((256,), jnp.uint32)
    pos = {w: i for i, w in enumerate(wire_active)}
    hist_rows = []
    for w in range(wire_nc):
        hist_rows.append(bm_hists[pos[w]] if w in pos else zero_bm_hist)
    for w in range(wire_nc):
        i = pos.get(w)
        if i is not None and i in coded:
            hist_rows.append(_covered_hist(
                build_histogram(
                    _hist_sample(values[i][None, :], HIST_STRIDE)
                )[None, :], values[i][None, :])[0])
        else:
            hist_rows.append(zero_v_hist)
    hists = jnp.stack(hist_rows)

    streams, counts = [], []
    nb, mb = _segment_geometry(pp // 8, s_seg, v_b)
    if coded:
        # Only the SPARSE planes' bitmaps are entropy-coded.  A dense
        # plane's bitmap is all-ones BY DEFINITION of its kcap marker
        # (its value section IS the raw plane), and no decoder in this
        # wire version reads it — so its nb wire segments ship ELIDED
        # (count 0, zero bytes) instead of paying ~0.1-0.2 bits/position
        # to entropy-code a constant.  The all-ones histogram still rides
        # the header as the plane's true bitmap histogram.
        w_rows_b = stream_rows(s_seg)
        if sp:
            bm_coded = (bitmaps if len(sp) == npv
                        else jnp.stack([bitmaps[c] for c in sp]))
            bmh = jnp.stack([hists[wire_active[c]] for c in sp])
            bm_thists = _table_hists(bmh, pp // 8, s_seg=s_seg, v_seg=v_b)
            bm_freqs, bm_cums = jax.vmap(freq_table_device)(bm_thists)
            bmseg = bm_coded.astype(jnp.int32)
            if mb != pp // 8:
                bmseg = jnp.pad(bmseg, ((0, 0), (0, mb - pp // 8)))
            streams_sp, counts_sp = encode_words_pallas(
                bmseg.reshape(len(sp) * nb, s_seg, NG), bm_freqs, bm_cums,
                v_seg=v_b)
        if sp and len(sp) == len(coded):
            streams.append(streams_sp)
            counts.append(counts_sp)
        else:
            # splice elided (zero) rows for dense planes, coded order
            zrow = jnp.zeros((nb, w_rows_b, NG), jnp.int32)
            zcnt = jnp.zeros((nb,), jnp.int32)
            for c in coded:
                if c in sp:
                    j = sp.index(c)
                    streams.append(streams_sp[j * nb : (j + 1) * nb])
                    counts.append(counts_sp[j * nb : (j + 1) * nb])
                else:
                    streams.append(zrow)
                    counts.append(zcnt)
    # one dispatch per value plane (value planes are coded at exactly
    # their own kcap_c symbols, each with its own table)
    for c in coded:
        vf, vc = jax.vmap(freq_table_device)(
            hists[wire_nc + wire_active[c] : wire_nc + wire_active[c] + 1])
        s_v, c_v = encode_words_pallas(
            values[c].astype(jnp.int32).reshape(
                krs[c] // s_seg, s_seg, NG),
            vf, vc, v_seg=_pick_v_seg(krs[c] // s_seg))
        streams.append(s_v)
        counts.append(c_v)
    return (
        jnp.concatenate(streams, axis=0),
        jnp.concatenate(counts, axis=0),
        hists,
    )


def _sparse_entropy_expand(streams, counts, hists, *, p, s_seg, kcaps,
                           v_b, nc=3):
    """Sparse decode front half: bitmap + per-plane value entropy groups
    → expand → (nc, p) uint8 symbols (shared by the fixed-step, RDO, and
    deep sparse decoders).  ``kcaps``: per-plane value capacities —
    ``kcap == 0`` marks an ELIDED plane (zero nonzero symbols; no bitmap
    or value streams on the wire) that reconstructs to exact zeros, and
    ``kcap`` equal to the FULL dense capacity marks a DENSE plane (see
    DENSE_ROW_FRAC): its value section is the raw symbol plane and its
    bitmap sections are all-ones by construction, so the decoder takes
    the value symbols verbatim and skips both the bitmap decode and the
    expand kernel for that plane."""
    br = BLOCK_ROWS
    pp = _sparse_pp(p)
    coded = tuple(c for c in range(nc) if kcaps[c] > 0)
    na = len(coded)
    if na == 0:
        return jnp.zeros((nc, p), jnp.uint8)
    dense_kcap = _segment_geometry(pp, s_seg)[1]
    dense = tuple(c for c in coded if kcaps[c] >= dense_kcap)
    sp = tuple(c for c in coded if c not in dense)
    nb, _ = _segment_geometry(pp // 8, s_seg, v_b)
    bm = None
    if sp:
        bmh = jnp.stack([hists[c] for c in sp])
        bm_thists = _table_hists(bmh, pp // 8, s_seg=s_seg, v_seg=v_b)
        bm_freqs, bm_cums = jax.vmap(freq_table_device)(bm_thists)
        # bitmap stream rows ride in coded order; gather the sparse
        # planes' groups (dense planes' all-ones bitmaps are never read)
        bsel = [slice(coded.index(c) * nb, (coded.index(c) + 1) * nb)
                for c in sp]
        bm = decode_words_pallas(
            jnp.concatenate([streams[s] for s in bsel], axis=0),
            jnp.concatenate([counts[s] for s in bsel], axis=0),
            bm_freqs, bm_cums, s_seg=s_seg, v_seg=v_b,
        ).reshape(len(sp), -1)[:, : pp // 8]
    # per-plane value decode, padded with the br-row DMA margin each
    planes = {}
    parts = []
    row0 = na * nb
    for c in coded:
        kr = kcaps[c] // NG
        nv = kr // s_seg
        vf, vc = jax.vmap(freq_table_device)(hists[nc + c : nc + c + 1])
        v = decode_words_pallas(
            streams[row0 : row0 + nv], counts[row0 : row0 + nv], vf, vc,
            s_seg=s_seg, v_seg=_pick_v_seg(nv),
        ).reshape(kr, NG)
        row0 += nv
        if c in dense:
            planes[c] = v.reshape(-1)[:p].astype(jnp.uint8)
        else:
            parts.append(jnp.pad(v, ((0, br), (0, 0))))
    if sp:
        krs_sp = tuple(kcaps[c] // NG for c in sp)
        vals = jnp.concatenate(parts, axis=0)
        vbase, _ = value_row_bases(bm.astype(jnp.uint8), pp, krs_sp, br=br)
        _, nbk = block_geometry(pp, br)
        sym_sp = expand_pallas(
            bm, vals, vbase, p=pp, kr=krs_sp, br=br, v_blk=_pick_v_blk(nbk)
        )[:, :p].astype(jnp.uint8)
        for i, c in enumerate(sp):
            planes[c] = sym_sp[i]
    if na == nc and not dense:
        return sym_sp
    # scatter coded planes into the full layout; elided planes are zeros
    zero = jnp.zeros((p,), jnp.uint8)
    return jnp.stack([
        planes.get(c, zero) for c in range(nc)
    ])


@partial(jax.jit, static_argnames=(
    "wavelet_type", "dims", "padded", "s_seg", "kcaps", "v_b",
    "exact", "levels"))
def _decode_chunk_sparse(streams, counts, hists, steps, *, wavelet_type,
                         dims, padded, s_seg, kcaps, v_b, exact=False,
                         levels=1):
    p = padded[0] * padded[1] * padded[2]
    symbols = _sparse_entropy_expand(
        streams, counts, hists, p=p, s_seg=s_seg, kcaps=kcaps, v_b=v_b)
    return decode_device(
        symbols, steps, steps, wavelet_type=wavelet_type, dims=dims,
        padded=padded, exact=exact, levels=levels, interleaved=True,
        active=tuple(c for c in range(3) if kcaps[c] > 0),
    )


@partial(jax.jit, static_argnames=(
    "wavelet_type", "dims", "padded", "s_seg", "kcaps", "v_b",
    "exact"))
def _decode_chunk_sparse_rdo(streams, counts, hists, steps8, *,
                             wavelet_type, dims, padded, s_seg, kcaps,
                             v_b, exact=False):
    """Sparse entropy/expand front half + per-band RDO dequantization."""
    p = padded[0] * padded[1] * padded[2]
    symbols = _sparse_entropy_expand(
        streams, counts, hists, p=p, s_seg=s_seg, kcaps=kcaps, v_b=v_b)
    return decode_bands_device(
        symbols, steps8, wavelet_type=wavelet_type, dims=dims,
        padded=padded, exact=exact, interleaved=True,
    )


@partial(jax.jit, static_argnames=(
    "wavelet_type", "dims", "padded", "s_seg", "kcaps", "v_b",
    "exact", "levels"))
def _decode_batch_sparse(streams, counts, hists, steps, *, wavelet_type,
                         dims, padded, s_seg, kcaps, v_b, exact=False,
                         levels=1):
    """Batched sparse decode: ONE entropy+expand pass over B·3 planes,
    then a ``lax.map``'d inverse transform.

    ``streams``/``counts`` are ordered [all chunks' bitmap groups, in
    chunk order][all value planes, global plane order]; ``hists``:
    (B, 6, 256) per-chunk plane histograms; ``kcaps``: B·3 per-plane
    value capacities; ``steps``: (B, 3) int32."""
    b = hists.shape[0]
    hh = jnp.concatenate([
        hists[:, :3].reshape(b * 3, 256),
        hists[:, 3:].reshape(b * 3, 256),
    ])
    p = padded[0] * padded[1] * padded[2]
    symbols = _sparse_entropy_expand(
        streams, counts, hh, p=p, s_seg=s_seg, kcaps=kcaps, v_b=v_b,
        nc=3 * b)
    symbols = symbols.reshape(b, 3, p)
    # zero-channel elision through the inverse transform when every
    # chunk shares the same active set (the common batched case)
    acts = {tuple(c for c in range(3) if kcaps[3 * i + c] > 0)
            for i in range(b)}
    active = acts.pop() if len(acts) == 1 else None
    return jax.lax.map(
        lambda args: decode_device(
            args[0], args[1], args[1], wavelet_type=wavelet_type,
            dims=dims, padded=padded, exact=exact, levels=levels,
            interleaved=True, active=active,
        ),
        (symbols, steps.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=(
    "wavelet_type", "dims", "padded", "s_seg", "kcaps", "v_b",
    "exact", "levels"))
def _decode_chunk_sparse_deep(streams, counts, hists, steps, *,
                              wavelet_type, dims, padded, s_seg, kcaps,
                              v_b, exact=False, levels=1):
    """Sparse entropy/expand over the 6 lo/hi byte planes + deep decode."""
    p = padded[0] * padded[1] * padded[2]
    planes = _sparse_entropy_expand(
        streams, counts, hists, p=p, s_seg=s_seg, kcaps=kcaps, v_b=v_b,
        nc=6)
    return decode_deep_device(
        planes, steps, wavelet_type=wavelet_type, dims=dims,
        padded=padded, exact=exact, levels=levels, interleaved=True,
    )


@partial(jax.jit, static_argnames=(
    "wavelet_type", "padded", "pp", "levels", "active"))
def _sparse_phase1_batch(rgb_batch, step, dead_zone, *, wavelet_type,
                         padded, pp, levels=1, active=(0, 1, 2)):
    """Batched sparse phase 1: (B,T,H,W,3) → ((B·na, pp) symbols,
    (B·na,) value-row counts, (B, 3) flags) in ONE dispatch.

    ``lax.map`` over the chunk axis (not vmap): the per-chunk transform
    body compiles once and chunks execute sequentially inside the one
    program — a chunk already saturates the chip, and the vmapped
    1080p-scale transform is a known remote-compiler pathology
    (parallel/batch.py round-2 note).  ``active``: the shared
    zero-channel-elision set (pipeline.encode_sparse_phase1)."""
    from .pipeline import encode_sparse_phase1

    b = rgb_batch.shape[0]
    na = len(active)
    symbols, ch_rows, flags = jax.lax.map(
        lambda r: encode_sparse_phase1(
            r, step, dead_zone, wavelet_type=wavelet_type, padded=padded,
            pp=pp, levels=levels, interleaved=True, active=active,
        ),
        rgb_batch,
    )                                     # (B,na,pp), (B,na), (B,3)
    return symbols.reshape(b * na, pp), ch_rows.reshape(b * na), flags


@partial(jax.jit, static_argnames=("padded", "pp"))
def _bands_sparse_phase15(coeffs, steps8, dzs8, *, padded, pp):
    """RDO×sparse phase 1.5: per-band quantize → padded symbol plane +
    value-row counts (host fetches the 12-byte counts to size kcap)."""
    from .ops.quant import quantize_bands_inter, to_symbols

    p = padded[0] * padded[1] * padded[2]
    qcoeffs = quantize_bands_inter(coeffs, steps8, dzs8)
    symbols = to_symbols(qcoeffs).reshape(3, p)
    if pp != p:
        symbols = jnp.pad(symbols, ((0, 0), (0, pp - p)))
    return symbols, block_value_rows(symbols)


@partial(jax.jit, static_argnames=("padded", "s_seg", "v_seg"))
def _encode_chunk_rdo(coeffs, steps8, dzs8, *, padded, s_seg, v_seg):
    """RDO phase-2 fused encode: (coeffs, per-band steps) →
    (streams, counts, hists)."""
    symbols, hists = encode_bands_device(
        coeffs, steps8, dzs8, padded=padded, hist_stride=HIST_STRIDE,
        interleaved=True)
    hists = _covered_hist(hists, symbols)
    p = padded[0] * padded[1] * padded[2]
    freqs, cums = jax.vmap(freq_table_device)(
        _table_hists(hists, p, s_seg=s_seg, v_seg=v_seg))
    n_seg, m = _segment_geometry(p, s_seg, v_seg)
    sym = symbols.astype(jnp.int32)
    if m != p:
        sym = jnp.pad(sym, ((0, 0), (0, m - p)))
    sym = sym.reshape(3 * n_seg, s_seg, NG)
    streams, counts = encode_words_pallas(sym, freqs, cums, v_seg=v_seg)
    return streams, counts, hists


@partial(jax.jit, static_argnames=("padded", "s_seg", "v_seg"))
def _entropy_decode_jit(streams, counts, hists, *, padded, s_seg, v_seg):
    return _entropy_decode(streams, counts, hists, padded=padded,
                           s_seg=s_seg, v_seg=v_seg)


def _entropy_decode(streams, counts, hists, *, padded, s_seg, v_seg):
    """Pallas segment decode → (3, P) uint8 symbols."""
    p0 = padded[0] * padded[1] * padded[2]
    freqs, cums = jax.vmap(freq_table_device)(
        _table_hists(hists, p0, s_seg=s_seg, v_seg=v_seg))
    sym = decode_words_pallas(
        streams, counts, freqs, cums, s_seg=s_seg, v_seg=v_seg
    )
    p = padded[0] * padded[1] * padded[2]
    return sym.reshape(3, -1)[:, :p].astype(jnp.uint8)


def _decode_chunk(streams, counts, hists, steps, *, wavelet_type, dims,
                  padded, s_seg, v_seg, exact=False, levels=1):
    """Full decode in TWO dispatches: Pallas entropy decode, then the
    inverse-transform program.  A single fused program held the 1.6 GB
    stream buffers live across the whole inverse-wavelet workspace and
    sat exactly at the 1080p HBM ceiling (intermittent compile OOMs);
    the split halves the peak for ~ms of dispatch overhead."""
    sym = _entropy_decode_jit(streams, counts, hists, padded=padded,
                              s_seg=s_seg, v_seg=v_seg)
    return decode_device(
        sym, steps, steps, wavelet_type=wavelet_type, dims=dims,
        padded=padded, exact=exact, levels=levels, interleaved=True,
    )


@partial(jax.jit, static_argnames=(
    "wavelet_type", "dims", "padded", "s_seg", "v_seg", "exact"))
def _decode_chunk_rdo(streams, counts, hists, steps8, *, wavelet_type, dims,
                      padded, s_seg, v_seg, exact=False):
    """Full fused RDO decode: per-band dequantization (steps8 (3,8))."""
    sym = _entropy_decode(streams, counts, hists, padded=padded,
                          s_seg=s_seg, v_seg=v_seg)
    return decode_bands_device(
        sym, steps8, wavelet_type=wavelet_type, dims=dims,
        padded=padded, exact=exact, interleaved=True,
    )


@dataclass
class DeviceChunk:
    """An HBM-resident compressed chunk (the ALC3 device representation).

    ``streams``: (3·n_seg, stream_rows(s_seg), 128) int32 — padded segment
    word streams; ``counts``: (3·n_seg,) int32 meaningful words per
    segment; ``hists``: (3, 256) uint32.  All jax.Arrays; nothing is
    fetched until :meth:`compressed_size` / serialization asks for counts.
    """

    width: int
    height: int
    frames: int
    wavelet_type: WaveletType
    quant_step: int
    s_seg: int
    streams: jax.Array
    counts: jax.Array
    hists: jax.Array
    #: (3, 8) int32 per-channel per-band quant steps when the chunk was
    #: encoded with AnalyticalRDO; None for fixed-step chunks.
    band_steps: np.ndarray | None = None
    #: deep (16-bit symbol) chunk: 6 lo/hi byte planes instead of 3
    #: channels (ALC3's |q|>127 escape mechanism).
    deep: bool = False
    #: dyadic decomposition depth (1 = reference-equivalent single level).
    levels: int = 1
    #: sparse chunk: 3 significance-bitmap planes + 3 compacted value
    #: planes (kcaps = per-value-plane capacity in symbols,
    #: segment-aligned; planes differ — chroma is sparser than luma).
    sparse: bool = False
    kcaps: tuple[int, ...] = ()

    @property
    def n_planes(self) -> int:
        # sparse chunks carry a bitmap plane + a value plane per byte
        # plane (3 channels, or 6 lo/hi byte planes when deep)
        if self.sparse:
            return 12 if self.deep else 6
        return 6 if self.deep else 3

    @property
    def n_segments(self) -> int:
        """Segments per plane.  Meaningless for sparse chunks (bitmap and
        value planes have different segment counts — use the geometry)."""
        return self.streams.shape[0] // self.n_planes

    @property
    def compressed_size(self) -> int:
        """Wire payload size in bytes (fetches only the tiny counts vector)."""
        return int(np.asarray(self.counts).astype(np.int64).sum()) * 2


class Alc3Codec:
    """TPU-native chunk codec over the ALC3 wire format.

    >>> import numpy as np
    >>> rgb = np.zeros((2, 8, 8, 3), np.uint8)
    >>> codec = Alc3Codec(quality=90, s_seg=8)
    >>> chunk = codec.encode(rgb)
    >>> out = codec.decode(chunk)
    >>> bool((np.asarray(out) == rgb).all())
    True
    """

    def __init__(
        self,
        quality: int = 90,
        wavelet: str | WaveletType = "cdf53",
        *,
        s_seg: int = DEFAULT_S_SEG,
        rdo: bool = False,
        deep: bool | None = None,
        levels: int = 1,
        sparse: bool = False,
    ):
        if s_seg % 8:
            raise ValueError(f"s_seg must be a multiple of 8, got {s_seg}")
        if not 1 <= int(levels) <= 4:
            raise ValueError(f"levels must be in 1..4, got {levels}")
        self.quality = int(quality)
        self.wavelet_type = (
            wavelet if isinstance(wavelet, WaveletType)
            else WaveletType.from_name(wavelet)
        )
        self.s_seg = int(s_seg)
        self.step = quality_to_step(self.quality)
        #: opt-in AnalyticalRDO: per-sub-band steps from device moments
        #: (BASELINE config 2; reference manual pipeline src/quant.rs:472-524)
        self.rdo = bool(rdo)
        #: deep 16-bit symbols (lossless-capable escape coding); defaults
        #: on at q=100 where the u8 zigzag wrap would corrupt large
        #: coefficients (reference limit src/quant.rs:558-559).
        self.deep = (self.quality >= 100) if deep is None else bool(deep)
        if self.rdo and self.deep:
            raise ValueError("rdo and deep modes are mutually exclusive")
        #: dyadic decomposition depth (SURVEY §5.7 extension; reference is
        #: single-level).  levels>1 re-decomposes the LLL octant.
        self.levels = int(levels)
        if self.rdo and self.levels != 1:
            raise ValueError("rdo supports single-level decomposition only")
        #: sparse significance coding: the entropy kernels see a P/8-byte
        #: bitmap plus only the nonzero symbols — a 3-5× entropy-stage
        #: symbol reduction at production qualities AND a rate win
        #: (12.3× vs 10.7× at 1080p q=90), with Pallas compact/expand
        #: kernels (ops/pallas/sparse_kernels.py) doing the data
        #: movement.  Composes with deep (each lo/hi byte plane gets its
        #: own bitmap + compacted value plane — 12 planes), with rdo,
        #: and with multi-level decomposition.
        self.sparse = bool(sparse)

    # ── device path (HBM-resident, zero host traffic) ───────────

    def _sparse_encode_planes(self, symbols, ch_rows, pp, *,
                              wire_active=None, wire_nc=None,
                              chunk_planes=3):
        """Optimistic per-plane capacity bucketing + phase-2 dispatch.

        Phase 2 dispatches immediately with the cached per-plane
        value-capacity buckets (keeping the device busy — no host sync
        before dispatch); the tiny ``ch_rows`` fetch then validates the
        guess and only an overflow re-dispatches with larger buckets
        (the in-graph vbase clamp keeps the optimistic run's DMAs in
        bounds).  Steady streams of similar content pay zero extra
        dispatches.

        ``symbols``: the PROVIDED planes (transform-elided zero planes
        may be absent — ``wire_active`` maps each to its wire index of
        ``wire_nc`` total).  Planes whose row count is 0 get bucket 0 —
        ELIDED from the wire entirely (kcap 0; no bitmap or value
        streams).  The first plane of each chunk (every
        ``chunk_planes``-th wire plane) is kept coded at the minimum
        bucket so a chunk always has at least one segment
        (from_bytes rejects stream-less chunks).  Returns ``(streams,
        counts, hists, kcaps)`` with hists/kcaps in FULL wire layout.
        """
        nb, _ = _segment_geometry(pp // 8, self.s_seg)
        npv = symbols.shape[0]
        if wire_active is None:
            wire_active = tuple(range(npv))
        if wire_nc is None:
            wire_nc = npv
        # bucket ceiling: the dense plane's own segment count (a value
        # plane can never need more rows than the dense plane has, and
        # from_bytes validates capacities against this bound)
        max_nv = _segment_geometry(pp, self.s_seg)[0]

        dense_rows = max_nv * self.s_seg  # full capacity ⇒ DENSE plane

        def bucket(r: int, w: int) -> int:
            if r == 0 and w % chunk_planes == 0:
                # chunk-anchor plane: keep one minimum-capacity coded
                # plane per chunk
                return DEFAULT_V_SEG * self.s_seg
            if r >= DENSE_ROW_FRAC * (pp // NG):
                # above the compact/expand crossover: code the plane
                # DENSE inside the sparse wire (see DENSE_ROW_FRAC)
                return dense_rows
            nv = _bucket_nv(r, self.s_seg, max_nv)
            # a sparse bucket that clamps to full capacity must become
            # dense too — kcap == full capacity is the dense marker, and
            # at that size dense is strictly cheaper anyway
            return dense_rows if nv >= max_nv else nv * self.s_seg

        # capacities are a function of the chunk GEOMETRY, not just the
        # plane count — cache per (wire layout, pp, s_seg) so mixed-shape
        # encodes through one codec never leak a big chunk's buckets into
        # a small chunk's wire (whose from_bytes bound they would exceed)
        cache = getattr(self, "_krs_cache", None)
        if not isinstance(cache, dict):
            cache = {}
            self._krs_cache = cache
        key = (wire_active, wire_nc, pp, self.s_seg)
        krs = cache.get(key)
        if krs is None:
            # cold start: size the buckets from the actual counts rather
            # than paying a throwaway compile of a too-small phase 2
            rows = np.asarray(ch_rows)
            krs = tuple(
                bucket(int(r), w) for r, w in zip(rows, wire_active))
        for _attempt in range(8):
            # planes at full capacity are DENSE by definition (kcap ==
            # dense capacity is the wire marker — _sparse_entropy_expand
            # decodes them verbatim, so the encoder must build them
            # verbatim too, whichever rule set the bucket)
            dense = tuple(
                i for i, k in enumerate(krs) if k == dense_rows)
            streams, counts, hists = _encode_chunk_sparse(
                symbols, ch_rows, pp=pp, s_seg=self.s_seg, krs=krs,
                v_b=_pick_v_seg(nb), wire_active=wire_active,
                wire_nc=wire_nc, dense=dense,
            )
            rows = np.asarray(ch_rows)  # tiny fetch (4·npv bytes)
            if all(int(r) <= k for r, k in zip(rows, krs)):
                break
            krs = tuple(
                max(k, bucket(int(r), w))
                for r, k, w in zip(rows, krs, wire_active))
        cache[key] = krs
        kcaps = [0] * wire_nc
        for i, w in enumerate(wire_active):
            kcaps[w] = krs[i] * NG
        return streams, counts, hists, tuple(kcaps)

    def _sparse_phase2(self, symbols, ch_rows, pp, w, h, t, *,
                       band_steps, deep=False,
                       wire_active=None) -> DeviceChunk:
        """Shared sparse phase 2 (see :meth:`_sparse_encode_planes`)."""
        wire_nc = 6 if deep else 3
        streams, counts, hists, kcaps = self._sparse_encode_planes(
            symbols, ch_rows, pp, wire_active=wire_active,
            wire_nc=wire_nc, chunk_planes=wire_nc)
        return DeviceChunk(
            w, h, t, self.wavelet_type, self.step if band_steps is None
            else int(band_steps.min()), self.s_seg,
            streams, counts, hists, band_steps=band_steps, deep=deep,
            levels=self.levels, sparse=True,
            kcaps=kcaps,
        )

    def encode(self, rgb) -> DeviceChunk:
        """Encode one (T, H, W, 3) uint8 chunk; accepts NumPy (uploaded
        once) or an already device-resident jax.Array."""
        if not isinstance(rgb, jax.Array):
            rgb = np.asarray(rgb, np.uint8)
        if rgb.ndim != 4 or rgb.shape[-1] != 3:
            raise InvalidBufferSize(4, rgb.ndim)
        t, h, w, _ = rgb.shape
        padded = padded_dims_levels(w, h, t, self.levels)
        p = int(np.prod(padded))
        n_seg, _ = _segment_geometry(p, self.s_seg)
        v_seg = _pick_v_seg(n_seg)
        if self.rdo:
            # phase 1: transform + moments; the host turns the (tiny)
            # exact integer moments into per-band steps; phase 2 reuses
            # the HBM-resident coefficients.
            coeffs, s1, s2 = transform_moments_device(
                jnp.asarray(rgb), wavelet_type=self.wavelet_type,
                padded=padded, interleaved=True,
            )
            rdo = AnalyticalRDO.with_quality(self.quality)
            s1_np, s2_np = np.asarray(s1), np.asarray(s2)
            steps = np.empty((3, 8), np.int32)
            dzs = np.empty((3, 8), np.int32)
            for ch in range(3):
                steps[ch], dzs[ch] = rdo.steps_from_moments(
                    p // 8, s1_np[ch], s2_np[ch]
                )
            if self.sparse:
                # rdo×sparse: phase 1.5 quantizes per band and counts the
                # value rows; phase 2 is the shared sparse pipeline.
                pp = _sparse_pp(p)
                symbols, ch_rows = _bands_sparse_phase15(
                    coeffs, jnp.asarray(steps), jnp.asarray(dzs),
                    padded=padded, pp=pp,
                )
                return self._sparse_phase2(
                    symbols, ch_rows, pp, w, h, t, band_steps=steps)
            streams, counts, hists = _encode_chunk_rdo(
                coeffs, jnp.asarray(steps), jnp.asarray(dzs),
                padded=padded, s_seg=self.s_seg, v_seg=v_seg,
            )
            return DeviceChunk(
                w, h, t, self.wavelet_type, int(steps.min()), self.s_seg,
                streams, counts, hists, band_steps=steps,
            )
        if self.sparse:
            pp = _sparse_pp(p)
            if self.deep:
                planes, ch_rows = encode_deep_sparse_phase1(
                    jnp.asarray(rgb), jnp.int32(self.step),
                    jnp.int32(self.step), wavelet_type=self.wavelet_type,
                    padded=padded, pp=pp, levels=self.levels,
                    interleaved=True,
                )
                return self._sparse_phase2(
                    planes, ch_rows, pp, w, h, t, band_steps=None,
                    deep=True)
            # zero-channel elision: transform only the channels the last
            # same-geometry chunk needed (optimistic — the flags fetch
            # below validates; grayscale content costs 1/3 the transform
            # and codes only the luma planes)
            acache = getattr(self, "_active_cache", None)
            if not isinstance(acache, dict):
                acache = {}
                self._active_cache = acache
            akey = (pp, self.s_seg)
            active = acache.get(akey, (0, 1, 2))
            rgb_j = jnp.asarray(rgb)
            symbols, ch_rows, flags = encode_sparse_phase1(
                rgb_j, jnp.int32(self.step), jnp.int32(self.step),
                wavelet_type=self.wavelet_type, padded=padded, pp=pp,
                levels=self.levels, interleaved=True, active=active,
            )
            chunk = self._sparse_phase2(
                symbols, ch_rows, pp, w, h, t, band_steps=None,
                wire_active=active)
            fl = np.asarray(flags)
            needed = tuple(sorted({0} | {c for c in range(3) if fl[c]}))
            if any(c not in active for c in needed):
                # a channel assumed zero is nonzero — full re-dispatch
                symbols, ch_rows, flags = encode_sparse_phase1(
                    rgb_j, jnp.int32(self.step), jnp.int32(self.step),
                    wavelet_type=self.wavelet_type, padded=padded, pp=pp,
                    levels=self.levels, interleaved=True, active=needed,
                )
                chunk = self._sparse_phase2(
                    symbols, ch_rows, pp, w, h, t, band_steps=None,
                    wire_active=needed)
            acache[akey] = needed
            return chunk
        if self.deep:
            streams, counts, hists = _encode_chunk_deep(
                jnp.asarray(rgb),
                jnp.int32(self.step),
                jnp.int32(self.step),
                wavelet_type=self.wavelet_type,
                padded=padded,
                s_seg=self.s_seg,
                v_seg=v_seg,
                levels=self.levels,
            )
            return DeviceChunk(
                w, h, t, self.wavelet_type, self.step, self.s_seg,
                streams, counts, hists, deep=True, levels=self.levels,
            )
        streams, counts, hists = _encode_chunk(
            jnp.asarray(rgb),
            jnp.int32(self.step),
            jnp.int32(self.step),
            wavelet_type=self.wavelet_type,
            padded=padded,
            s_seg=self.s_seg,
            v_seg=v_seg,
            levels=self.levels,
        )
        return DeviceChunk(
            w, h, t, self.wavelet_type, self.step, self.s_seg,
            streams, counts, hists, levels=self.levels,
        )

    def decode(self, chunk: DeviceChunk, *, exact: bool = False,
               as_numpy: bool = False):
        """Decode back to (T, H, W, 3) uint8 — a jax.Array unless
        ``as_numpy``."""
        w, h, t = chunk.width, chunk.height, chunk.frames
        padded = padded_dims_levels(w, h, t, chunk.levels)
        if chunk.band_steps is not None:
            if chunk.sparse:
                p = int(np.prod(padded))
                pp = _sparse_pp(p)
                nb, _ = _segment_geometry(pp // 8, chunk.s_seg)
                rgb = _decode_chunk_sparse_rdo(
                    chunk.streams, chunk.counts, chunk.hists,
                    jnp.asarray(chunk.band_steps, jnp.int32),
                    wavelet_type=chunk.wavelet_type, dims=(w, h, t),
                    padded=padded, s_seg=chunk.s_seg, kcaps=chunk.kcaps,
                    v_b=_pick_v_seg(nb), exact=exact,
                )
            else:
                rgb = _decode_chunk_rdo(
                    chunk.streams, chunk.counts, chunk.hists,
                    jnp.asarray(chunk.band_steps, jnp.int32),
                    wavelet_type=chunk.wavelet_type, dims=(w, h, t),
                    padded=padded, s_seg=chunk.s_seg,
                    v_seg=_pick_v_seg(chunk.n_segments), exact=exact,
                )
            return np.asarray(jax.device_get(rgb)) if as_numpy else rgb
        steps = jnp.full((3,), chunk.quant_step, jnp.int32)
        if chunk.sparse:
            p = int(np.prod(padded))
            pp = _sparse_pp(p)
            nb, _ = _segment_geometry(pp // 8, chunk.s_seg)
            dec = (_decode_chunk_sparse_deep if chunk.deep
                   else _decode_chunk_sparse)
            rgb = dec(
                chunk.streams, chunk.counts, chunk.hists, steps,
                wavelet_type=chunk.wavelet_type, dims=(w, h, t),
                padded=padded, s_seg=chunk.s_seg, kcaps=chunk.kcaps,
                v_b=_pick_v_seg(nb), exact=exact,
                levels=chunk.levels,
            )
            return np.asarray(jax.device_get(rgb)) if as_numpy else rgb
        if chunk.deep:
            rgb = _decode_chunk_deep(
                chunk.streams, chunk.counts, chunk.hists, steps,
                wavelet_type=chunk.wavelet_type, dims=(w, h, t),
                padded=padded, s_seg=chunk.s_seg,
                v_seg=_pick_v_seg(chunk.n_segments), exact=exact,
                levels=chunk.levels,
            )
            return np.asarray(jax.device_get(rgb)) if as_numpy else rgb
        rgb = _decode_chunk(
            chunk.streams, chunk.counts, chunk.hists, steps,
            wavelet_type=chunk.wavelet_type, dims=(w, h, t), padded=padded,
            s_seg=chunk.s_seg, v_seg=_pick_v_seg(chunk.n_segments),
            exact=exact, levels=chunk.levels,
        )
        return np.asarray(jax.device_get(rgb)) if as_numpy else rgb

    # ── batched execution (one dispatch; optional ICI-mesh DP) ──

    def encode_batch(self, rgb_batch, *, mesh=None) -> list[DeviceChunk]:
        """Encode a (B, T, H, W, 3) uint8 batch in ONE device dispatch.

        All B chunks ride a single segment-kernel grid (B·3 table
        groups).  With ``mesh`` (a 1-axis jax.sharding.Mesh whose axis
        divides B) the batch shard_maps over the chunk axis — pure data
        parallelism on ICI; bitstreams are identical to the unsharded
        path.  Fixed-step dense and sparse modes batch; rdo/deep (and
        sparse with a mesh — the capacity fetch is host-side) encode
        per chunk.
        """
        if self.rdo or self.deep:
            return [self.encode(rgb_batch[i])
                    for i in range(rgb_batch.shape[0])]
        if self.sparse:
            if mesh is not None:
                return self._encode_batch_sparse_mesh(rgb_batch, mesh)
            return self._encode_batch_sparse(rgb_batch)
        if not isinstance(rgb_batch, jax.Array):
            rgb_batch = np.asarray(rgb_batch, np.uint8)
        if rgb_batch.ndim != 5 or rgb_batch.shape[-1] != 3:
            raise InvalidBufferSize(5, rgb_batch.ndim)
        b, t, h, w, _ = rgb_batch.shape
        padded = padded_dims_levels(w, h, t, self.levels)
        p = int(np.prod(padded))
        n_seg, _ = _segment_geometry(p, self.s_seg)
        v_seg = _pick_v_seg(n_seg)
        kw = dict(wavelet_type=self.wavelet_type, padded=padded,
                  s_seg=self.s_seg, v_seg=v_seg, levels=self.levels)
        step = jnp.int32(self.step)
        if mesh is None:
            streams, counts, hists = _encode_chunk_batch(
                jnp.asarray(rgb_batch), step, step, **kw)
        else:
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            fn = jax.jit(jax.shard_map(
                partial(_encode_batch_core, step=step, dead_zone=step, **kw),
                mesh=mesh,
                in_specs=P(axis),
                out_specs=(P(axis), P(axis), P(axis)),
                check_vma=False,  # pallas_call outputs carry no vma info
            ))
            streams, counts, hists = fn(jnp.asarray(rgb_batch))
        rows = 3 * n_seg
        return [
            DeviceChunk(
                w, h, t, self.wavelet_type, self.step, self.s_seg,
                streams[i * rows : (i + 1) * rows],
                counts[i * rows : (i + 1) * rows],
                hists[i],
                levels=self.levels,
            )
            for i in range(b)
        ]

    def _encode_batch_sparse(self, rgb_batch) -> list[DeviceChunk]:
        """Batched sparse encode: one phase-1 dispatch over B chunks,
        then ONE compact + bitmap-coding grid over the B·3 planes."""
        if not isinstance(rgb_batch, jax.Array):
            rgb_batch = np.asarray(rgb_batch, np.uint8)
        if rgb_batch.ndim != 5 or rgb_batch.shape[-1] != 3:
            raise InvalidBufferSize(5, rgb_batch.ndim)
        b, t, h, w, _ = rgb_batch.shape
        padded = padded_dims_levels(w, h, t, self.levels)
        p = int(np.prod(padded))
        pp = _sparse_pp(p)
        step = jnp.int32(self.step)
        rgb_j = jnp.asarray(rgb_batch)
        # zero-channel elision, batch-wide (optimistic cache + flags
        # validation — see encode()); all chunks share one phase-1
        # program, so the active set is the batch union
        acache = getattr(self, "_active_cache", None)
        if not isinstance(acache, dict):
            acache = {}
            self._active_cache = acache
        akey = (b, pp, self.s_seg)
        active = acache.get(akey, (0, 1, 2))
        for _attempt in range(2):
            symbols, ch_rows, flags = _sparse_phase1_batch(
                rgb_j, step, step, wavelet_type=self.wavelet_type,
                padded=padded, pp=pp, levels=self.levels, active=active,
            )
            wire_active = tuple(
                3 * i + c for i in range(b) for c in active)
            streams, counts, hists, kcaps = self._sparse_encode_planes(
                symbols, ch_rows, pp, wire_active=wire_active,
                wire_nc=3 * b, chunk_planes=3)
            fl = np.asarray(flags)
            needed = tuple(sorted(
                {0} | {c for c in range(3) if fl[:, c].any()}))
            acache[akey] = needed
            if all(c in active for c in needed):
                break
            active = needed  # wrong guess — full re-dispatch
        # split the result into B self-contained DeviceChunks: streams
        # hold CODED planes only, ordered [all bitmap groups (wire plane
        # order)][all coded value planes (wire plane order)]
        nb, _ = _segment_geometry(pp // 8, self.s_seg)
        nvs = [k // (self.s_seg * NG) for k in kcaps]     # per wire plane
        ncoded = [1 if k > 0 else 0 for k in kcaps]
        bm_off = np.concatenate([[0], np.cumsum(ncoded)]) * nb
        total_bm = int(bm_off[-1])
        v_off = total_bm + np.concatenate([[0], np.cumsum(nvs)])
        chunks = []
        for i in range(b):
            rs = []
            b0, b1 = int(bm_off[3 * i]), int(bm_off[3 * i + 3])
            v0, v1 = int(v_off[3 * i]), int(v_off[3 * i + 3])
            rs = [streams[b0:b1], streams[v0:v1]]
            cs = [counts[b0:b1], counts[v0:v1]]
            chunks.append(DeviceChunk(
                w, h, t, self.wavelet_type, self.step, self.s_seg,
                jnp.concatenate(rs, axis=0),
                jnp.concatenate(cs, axis=0),
                jnp.concatenate(
                    [hists[3 * i : 3 * i + 3],
                     hists[3 * b + 3 * i : 3 * b + 3 * i + 3]], axis=0),
                levels=self.levels, sparse=True,
                kcaps=tuple(kcaps[3 * i : 3 * i + 3]),
            ))
        return chunks

    def _encode_batch_sparse_mesh(self, rgb_batch, mesh) -> list[DeviceChunk]:
        """Sparse encode_batch over an ICI mesh: phase 1 shard_maps the
        chunk axis; the host fetches only the (B·3)-int row counts and
        picks ONE per-channel capacity bucket (the batch max) so every
        shard traces the same phase-2 program; phase 2 shard_maps over
        the already-sharded symbol planes.  Uniform capacities also make
        the chunks mesh-decodable (:meth:`decode_batch`)."""
        from jax.sharding import PartitionSpec as P

        if not isinstance(rgb_batch, jax.Array):
            rgb_batch = np.asarray(rgb_batch, np.uint8)
        if rgb_batch.ndim != 5 or rgb_batch.shape[-1] != 3:
            raise InvalidBufferSize(5, rgb_batch.ndim)
        b, t, h, w, _ = rgb_batch.shape
        axis = mesh.axis_names[0]
        nd = int(np.prod(mesh.devices.shape))
        if b % nd:  # uneven shard → plain per-chunk encode
            return [self.encode(rgb_batch[i]) for i in range(b)]
        bl = b // nd
        padded = padded_dims_levels(w, h, t, self.levels)
        p = int(np.prod(padded))
        pp = _sparse_pp(p)
        step = jnp.int32(self.step)

        def f1(rb):
            return _sparse_phase1_batch(
                rb, step, step, wavelet_type=self.wavelet_type,
                padded=padded, pp=pp, levels=self.levels)

        symbols, ch_rows, _flags = jax.jit(jax.shard_map(
            f1, mesh=mesh, in_specs=P(axis),
            out_specs=(P(axis), P(axis), P(axis)), check_vma=False,
        ))(jnp.asarray(rgb_batch))
        rows = np.asarray(ch_rows).reshape(b, 3)  # tiny fetch
        max_nv = _segment_geometry(pp, self.s_seg)[0]

        # no plane elision over the mesh: every shard must trace the
        # same phase-2 program, so empty planes keep the minimum bucket.
        # The DENSE_ROW_FRAC crossover applies batch-wide per channel
        # (the batch max sizes the shared bucket anyway), and any bucket
        # that reaches full capacity must be dense — kcap == dense
        # capacity is the decoder's dense marker.
        def ch_bucket(r: int) -> int:
            if r >= DENSE_ROW_FRAC * (pp // NG):
                return max_nv
            nv = max(_bucket_nv(r, self.s_seg, max_nv), DEFAULT_V_SEG)
            return max_nv if nv >= max_nv else nv

        nv3 = tuple(ch_bucket(int(rows[:, c].max())) for c in range(3))
        krs3 = tuple(nv * self.s_seg for nv in nv3)
        dense3 = tuple(c for c in range(3) if nv3[c] == max_nv)
        nb, _ = _segment_geometry(pp // 8, self.s_seg)
        krs_local = krs3 * bl
        dense_local = tuple(
            3 * j + c for j in range(bl) for c in dense3)

        def f2(sym, chr_):
            return _encode_chunk_sparse(
                sym, chr_, pp=pp, s_seg=self.s_seg, krs=krs_local,
                v_b=_pick_v_seg(nb), dense=dense_local)

        streams, counts, hists = jax.jit(jax.shard_map(
            f2, mesh=mesh, in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)), check_vma=False,
        ))(symbols, ch_rows)

        # shard-major result layout: per shard [3·bl bitmap groups]
        # [bl×3 value planes]; hists per shard [3·bl bitmap][3·bl value].
        # The per-chunk split is HOST-mediated (device_get per shard →
        # numpy slices → restage): eager cross-shard concatenates lower
        # to in-process all-gathers, which deadlock on hosts with fewer
        # cores than simulated devices (XLA CPU rendezvous needs every
        # participant executing concurrently) — and on real meshes the
        # split is interchange, not compute, so the host hop is off the
        # hot path.
        nvs = [k // self.s_seg for k in krs3]
        shard_rows = 3 * bl * nb + bl * sum(nvs)
        streams_np = np.asarray(jax.device_get(streams))
        counts_np = np.asarray(jax.device_get(counts))
        hists_np = np.asarray(jax.device_get(hists))
        chunks = []
        for i in range(b):
            s, j = divmod(i, bl)
            base = s * shard_rows
            bm = slice(base + 3 * j * nb, base + 3 * (j + 1) * nb)
            v0 = base + 3 * bl * nb + j * sum(nvs)
            v1 = v0 + sum(nvs)
            hs = s * 6 * bl
            chunks.append(DeviceChunk(
                w, h, t, self.wavelet_type, self.step, self.s_seg,
                jnp.asarray(np.concatenate(
                    [streams_np[bm], streams_np[v0:v1]], axis=0)),
                jnp.asarray(np.concatenate(
                    [counts_np[bm], counts_np[v0:v1]], axis=0)),
                jnp.asarray(np.concatenate(
                    [hists_np[hs + 3 * j : hs + 3 * j + 3],
                     hists_np[hs + 3 * bl + 3 * j : hs + 3 * bl + 3 * j + 3]],
                    axis=0)),
                levels=self.levels, sparse=True,
                kcaps=tuple(k * NG for k in krs3),
            ))
        return chunks

    def _decode_batch_sparse_mesh(self, chunks, mesh, exact):
        """Sparse decode_batch over an ICI mesh (uniform-geometry,
        uniform-capacity chunks — what :meth:`_encode_batch_sparse_mesh`
        produces)."""
        from jax.sharding import PartitionSpec as P

        c0 = chunks[0]
        b = len(chunks)
        w, h, t = c0.width, c0.height, c0.frames
        padded = padded_dims_levels(w, h, t, c0.levels)
        pp = _sparse_pp(int(np.prod(padded)))
        nb, _ = _segment_geometry(pp // 8, c0.s_seg)
        nvs = [k // NG // c0.s_seg for k in c0.kcaps]
        bl = b // int(np.prod(mesh.devices.shape))
        axis = mesh.axis_names[0]
        streams = jnp.stack([c.streams for c in chunks])   # (B, rows, …)
        counts = jnp.stack([c.counts for c in chunks])
        hists = jnp.stack([c.hists for c in chunks])       # (B, 6, 256)
        steps = jnp.asarray([[c.quant_step] * 3 for c in chunks], jnp.int32)
        kcaps_local = c0.kcaps * bl
        s_seg, wt, levels = c0.s_seg, c0.wavelet_type, c0.levels

        def fn(st, cn, hi, sp):
            # per-shard reorganize to _decode_batch_sparse's layout:
            # [all bitmap groups, chunk-major][all value planes]
            sflat = jnp.concatenate([
                st[:, : 3 * nb].reshape((-1,) + st.shape[2:]),
                st[:, 3 * nb :].reshape((-1,) + st.shape[2:]),
            ])
            cflat = jnp.concatenate(
                [cn[:, : 3 * nb].reshape(-1), cn[:, 3 * nb :].reshape(-1)])
            return _decode_batch_sparse(
                sflat, cflat, hi, sp, wavelet_type=wt, dims=(w, h, t),
                padded=padded, s_seg=s_seg, kcaps=kcaps_local,
                v_b=_pick_v_seg(nb), exact=exact, levels=levels,
            )

        return jax.jit(jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis), check_vma=False,
        ))(streams, counts, hists, steps)

    def decode_batch(self, chunks: list[DeviceChunk], *, exact: bool = False,
                     mesh=None):
        """Decode same-shape fixed-step chunks in one dispatch → (B, T, H,
        W, 3) uint8 jax.Array (see :meth:`encode_batch` for ``mesh``)."""
        c0 = chunks[0]
        if mesh is not None and len(chunks) % int(
                np.prod(mesh.devices.shape)) == 0 and all(
            c.sparse and not c.deep and c.band_steps is None
            and c.kcaps == c0.kcaps
            and all(k > 0 for k in c.kcaps)  # mesh path: no elided planes
            and (c.width, c.height, c.frames, c.s_seg, c.levels,
                 c.wavelet_type)
            == (c0.width, c0.height, c0.frames, c0.s_seg, c0.levels,
                c0.wavelet_type)
            for c in chunks
        ):
            return self._decode_batch_sparse_mesh(chunks, mesh, exact)
        batchable_sparse = (
            mesh is None
            and all(
                c.sparse and not c.deep and c.band_steps is None
                and (c.width, c.height, c.frames, c.s_seg, c.levels,
                     c.wavelet_type)
                == (c0.width, c0.height, c0.frames, c0.s_seg, c0.levels,
                    c0.wavelet_type)
                for c in chunks
            )
        )
        if batchable_sparse:
            b = len(chunks)
            w, h, t = c0.width, c0.height, c0.frames
            padded = padded_dims_levels(w, h, t, c0.levels)
            pp = _sparse_pp(int(np.prod(padded)))
            nb, _ = _segment_geometry(pp // 8, c0.s_seg)
            # a chunk's bitmap group covers its CODED planes only
            # (kcap == 0 ⇒ the plane is elided from the wire)
            bmr = [sum(1 for k in c.kcaps if k > 0) * nb for c in chunks]
            streams = jnp.concatenate(
                [c.streams[:r] for c, r in zip(chunks, bmr)]
                + [c.streams[r:] for c, r in zip(chunks, bmr)], axis=0)
            counts = jnp.concatenate(
                [c.counts[:r] for c, r in zip(chunks, bmr)]
                + [c.counts[r:] for c, r in zip(chunks, bmr)], axis=0)
            hists = jnp.stack([c.hists for c in chunks])  # (B, 6, 256)
            steps = jnp.asarray(
                [[c.quant_step] * 3 for c in chunks], jnp.int32)
            return _decode_batch_sparse(
                streams, counts, hists, steps,
                wavelet_type=c0.wavelet_type, dims=(w, h, t),
                padded=padded, s_seg=c0.s_seg,
                kcaps=tuple(k for c in chunks for k in c.kcaps),
                v_b=_pick_v_seg(nb), exact=exact, levels=c0.levels,
            )
        if any(c.band_steps is not None or c.deep or c.sparse for c in chunks):
            return jnp.stack([self.decode(c, exact=exact) for c in chunks])
        c0 = chunks[0]
        w, h, t = c0.width, c0.height, c0.frames
        padded = padded_dims_levels(w, h, t, c0.levels)
        streams = jnp.concatenate([c.streams for c in chunks], axis=0)
        counts = jnp.concatenate([c.counts for c in chunks], axis=0)
        hists = jnp.stack([c.hists for c in chunks])
        steps = jnp.asarray(
            [[c.quant_step] * 3 for c in chunks], jnp.int32)
        kw = dict(wavelet_type=c0.wavelet_type, dims=(w, h, t),
                  padded=padded, s_seg=c0.s_seg,
                  v_seg=_pick_v_seg(c0.n_segments), exact=exact,
                  levels=c0.levels)
        if mesh is None:
            return _decode_chunk_batch(streams, counts, hists, steps, **kw)
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]
        fn = jax.jit(jax.shard_map(
            partial(_decode_batch_core, **kw),
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,  # pallas_call outputs carry no vma info
        ))
        return fn(streams, counts, hists, steps)

    # ── container serialization (host interchange) ──────────────

    @staticmethod
    def to_bytes(chunks: DeviceChunk | list[DeviceChunk]) -> bytes:
        """Serialize chunk(s) to the ALC3 container (one device fetch of
        the padded streams; compaction happens host-side off the hot path).
        """
        if isinstance(chunks, DeviceChunk):
            chunks = [chunks]
        if not chunks:
            raise InvalidBitstream("cannot serialize an empty chunk list")
        c0 = chunks[0]
        p = int(np.prod(
            padded_dims_levels(c0.width, c0.height, c0.frames, c0.levels)
        ))
        buf = bytearray()
        buf += _MAGIC3
        buf.append(_VERSION3)
        buf.append(int(c0.wavelet_type))
        # header n_segments is the dense-geometry per-plane count (equal to
        # n_segments for dense/deep chunks; sparse planes derive their own
        # counts from geometry, so the header stays well-defined even when
        # the first chunk is sparse)
        buf += struct.pack(
            "<IIIIII", c0.width, c0.height, c0.frames, len(chunks),
            c0.s_seg, _segment_geometry(p, c0.s_seg)[0],
        )
        payload = bytearray()
        for ck in chunks:
            counts = np.asarray(ck.counts).astype(np.int64)
            streams = np.asarray(ck.streams)  # (sum(nseg_i), w_rows, 128)
            hists = np.asarray(ck.hists).astype(np.uint32)
            flags = _FLAG_RDO if ck.band_steps is not None else 0
            flags |= _FLAG_DEEP if ck.deep else 0
            flags |= (ck.levels - 1) << 2  # bits 2-3: decomposition depth
            flags |= _FLAG_SPARSE if ck.sparse else 0
            buf.append(flags)
            # per-plane (segment count, num_symbols): sparse chunks carry
            # 3 bitmap planes (pp/8 symbols) then 3 value planes (each
            # plane's capacity rides its header's num_symbols field)
            if ck.sparse:
                pp = _sparse_pp(p)
                nbm = 6 if ck.deep else 3  # byte planes → bitmap planes
                nb, _ = _segment_geometry(pp // 8, ck.s_seg)
                # kcap == 0 ⇒ ELIDED plane (zero nonzero symbols): both
                # its bitmap and value sections carry num_symbols 0 and
                # no segments — the decoder reconstructs exact zeros
                plane_geom = (
                    [(nb, pp // 8) if k > 0 else (0, 0)
                     for k in ck.kcaps]
                    + [(k // (ck.s_seg * NG), k) for k in ck.kcaps])
            else:
                plane_geom = [(ck.n_segments, p)] * ck.n_planes
            row0 = 0
            for ch, (n_seg, nsym) in enumerate(plane_geom):
                ch_counts = counts[row0 : row0 + n_seg]
                buf += ChannelHeader(
                    compressed_len=int(ch_counts.sum()) * 2,
                    quant_step=ck.quant_step,
                    quant_dead_zone=ck.quant_step,
                    num_symbols=int(nsym),
                    histogram=hists[ch],
                ).to_bytes()
                buf += ch_counts.astype("<u4").tobytes()
                # RDO band steps ride the first 3 plane sections (steps
                # are per CHANNEL; sparse value planes carry none)
                if ck.band_steps is not None and ch < 3:
                    buf += np.asarray(
                        ck.band_steps[ch], np.int32
                    ).astype("<i4").tobytes()
                for s in range(n_seg):
                    words = streams[row0 + s].reshape(-1)[: ch_counts[s]]
                    payload += words.astype("<u2").tobytes()
                row0 += n_seg
        return bytes(buf) + bytes(payload)

    @classmethod
    def from_bytes(cls, data: bytes) -> tuple["Alc3Codec", list[DeviceChunk]]:
        """Parse an ALC3 container and re-stage chunks on device.

        Returns ``(codec, chunks)`` — the codec carries the container's
        quality/wavelet settings (quality is recovered from the stored
        quant step).
        """
        data = bytes(data)
        if len(data) < 30:
            raise InvalidBitstream(f"ALC3 data too short: {len(data)} bytes")
        if data[:4] != _MAGIC3:
            raise InvalidBitstream("bad magic (expected ALC3)")
        if data[4] != _VERSION3:
            raise InvalidBitstream(f"unsupported ALC3 version: {data[4]}")
        wavelet_type = WaveletType.from_u8(data[5])
        w, h, f, n_chunks, s_seg, n_seg = struct.unpack_from("<IIIIII", data, 6)
        if s_seg % 8 or not s_seg or s_seg > (1 << 20):
            raise InvalidBitstream(f"invalid segment length: {s_seg}")
        w_rows = stream_rows(s_seg)

        off = 30
        # per chunk: (step, hists, counts list, band_steps|None, deep,
        #             levels, sparse, kcap)
        metas = []
        for _ in range(n_chunks):
            if off + 1 > len(data):
                raise InvalidBitstream("truncated ALC3 chunk flags")
            flags = data[off]
            off += 1
            deep = bool(flags & _FLAG_DEEP)
            sparse = bool(flags & _FLAG_SPARSE)
            levels = ((flags >> 2) & 3) + 1
            p = int(np.prod(padded_dims_levels(w, h, f, levels)))
            nbm = 6 if deep else 3  # byte planes (bitmap planes if sparse)
            n_planes = 2 * nbm if sparse else nbm
            band_steps = (
                np.zeros((3, 8), np.int32) if flags & _FLAG_RDO else None
            )
            if band_steps is not None and deep:
                raise InvalidBitstream("rdo and deep flags are exclusive")
            hists = np.zeros((n_planes, 256), np.uint32)
            counts_list = []
            kcaps = []
            bm_elided = []
            step = 1
            seg = s_seg * NG
            for ch in range(n_planes):
                if off + 1040 > len(data):
                    raise InvalidBitstream("truncated ALC3 header section")
                hdr = ChannelHeader.from_bytes(data[off : off + 1040])
                off += 1040
                if sparse and ch >= nbm and hdr.num_symbols == 0:
                    # ELIDED plane's value section (kcap 0, no streams);
                    # its bitmap section must have been elided too
                    if not bm_elided[ch - nbm]:
                        raise InvalidBitstream(
                            "sparse value capacity 0 for a coded bitmap"
                        )
                    kcaps.append(0)
                    hists[ch] = hdr.histogram
                    step = hdr.quant_step
                    counts_list.append(np.zeros((0,), np.int64))
                    if hdr.compressed_len:
                        raise InvalidBitstream(
                            "elided plane with nonzero payload"
                        )
                    continue
                if sparse and ch >= nbm:
                    # value plane: capacity comes from its own header
                    # (planes carry independent capacities)
                    if hdr.num_symbols % seg:
                        raise InvalidBitstream(
                            "sparse value capacity not segment-aligned"
                        )
                    if (hdr.num_symbols // seg) % DEFAULT_V_SEG:
                        # the encoder buckets capacities to DEFAULT_V_SEG
                        # segments; a misaligned capacity would make the
                        # header's segment count (rounded up by
                        # _segment_geometry) disagree with the decoder's
                        # stream-row accounting — silent plane desync
                        raise InvalidBitstream(
                            "sparse value capacity not V-aligned"
                        )
                    if hdr.num_symbols > _segment_geometry(
                            _sparse_pp(p), s_seg)[1]:
                        raise InvalidBitstream(
                            "sparse value capacity exceeds the plane size"
                        )
                    if bm_elided[ch - nbm]:
                        raise InvalidBitstream(
                            "coded value plane for an elided bitmap"
                        )
                    kcaps.append(hdr.num_symbols)
                    plane_sym = hdr.num_symbols
                elif sparse:
                    if hdr.num_symbols == 0:
                        # ELIDED plane's bitmap section — no streams;
                        # consistency with the value section is checked
                        # when that section parses (kcap must be 0).
                        # RDO band steps still ride the first 3 sections
                        # even when elided (the serializer writes them
                        # unconditionally for ch < 3).
                        bm_elided.append(True)
                        if hdr.compressed_len:
                            raise InvalidBitstream(
                                "elided plane with nonzero payload"
                            )
                        hists[ch] = hdr.histogram
                        step = hdr.quant_step
                        counts_list.append(np.zeros((0,), np.int64))
                        if band_steps is not None and ch < 3:
                            if off + 32 > len(data):
                                raise InvalidBitstream(
                                    "truncated ALC3 header section"
                                )
                            band_steps[ch] = np.frombuffer(
                                data, "<i4", 8, off)
                            if (band_steps[ch] < 1).any():
                                raise InvalidBitstream(
                                    "non-positive RDO band step"
                                )
                            off += 32
                        continue
                    bm_elided.append(False)
                    plane_sym = _sparse_pp(p) // 8
                    if hdr.num_symbols != plane_sym:
                        raise InvalidBitstream(
                            f"bitmap num_symbols {hdr.num_symbols} != "
                            f"{plane_sym}"
                        )
                else:
                    plane_sym = p
                    if hdr.num_symbols != p:
                        raise InvalidBitstream(
                            f"num_symbols {hdr.num_symbols} != padded "
                            f"pixels {p}"
                        )
                ns = _segment_geometry(plane_sym, s_seg)[0]
                if not sparse and ns != n_seg:
                    raise InvalidBitstream(
                        f"{n_seg} segments cannot cover {p} symbols"
                    )
                has_steps = band_steps is not None and ch < 3
                extra = 32 if has_steps else 0
                if off + 4 * ns + extra > len(data):
                    raise InvalidBitstream("truncated ALC3 header section")
                ch_counts = np.frombuffer(data, "<u4", ns, off).astype(np.int64)
                off += 4 * ns
                if has_steps:
                    band_steps[ch] = np.frombuffer(data, "<i4", 8, off)
                    if (band_steps[ch] < 1).any():
                        raise InvalidBitstream("non-positive RDO band step")
                    off += 32
                if int(ch_counts.sum()) * 2 != hdr.compressed_len:
                    raise InvalidBitstream("segment counts disagree with header")
                hists[ch] = hdr.histogram
                step = hdr.quant_step
                counts_list.append(ch_counts)
            metas.append((step, hists, counts_list, band_steps, deep,
                          levels, sparse, tuple(kcaps)))

        chunks = []
        # tightest encoder-reachable bound: s_seg steps emit ≤ NG words
        # each plus the 2·NG state flush.  stream_rows() adds a margin
        # row for aligned window reads — counts in that margin can never
        # have been produced and would drive the decode kernel's init
        # window read past the segment block.
        segment_cap = (s_seg + 2) * NG
        for (step, hists, counts_list, band_steps, deep, levels, sparse,
             kcaps) in metas:
            flat_counts = np.concatenate(counts_list)
            # validate BEFORE allocation/fill: every segment carries at
            # least the 2·NG state-flush words and at most the stream
            # block's capacity (a count outside this range can never have
            # been produced by the encoder)
            if flat_counts.size == 0:
                raise InvalidBitstream("ALC3 chunk with no segments")
            # count == 0 marks an ELIDED all-zero segment (decodes to
            # zeros without entering the rANS chain — rans_word.py);
            # anything else below the 2·NG state flush is unreachable
            if ((flat_counts != 0) & (flat_counts < 2 * NG)).any():
                raise InvalidBitstream(
                    "segment word count below the state-flush minimum"
                )
            if (flat_counts > segment_cap).any():
                raise InvalidBitstream("segment word count exceeds capacity")
            n_rows = flat_counts.size
            streams = np.zeros((n_rows, w_rows * 128), np.int32)
            for i, cnt in enumerate(flat_counts):
                end = off + 2 * int(cnt)
                if end > len(data):
                    raise InvalidBitstream("truncated ALC3 payload")
                streams[i, : int(cnt)] = np.frombuffer(
                    data, "<u2", int(cnt), off
                )
                off = end
            chunks.append(
                DeviceChunk(
                    w, h, f, wavelet_type, int(step), int(s_seg),
                    jnp.asarray(streams.reshape(n_rows, w_rows, 128)),
                    jnp.asarray(flat_counts.astype(np.int32)),
                    jnp.asarray(hists),
                    band_steps=band_steps,
                    deep=deep,
                    levels=levels,
                    sparse=sparse,
                    kcaps=kcaps,
                )
            )
        # recover quality from the step map step = max(64 - q*63/100, 1)
        # (best-effort for RDO chunks, whose header step is the min band step)
        step0 = metas[0][0] if metas else 1
        quality = next(
            (q for q in range(100, -1, -1) if quality_to_step(q) == step0), 90
        )
        rdo = bool(metas) and metas[0][3] is not None
        deep0 = bool(metas) and metas[0][4]
        levels0 = metas[0][5] if metas else 1
        sparse0 = bool(metas) and metas[0][6]
        codec = cls(quality=quality, wavelet=wavelet_type, s_seg=int(s_seg),
                    rdo=rdo, deep=deep0, levels=levels0, sparse=sparse0)
        return codec, chunks
