"""Pallas TPU kernels for the ALC3 segment word-rANS (ops/rans_word.py).

Why these replace the round-1 byte-stream kernels (rans_kernel.py /
rans_decode_kernel.py) on the hot path:

* The byte-stream decoder tracks one cursor PER LANE, so every refill is a
  gather — realized as an O(n_words) masked row-sum per symbol step.  ALC3
  stores words in emission order, so a segment has ONE scalar cursor and
  each step's refill is a 2-row window read resolved by a 128-wide one-hot
  matmul: O(1) rows per step regardless of stream length.
* The byte-stream encoder emitted per-step padded planes that needed three
  full-payload scatters to pack.  The ALC3 encoder appends words at the
  cursor inside the kernel (one-hot scatter into the same 2-row window):
  the output buffer IS the wire stream — no pack, no compact, no reversal.
* Segments are independent (own state flush), so the grid needs no
  cross-slot scratch: chunks × channels × segments fold into one
  2D grid (stream-table, segment) that Mosaic pipelines freely, and the
  per-step loop is a ``fori_loop`` — compile time is O(1) in segment
  length (the round-1 kernels relied on full unroll and capped out).

Mosaic ground rules inherited from round 1 (see rans_kernel.py): no vector
int indexing (one-hot matmuls instead), hi/lo byte-split before any MXU
contraction whose values exceed 256 (the MXU's default f32 matmul rounds
inputs to bfloat16), no f32→u32 casts (round-trip via int32), no
int32→uint32 casts of negative values, 2D blocks only.

Layout (all static shapes; NG = 128 lanes = one VPU lane row):

* symbols: (n_streams·s_seg, 128) int32 — segment-major symbol rows;
* streams: (n_streams·w_rows, 128) int32 — one u16 word per int32,
  w_rows = s_seg + 3 (worst case s_seg+2 rows, +1 margin so aligned
  2-row window reads never leave the block);
* counts:  (n_streams,) int32 — meaningful words per segment;
* tables:  per stream-table (16, 16) hi/lo-split freq/cum blocks + a
  (1, 16) cum-heads row for the two-level symbol search.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
WORD_L = 1 << 16
#: lanes per segment — fixed to the TPU lane width.
NG = 128


def stream_rows(s_seg: int) -> int:
    """Stream-block rows for a segment length: the s_seg+2 worst case plus
    a margin row (so aligned 2-row window reads never leave the block),
    rounded up to the TPU sublane multiple of 8."""
    return -(-(s_seg + 3) // 8) * 8


def _dot16_exact(oh, hi_ref, lo_ref):
    """Exact (16,16)-table lookup via two default-precision MXU dots (the
    hi/lo byte split keeps both operands bf16-exact; see rans_kernel.py)."""
    return (
        jnp.dot(oh, hi_ref[:, :], preferred_element_type=jnp.float32) * 256.0
        + jnp.dot(oh, lo_ref[:, :], preferred_element_type=jnp.float32)
    )


def _lookup_fc(row, iota16, fhi, flo, chi, clo):
    """Symbols (128,) int32 → (freq, cum) uint32 pairs via the two-level
    hi/lo-nibble one-hot lookup."""
    hi_oh = ((row[:, None] >> 4) == iota16).astype(jnp.float32)
    fblk = _dot16_exact(hi_oh, fhi, flo)
    cblk = _dot16_exact(hi_oh, chi, clo)
    lo_oh = ((row[:, None] & 15) == iota16).astype(jnp.float32)
    f = jnp.sum(fblk * lo_oh, axis=1).astype(jnp.int32).astype(jnp.uint32)
    c = jnp.sum(cblk * lo_oh, axis=1).astype(jnp.int32).astype(jnp.uint32)
    return f, c


def _win_read(stream_ref, base, pos, iota_jl):
    """Read per-lane words from a 2-row window of the stream.

    ``base``: scalar word offset of the window start (row-aligned split is
    derived here); ``pos``: (128,) int32 word offsets relative to ``base``
    (0 ≤ pos < 129 where the lane participates; other lanes read garbage
    the caller masks).  Returns (128,) int32 word values.
    """
    r0 = base >> 7
    sh = base - (r0 << 7)
    p = pos + sh  # position within the 2-row window, 0..255
    rows = stream_ref[pl.ds(r0, 2), :]  # (2,128) int32 words
    out = jnp.zeros((128,), jnp.float32)
    for r in range(2):
        oh = ((p[:, None] - 128 * r) == iota_jl).astype(jnp.float32)
        vh = (rows[r, :] >> 8).astype(jnp.float32)
        vl = (rows[r, :] & 255).astype(jnp.float32)
        out = out + 256.0 * jnp.dot(
            oh, vh[:, None], preferred_element_type=jnp.float32
        )[:, 0] + jnp.dot(oh, vl[:, None], preferred_element_type=jnp.float32)[:, 0]
    return out.astype(jnp.int32)


def _win_append(stream_ref, base, pos, words, mask, iota_jl):
    """Scatter per-lane words into a 2-row window at ``base`` (the dual of
    :func:`_win_read`).  ``pos``: (128,) int32 offsets relative to base
    (unique among ``mask`` lanes); ``words``: (128,) int32 < 2^16."""
    r0 = base >> 7
    sh = base - (r0 << 7)
    p = jnp.where(mask, pos + sh, -1)  # park masked lanes outside 0..255
    wh = jnp.where(mask, words >> 8, 0).astype(jnp.float32)
    wl = jnp.where(mask, words & 255, 0).astype(jnp.float32)
    rows = stream_ref[pl.ds(r0, 2), :]
    adds = []
    for r in range(2):
        oht = (iota_jl.T == (p[None, :] - 128 * r)).astype(jnp.float32)
        add = 256.0 * jnp.dot(
            oht, wh[:, None], preferred_element_type=jnp.float32
        )[:, 0] + jnp.dot(oht, wl[:, None], preferred_element_type=jnp.float32)[:, 0]
        adds.append(add.astype(jnp.int32))
    stream_ref[pl.ds(r0, 2), :] = rows + jnp.concatenate(
        [adds[0][None, :], adds[1][None, :]], axis=0
    )


# ── decode ──────────────────────────────────────────────────────


def _decode_kernel(counts_ref, stream_ref, cumh_ref, fhi_ref, flo_ref,
                   chi_ref, clo_ref, sym_ref):
    s_seg = sym_ref.shape[0]
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (NG, 16), 1)
    iota_jl = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 1)
    row_gt_col = (
        jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 0) > iota_jl
    ).astype(jnp.float32)
    lane_iota = iota_jl[0, :]  # (128,) 0..127 as a vector

    # counts live in SMEM as one (1, n_streams) row shared by every grid
    # slot (per-slot scalar blocks violate the TPU tiling rules); scalar
    # SMEM reads support dynamic indices.
    i = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    n = counts_ref[0, i]
    c0 = n - 2 * NG  # emission count == initial cursor
    hi = _win_read(stream_ref, c0, lane_iota, iota_jl)
    lo = _win_read(stream_ref, c0 + NG, lane_iota, iota_jl)
    x0 = (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)

    def body(j, carry):
        x, cur = carry
        slot = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)
        slot_f = slot[:, None].astype(jnp.float32)
        # two-level strictly-increasing-cums search (sanitized tables)
        hi_idx = jnp.sum(
            (cumh_ref[0, :][None, :] <= slot_f).astype(jnp.int32), axis=1
        ) - 1
        hi_oh = (hi_idx[:, None] == iota16).astype(jnp.float32)
        cand = _dot16_exact(hi_oh, chi_ref, clo_ref)
        lo_idx = jnp.sum((cand <= slot_f).astype(jnp.int32), axis=1) - 1
        fblk = _dot16_exact(hi_oh, fhi_ref, flo_ref)
        lo_oh = (lo_idx[:, None] == iota16).astype(jnp.float32)
        f = jnp.sum(fblk * lo_oh, axis=1).astype(jnp.int32).astype(jnp.uint32)
        c = jnp.sum(cand * lo_oh, axis=1).astype(jnp.int32).astype(jnp.uint32)
        sym_ref[j, :] = hi_idx * 16 + lo_idx
        x = f * (x >> PROB_BITS) + slot.astype(jnp.uint32) - c
        # ≤1 refill per lane (16-bit renorm): sequential window read
        need = x < jnp.uint32(WORD_L)
        nf = need.astype(jnp.float32)
        k = jnp.sum(need.astype(jnp.int32))
        rank = jnp.dot(
            row_gt_col, nf[:, None], preferred_element_type=jnp.float32
        )[:, 0].astype(jnp.int32)
        w = _win_read(stream_ref, cur - k, rank, iota_jl)
        x = jnp.where(need, (x << 16) | w.astype(jnp.uint32), x)
        return x, cur - k

    jax.lax.fori_loop(0, s_seg, body, (x0, c0))


@partial(jax.jit, static_argnames=("s_seg", "interpret"))
def decode_words_pallas(
    streams: jnp.ndarray,
    counts: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    s_seg: int,
    interpret: bool = False,
):
    """ALC3 segment decode.

    ``streams``: (n_streams, stream_rows(s_seg), 128) int32 words (emission
    order, ops/rans_word.py layout); ``counts``: (n_streams,) int32;
    ``freqs``/``cums``: (n_tables, 256) int32 sanitized tables — stream i
    uses table ``i // (n_streams // n_tables)`` (streams grouped by table,
    equal segment counts per table).  Returns (n_streams, s_seg, 128)
    int32 symbols.  ``s_seg`` must be a multiple of 8 (TPU sublane tiling).
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    n_streams, w_rows, _ = streams.shape
    if w_rows != stream_rows(s_seg):
        raise ValueError(
            f"streams have {w_rows} rows; expected stream_rows({s_seg}) = "
            f"{stream_rows(s_seg)}"
        )
    n_tables = freqs.shape[0]
    seg_per_table = n_streams // n_tables

    f32 = freqs.astype(jnp.int32)
    c32 = cums.astype(jnp.int32)
    fhi = (f32 >> 8).astype(jnp.float32).reshape(n_tables * 16, 16)
    flo = (f32 & 255).astype(jnp.float32).reshape(n_tables * 16, 16)
    chi = (c32 >> 8).astype(jnp.float32).reshape(n_tables * 16, 16)
    clo = (c32 & 255).astype(jnp.float32).reshape(n_tables * 16, 16)
    # cum heads broadcast to (16,16) blocks: a (1,16) block on a
    # (n_tables,16) array violates the TPU sublane tiling rule, so each
    # table's 16 block-head cums are replicated over 16 rows (the kernel
    # reads row 0).
    cum_heads = jnp.broadcast_to(
        c32[:, ::16].astype(jnp.float32)[:, None, :], (n_tables, 16, 16)
    ).reshape(n_tables * 16, 16)

    sym = pl.pallas_call(
        _decode_kernel,
        out_shape=jax.ShapeDtypeStruct((n_streams * s_seg, 128), jnp.int32),
        grid=(n_tables, seg_per_table),
        in_specs=[
            pl.BlockSpec((1, n_streams), lambda t, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((w_rows, 128),
                         lambda t, s: (t * seg_per_table + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 16), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((16, 16), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=pl.BlockSpec(
            (s_seg, 128), lambda t, s: (t * seg_per_table + s, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(
        counts.astype(jnp.int32).reshape(1, n_streams),
        streams.reshape(n_streams * w_rows, 128),
        cum_heads, fhi, flo, chi, clo,
    )
    return sym.reshape(n_streams, s_seg, 128)


# ── encode ──────────────────────────────────────────────────────


def _encode_kernel(sym_ref, fhi_ref, flo_ref, chi_ref, clo_ref,
                   stream_ref, counts_ref):
    s_seg = sym_ref.shape[0]
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (NG, 16), 1)
    iota_jl = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 1)
    row_gt_col = (
        jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 0) > iota_jl
    ).astype(jnp.float32)
    lane_iota = iota_jl[0, :]
    ones = lane_iota >= 0

    stream_ref[:, :] = jnp.zeros(stream_ref.shape, stream_ref.dtype)

    def body(i, carry):
        x, cur = carry
        row = sym_ref[s_seg - 1 - i, :]  # LIFO over symbol rows
        f, c = _lookup_fc(row, iota16, fhi_ref, flo_ref, chi_ref, clo_ref)
        emit = (x >> 20) >= f
        w = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        ef = emit.astype(jnp.float32)
        k = jnp.sum(emit.astype(jnp.int32))
        rank = jnp.dot(
            row_gt_col, ef[:, None], preferred_element_type=jnp.float32
        )[:, 0].astype(jnp.int32)
        _win_append(stream_ref, cur, rank, w, emit, iota_jl)
        x = jnp.where(emit, x >> 16, x)
        q = x // f
        x = (q << PROB_BITS) + (x - q * f) + c
        return x, cur + k

    x0 = jnp.full((NG,), WORD_L, jnp.uint32)
    x, cur = jax.lax.fori_loop(0, s_seg, body, (x0, jnp.int32(0)))

    # state flush: hi row then lo row, lane-ascending
    _win_append(stream_ref, cur, lane_iota,
                (x >> 16).astype(jnp.int32), ones, iota_jl)
    _win_append(stream_ref, cur + NG, lane_iota,
                (x & jnp.uint32(0xFFFF)).astype(jnp.int32), ones, iota_jl)
    # scalar broadcast into a full (8,128) block: per-slot scalar outputs
    # violate the TPU tiling rules, and dynamic-lane SMEM writes are not
    # Mosaic-legal — callers read element [0,0] of each block.
    counts_ref[:, :] = jnp.full((8, 128), cur + 2 * NG, jnp.int32)


@partial(jax.jit, static_argnames=("interpret",))
def encode_words_pallas(
    symbols: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    interpret: bool = False,
):
    """ALC3 segment encode.

    ``symbols``: (n_streams, s_seg, 128) int32 in [0, 256) — segment-major
    symbol rows (stream i = table ``i // seg_per_table``);
    ``freqs``/``cums``: (n_tables, 256) int32 sanitized tables.  Returns
    ``(streams (n_streams, w_rows, 128) int32, counts (n_streams,) int32)``
    in the ops/rans_word.py wire layout (zero-padded past ``counts``).
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    n_streams, s_seg, _ = symbols.shape
    w_rows = stream_rows(s_seg)
    n_tables = freqs.shape[0]
    seg_per_table = n_streams // n_tables

    f32 = freqs.astype(jnp.int32)
    c32 = cums.astype(jnp.int32)
    fhi = (f32 >> 8).astype(jnp.float32).reshape(n_tables * 16, 16)
    flo = (f32 & 255).astype(jnp.float32).reshape(n_tables * 16, 16)
    chi = (c32 >> 8).astype(jnp.float32).reshape(n_tables * 16, 16)
    clo = (c32 & 255).astype(jnp.float32).reshape(n_tables * 16, 16)

    streams, counts = pl.pallas_call(
        _encode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_streams * w_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_streams * 8, 128), jnp.int32),
        ),
        grid=(n_tables, seg_per_table),
        in_specs=[
            pl.BlockSpec((s_seg, 128),
                         lambda t, s: (t * seg_per_table + s, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((16, 16), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        out_specs=(
            pl.BlockSpec((w_rows, 128),
                         lambda t, s: (t * seg_per_table + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda t, s: (t * seg_per_table + s, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        symbols.reshape(n_streams * s_seg, 128).astype(jnp.int32),
        fhi, flo, chi, clo,
    )
    return (
        streams.reshape(n_streams, w_rows, 128),
        counts.reshape(n_streams, 8, 128)[:, 0, 0],
    )
