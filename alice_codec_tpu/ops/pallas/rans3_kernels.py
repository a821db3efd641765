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
  cursor inside the kernel (one-hot window scatter): the output buffer IS
  the wire stream — no pack, no compact, no reversal passes.
* Segments are independent (own state flush), so the grid needs no
  cross-slot scratch: chunks × channels × segments fold into one 2D grid
  that Mosaic pipelines freely, and the per-step loop is a ``fori_loop`` —
  compile time is O(1) in segment length (the round-1 kernels relied on
  full unroll and capped out).
* **V-batching**: the rANS state chain is serial, so a step's cost is
  dominated by op latency, not width.  Each grid slot therefore processes
  ``v_seg`` segments at once — the table search / state update run on one
  (v_seg·128)-wide vector chain (same latency as 128 lanes), only the
  per-segment window reads/appends replicate.  Throughput scales nearly
  linearly in ``v_seg`` until VMEM caps the blocks.  This is an execution
  detail only: the wire format is identical for every ``v_seg``.

Mosaic ground rules inherited from round 1 (see rans_kernel.py): no vector
int indexing (one-hot matmuls instead), hi/lo byte-split before any MXU
contraction whose VALUES exceed 256 (the MXU's default f32 matmul rounds
inputs to bfloat16 — 0/1 one-hots are always exact, so only the table/word
operand needs splitting), no f32→u32 casts (round-trip via int32), no
int32→uint32 casts of negative values, 2D blocks only, sublane dims in
multiples of 8.

Layout (all static shapes; NG = 128 lanes = one VPU lane row):

* symbols: (n_streams·s_seg, 128) int32 — segment-major symbol rows;
* streams: (n_streams·w_rows, 128) int32 — one u16 word per int32,
  w_rows = stream_rows(s_seg) ≥ s_seg + 3 (worst case s_seg+2 rows, +1
  margin so aligned 2-row window reads never leave the block);
* counts:  per-segment meaningful word counts — SMEM full-row input on
  decode; (8,128)-broadcast blocks per segment on encode output;
* tables:  per stream-table (16, 16) hi/lo-split freq/cum blocks + a
  16-row replicated cum-heads block for the two-level symbol search.
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
#: default segments processed per grid slot (see module docstring).
DEFAULT_V_SEG = 4

#: Mosaic scoped-VMEM cap.  The default 16 MB rejects the V-batched blocks
#: (v_seg·(s_seg + w_rows) rows, double-buffered); the physical VMEM on
#: every supported TPU generation is ≥ 128 MB, so grant the kernels 96 MB
#: and leave the rest to the pipeline.
_VMEM_LIMIT = 96 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def stream_rows(s_seg: int) -> int:
    """Stream-block rows for a segment length: the s_seg+2 worst case plus
    a margin row (so aligned 2-row window reads never leave the block),
    rounded up to the TPU sublane multiple of 8."""
    return -(-(s_seg + 3) // 8) * 8


def _dot16_exact(oh, hi, lo):
    """Exact 16-wide table lookup via two default-precision MXU dots (the
    hi/lo byte split keeps the value operand bf16-exact)."""
    return (
        jnp.dot(oh, hi, preferred_element_type=jnp.float32) * 256.0
        + jnp.dot(oh, lo, preferred_element_type=jnp.float32)
    )


def _split2(vals_hi, vals_lo):
    """Stack hi/lo byte columns → (128, 2) f32 MXU operand."""
    return jnp.concatenate(
        [vals_hi[:, None].astype(jnp.float32), vals_lo[:, None].astype(jnp.float32)],
        axis=1,
    )


def _win_read(stream_ref, row_base, base, pos, iota_jl):
    """Read per-lane words from a 2-row window of one segment's stream.

    ``row_base``: static first row of the segment inside the block;
    ``base``: scalar word offset of the window start within the segment;
    ``pos``: (128,) int32 word offsets relative to ``base`` (0 ≤ pos < 129
    where the lane participates; other lanes read garbage the caller
    masks).  Returns (128,) int32 word values.
    """
    r0 = base >> 7
    sh = base - (r0 << 7)
    p = pos + sh  # position within the 2-row window, 0..255
    rows = stream_ref[pl.ds(row_base + r0, 2), :]  # (2,128) int32 words
    out = jnp.zeros((128,), jnp.float32)
    for r in range(2):
        oh = ((p[:, None] - 128 * r) == iota_jl).astype(jnp.float32)
        v2 = _split2(rows[r, :] >> 8, rows[r, :] & 255)
        d = jnp.dot(oh, v2, preferred_element_type=jnp.float32)
        out = out + 256.0 * d[:, 0] + d[:, 1]
    return out.astype(jnp.int32)


def _win_append(stream_ref, row_base, base, pos, words, mask, iota_jl):
    """Scatter per-lane words into a 2-row window (dual of :func:`_win_read`).

    ``pos``: (128,) int32 offsets relative to ``base`` (unique among
    ``mask`` lanes); ``words``: (128,) int32 < 2^16.
    """
    r0 = base >> 7
    sh = base - (r0 << 7)
    p = jnp.where(mask, pos + sh, -1)  # park masked lanes outside 0..255
    w2 = _split2(jnp.where(mask, words >> 8, 0), jnp.where(mask, words & 255, 0))
    rows = stream_ref[pl.ds(row_base + r0, 2), :]
    adds = []
    for r in range(2):
        oht = (iota_jl.T == (p[None, :] - 128 * r)).astype(jnp.float32)
        d = jnp.dot(oht, w2, preferred_element_type=jnp.float32)
        adds.append((256.0 * d[:, 0] + d[:, 1]).astype(jnp.int32))
    stream_ref[pl.ds(row_base + r0, 2), :] = rows + jnp.concatenate(
        [adds[0][None, :], adds[1][None, :]], axis=0
    )


def _lt_mask():
    """(128, 128) strictly-lower-triangular f32 mask: one MXU dot with this
    computes a segment's exclusive refill ranks."""
    i = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 1)
    return (i > j).astype(jnp.float32)


# ── decode ──────────────────────────────────────────────────────


def _decode_kernel(v_seg, s_seg, w_rows,
                   counts_ref, stream_ref, cumh_ref, chi_ref, clo_ref,
                   sym_ref):
    # v_seg segments decode in one slot as INDEPENDENT dataflow chains
    # (Mosaic cannot concatenate along the lane axis, and it doesn't need
    # to: the chains share no data, so the scheduler interleaves their op
    # latencies — the whole point of V-batching).
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (NG, 16), 1)
    iota_jl = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 1)
    lane_iota = iota_jl[0, :]
    lt = _lt_mask()
    cumh_row = cumh_ref[0, :]  # (16,) block-head cums

    slot0 = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    states = []
    curs = []
    for v in range(v_seg):
        cnt = counts_ref[0, slot0 * v_seg + v]
        c0 = cnt - 2 * NG
        hi = _win_read(stream_ref, v * w_rows, c0, lane_iota, iota_jl)
        lo = _win_read(stream_ref, v * w_rows, c0 + NG, lane_iota, iota_jl)
        states.append((hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32))
        curs.append(c0)

    def one(v, j, x, cur):
        slot = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)
        slot_f = slot[:, None].astype(jnp.float32)
        # two-level strictly-increasing-cums search (sanitized tables)
        hi_idx = jnp.sum(
            (cumh_row[None, :] <= slot_f).astype(jnp.int32), axis=1
        ) - 1
        hi_oh = (hi_idx[:, None] == iota16).astype(jnp.float32)
        cand = _dot16_exact(hi_oh, chi_ref[:, :], clo_ref[:, :])
        lo_idx = jnp.sum((cand <= slot_f).astype(jnp.int32), axis=1) - 1
        lo_oh = (lo_idx[:, None] == iota16).astype(jnp.float32)
        c_f = jnp.sum(cand * lo_oh, axis=1)
        # freq from cum deltas: f = cum[sym+1] - cum[sym], where cum[16·b]
        # for the next block comes from the heads row and cum[256] = 4096.
        hnext = jnp.sum(
            jnp.where((hi_idx[:, None] + 1) == iota16, cumh_row[None, :], 0.0),
            axis=1,
        ) + jnp.where(hi_idx == 15, float(PROB_SCALE), 0.0)
        cand_next = jnp.concatenate([cand[:, 1:], hnext[:, None]], axis=1)
        f_f = jnp.sum(cand_next * lo_oh, axis=1) - c_f
        f = f_f.astype(jnp.int32).astype(jnp.uint32)
        c = c_f.astype(jnp.int32).astype(jnp.uint32)
        sym_ref[v * s_seg + j, :] = hi_idx * 16 + lo_idx
        x = f * (x >> PROB_BITS) + slot.astype(jnp.uint32) - c
        # ≤1 refill per lane (16-bit renorm): sequential window read
        need = x < jnp.uint32(WORD_L)
        k = jnp.sum(need.astype(jnp.int32))
        rank = jnp.dot(
            lt, need.astype(jnp.float32)[:, None],
            preferred_element_type=jnp.float32,
        )[:, 0].astype(jnp.int32)
        w = _win_read(stream_ref, v * w_rows, cur - k, rank, iota_jl)
        x = jnp.where(need, (x << 16) | w.astype(jnp.uint32), x)
        return x, cur - k

    def body(j, carry):
        xs, cs = carry
        outs = [one(v, j, xs[v], cs[v]) for v in range(v_seg)]
        return tuple(o[0] for o in outs), tuple(o[1] for o in outs)

    jax.lax.fori_loop(0, s_seg, body, (tuple(states), tuple(curs)))


@partial(jax.jit, static_argnames=("s_seg", "v_seg", "interpret"))
def decode_words_pallas(
    streams: jnp.ndarray,
    counts: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    s_seg: int,
    v_seg: int = DEFAULT_V_SEG,
    interpret: bool = False,
):
    """ALC3 segment decode.

    ``streams``: (n_streams, stream_rows(s_seg), 128) int32 words (emission
    order, ops/rans_word.py layout); ``counts``: (n_streams,) int32;
    ``freqs``/``cums``: (n_tables, 256) int32 sanitized tables — stream i
    uses table ``i // (n_streams // n_tables)`` (streams grouped by table,
    equal segment counts per table).  Returns (n_streams, s_seg, 128)
    int32 symbols.  ``s_seg`` must be a multiple of 8 (TPU sublane tiling)
    and segments-per-table a multiple of ``v_seg``.
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
    if seg_per_table % v_seg:
        raise ValueError(
            f"segments per table ({seg_per_table}) must be a multiple of "
            f"v_seg ({v_seg})"
        )
    slots_per_table = seg_per_table // v_seg

    del freqs  # decode derives freqs from cum deltas (f = cum[s+1]-cum[s])
    c32 = cums.astype(jnp.int32)
    chi = (c32 >> 8).astype(jnp.float32).reshape(n_tables * 16, 16)
    clo = (c32 & 255).astype(jnp.float32).reshape(n_tables * 16, 16)
    # cum heads replicated into (16,16) blocks: a (1,16) block would
    # violate the TPU sublane tiling rule (kernel reads row 0).
    cum_heads = jnp.broadcast_to(
        c32[:, ::16].astype(jnp.float32)[:, None, :], (n_tables, 16, 16)
    ).reshape(n_tables * 16, 16)

    kernel = partial(_decode_kernel, v_seg, s_seg, w_rows)
    sym = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_streams * s_seg, 128), jnp.int32),
        grid=(n_tables, slots_per_table),
        in_specs=[
            pl.BlockSpec((1, n_streams), lambda t, s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((v_seg * w_rows, 128),
                         lambda t, s: (t * slots_per_table + s, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((16, 16), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM)
        ] * 3,
        out_specs=pl.BlockSpec(
            (v_seg * s_seg, 128), lambda t, s: (t * slots_per_table + s, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        counts.astype(jnp.int32).reshape(1, n_streams),
        streams.reshape(n_streams * w_rows, 128),
        cum_heads, chi, clo,
    )
    return sym.reshape(n_streams, s_seg, 128)


# ── encode ──────────────────────────────────────────────────────


def _encode_kernel(v_seg, s_seg, w_rows,
                   sym_ref, fchi_ref, fclo_ref, stream_ref, counts_ref):
    # v_seg independent per-segment chains per slot (see _decode_kernel).
    iota16 = jax.lax.broadcasted_iota(jnp.int32, (NG, 16), 1)
    iota32 = jax.lax.broadcasted_iota(jnp.int32, (NG, 32), 1)
    iota_jl = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 1)
    lane_iota = iota_jl[0, :]
    ones = lane_iota >= 0
    lt = _lt_mask()

    stream_ref[:, :] = jnp.zeros(stream_ref.shape, stream_ref.dtype)

    def one(v, i, x, cur):
        row = sym_ref[v * s_seg + (s_seg - 1 - i), :]  # LIFO over rows
        # fused (freq | cum) lookup: one dot pair over the (16, 32) table
        hi_oh = ((row[:, None] >> 4) == iota16).astype(jnp.float32)
        blk = _dot16_exact(hi_oh, fchi_ref[:, :], fclo_ref[:, :])  # (NG, 32)
        lo_oh = ((row[:, None] & 15) == iota32 % 16).astype(jnp.float32)
        fc = blk * lo_oh
        f = jnp.sum(fc[:, :16], axis=1).astype(jnp.int32).astype(jnp.uint32)
        c = jnp.sum(fc[:, 16:], axis=1).astype(jnp.int32).astype(jnp.uint32)
        emit = (x >> 20) >= f
        w = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        k = jnp.sum(emit.astype(jnp.int32))
        rank = jnp.dot(
            lt, emit.astype(jnp.float32)[:, None],
            preferred_element_type=jnp.float32,
        )[:, 0].astype(jnp.int32)
        _win_append(stream_ref, v * w_rows, cur, rank, w, emit, iota_jl)
        x = jnp.where(emit, x >> 16, x)
        q = x // f
        x = (q << PROB_BITS) + (x - q * f) + c
        return x, cur + k

    def body(i, carry):
        xs, cs = carry
        outs = [one(v, i, xs[v], cs[v]) for v in range(v_seg)]
        return tuple(o[0] for o in outs), tuple(o[1] for o in outs)

    x0 = tuple(jnp.full((NG,), WORD_L, jnp.uint32) for _ in range(v_seg))
    c0 = tuple(jnp.int32(0) for _ in range(v_seg))
    xs, curs = jax.lax.fori_loop(0, s_seg, body, (x0, c0))

    # per-segment state flush: hi row then lo row, lane-ascending; counts
    # broadcast into (8,128) sub-blocks (per-slot scalar outputs violate
    # the TPU tiling rules; callers read element [v·8, 0]).
    for v in range(v_seg):
        _win_append(stream_ref, v * w_rows, curs[v], lane_iota,
                    (xs[v] >> 16).astype(jnp.int32), ones, iota_jl)
        _win_append(stream_ref, v * w_rows, curs[v] + NG, lane_iota,
                    (xs[v] & jnp.uint32(0xFFFF)).astype(jnp.int32), ones,
                    iota_jl)
        counts_ref[v * 8 : (v + 1) * 8, :] = jnp.full(
            (8, 128), curs[v] + 2 * NG, jnp.int32
        )


@partial(jax.jit, static_argnames=("v_seg", "interpret"))
def encode_words_pallas(
    symbols: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    v_seg: int = DEFAULT_V_SEG,
    interpret: bool = False,
):
    """ALC3 segment encode.

    ``symbols``: (n_streams, s_seg, 128) int32 in [0, 256) — segment-major
    symbol rows (stream i = table ``i // seg_per_table``);
    ``freqs``/``cums``: (n_tables, 256) int32 sanitized tables.  Returns
    ``(streams (n_streams, stream_rows(s_seg), 128) int32, counts
    (n_streams,) int32)`` in the ops/rans_word.py wire layout (zero-padded
    past ``counts``).  Segments-per-table must be a multiple of ``v_seg``.
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    n_streams, s_seg, _ = symbols.shape
    w_rows = stream_rows(s_seg)
    n_tables = freqs.shape[0]
    seg_per_table = n_streams // n_tables
    if seg_per_table % v_seg:
        raise ValueError(
            f"segments per table ({seg_per_table}) must be a multiple of "
            f"v_seg ({v_seg})"
        )
    slots_per_table = seg_per_table // v_seg

    # fused (freq | cum) table: columns 0-15 freq, 16-31 cum, hi/lo split
    f32 = freqs.astype(jnp.int32).reshape(n_tables, 16, 16)
    c32 = cums.astype(jnp.int32).reshape(n_tables, 16, 16)
    fc = jnp.concatenate([f32, c32], axis=2)  # (n_tables, 16, 32)
    fchi = (fc >> 8).astype(jnp.float32).reshape(n_tables * 16, 32)
    fclo = (fc & 255).astype(jnp.float32).reshape(n_tables * 16, 32)

    kernel = partial(_encode_kernel, v_seg, s_seg, w_rows)
    streams, counts = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_streams * w_rows, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_streams * 8, 128), jnp.int32),
        ),
        grid=(n_tables, slots_per_table),
        in_specs=[
            pl.BlockSpec((v_seg * s_seg, 128),
                         lambda t, s: (t * slots_per_table + s, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((16, 32), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM)
        ] * 2,
        out_specs=(
            pl.BlockSpec((v_seg * w_rows, 128),
                         lambda t, s: (t * slots_per_table + s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((v_seg * 8, 128),
                         lambda t, s: (t * slots_per_table + s, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        symbols.reshape(n_streams * s_seg, 128).astype(jnp.int32),
        fchi, fclo,
    )
    return (
        streams.reshape(n_streams, w_rows, 128),
        counts.reshape(n_streams, 8, 128)[:, 0, 0],
    )
