"""Pallas TPU kernels for the ALC3 segment word-rANS (ops/rans_word.py).

Why these replace the round-1 byte-stream kernels (rans_kernel.py /
rans_decode_kernel.py) on the hot path:

* The byte-stream decoder tracks one cursor PER LANE, so every refill is a
  gather — realized as an O(n_words) masked row-sum per symbol step.  ALC3
  stores words in emission order, so a segment has ONE scalar cursor and
  each step's refill is a 2-row window read resolved by a one-hot matmul:
  O(1) rows per step regardless of stream length.
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
  dominated by op issue, not data width.  Each grid slot processes
  ``v_seg`` segments as independent dataflow chains whose op latencies the
  scheduler interleaves.  Measured knee on v5e: v_seg=4 (v_seg=8 is flat —
  the loop body is issue-bound past that).  Execution detail only: the
  wire format is identical for every ``v_seg``.

**Lane-major layout — the key performance rule.**  Every per-symbol vector
lives in the 128-wide LANE dimension: states/slots/ranks are (1,128) rows,
search tables are (16,128) blocks (table index in sublanes), refill/append
one-hots are (256,128) (window position in sublanes).  The first version
of these kernels used the opposite orientation — ``slot[:, None]``-style
(128,1)/(128,16) intermediates — which costs 16 vregs per value at ≤12.5%
lane utilization plus a lane→sublane relayout per op: measured 79-96
Msym/s.  The lane-major rewrite of the SAME algorithm runs at ~830 Msym/s
decode on one v5e core.

Mosaic ground rules inherited from round 1 (see rans_kernel.py): no vector
int indexing (one-hot matmuls instead), MXU operands must be bf16-exact
(one-hots are 0/1 — always exact; table/word values are hi/lo byte-split
so both halves are ≤255), comparisons building one-hots stay in int32
(cum values up to 4096 are NOT bf16-exact; positions ≤255 are), no
f32→u32 casts (round-trip via int32), 2D blocks only, sublane dims in
multiples of 8.

Layout (all static shapes; NG = 128 lanes = one VPU lane row):

* symbols: (n_streams·s_seg, 128) int32 — segment-major symbol rows;
* streams: (n_streams·w_rows, 128) int32 — one u16 word per int32,
  w_rows = stream_rows(s_seg) ≥ s_seg + 3 (worst case s_seg+2 rows, +1
  margin so aligned 2-row window reads never leave the block);
* counts:  per-segment meaningful word counts — SMEM full-row input on
  decode; (8,128)-broadcast blocks per segment on encode output;
* tables:  transposed (16,16) hi/lo-split blocks T[j,k] = v[16k+j], so a
  lookup is dot(T, one_hot(hi_idx)) with the result's 16 candidates in
  sublanes and the 128 symbols in lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rans_word import PROB_BITS, PROB_SCALE, WORD_L

#: emit ⇔ (x >> _EMIT_SHIFT) ≥ f (see ops/rans_word.py duality note)
_EMIT_SHIFT = 32 - PROB_BITS
#: lanes per segment — fixed to the TPU lane width.
NG = 128
#: default segments processed per grid slot (see module docstring).
#: Round 2 measured the knee at 4; the round-3 register-window encode
#: kernel (lighter serial chain) moved it to 8: 840→891 Msym/s encode,
#: 668→684 decode at s_seg=2048, 512 segments on v5e.
DEFAULT_V_SEG = 8

#: encode-side V-batching ceiling (decode keeps DEFAULT_V_SEG — its
#: heavier chain knees at 8: 614 Msym/s at 8, 611 at 16 on v5e).
_ENC_V_SEG_MAX = 16

#: manual step-unroll factor for the per-symbol fori_loops (Mosaic
#: rejects fori_loop's own ``unroll=``): amortizes the loop carry/branch
#: overhead — measured on v5e decode: 830 (U=1) → 880 (U=2) → 910 (U=4)
#: Msym/s.  s_seg is always a multiple of 8, so U=4 divides every
#: segment; past 4 the compile-time cost outgrows the win.
_UNROLL = 4

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


def _iotas():
    """Shared kernel constants (all lane-major)."""
    iota16_0 = jax.lax.broadcasted_iota(jnp.int32, (16, NG), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NG), 1)
    i = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 1)
    # exclusive-prefix-sum matrix: rank = flags @ ltT (strict lower tri.)
    ltT = (i < j).astype(jnp.bfloat16)
    # window-op iotas: (128,128) position iota + (1,128) lane iota
    win = (i, lane_iota)
    return iota16_0, win, lane_iota, ltT


def _tdot16(t_hi_ref, t_lo_ref, oh):
    """Exact transposed-table lookup: (16,16) hi/lo blocks × (16,128)
    one-hot → (16,128) candidates (hi/lo split keeps both dots
    bf16-exact at default MXU precision)."""
    return (
        256.0 * jax.lax.dot_general(
            t_hi_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(
            t_lo_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    )


def _gather2d(block8, row, lane):
    """out[l] = block8[row_l, lane_l]: TWO Mosaic dynamic-gathers at the
    native (8,128) vreg granularity — first along lanes, then along
    sublanes (both verified bit-exact on v5e).  This replaced the
    original lane-roll + (128,128) one-hot + bf16 MXU dot scheme (~35
    vector ops per lookup) with ~4, all int32 end-to-end.  ``block8``:
    (8,128) int32; ``row``/``lane``: (1,128) int32."""
    g = jnp.take_along_axis(
        block8, jnp.broadcast_to(lane, (8, NG)), axis=1)
    return jnp.take_along_axis(
        g, jnp.broadcast_to(row, (8, NG)), axis=0)[0:1, :]


def _gather2d_rows(block, row, lane, n_rows):
    """_gather2d generalized to an (n_rows, 128) block (n_rows a multiple
    of 8): per-(8,128)-vreg gather pairs with an explicit select tree
    across the n_rows/8 vregs.  Mosaic's dynamic sublane gather is
    single-vreg ("Multiple source vregs along gather dimension" on a
    direct 32-row take_along_axis), but the per-vreg pairs are mutually
    independent — the scheduler overlaps them, so the tree adds ops, not
    serial depth."""
    if n_rows == 8:
        return _gather2d(block, row, lane)
    sub = row & 7
    out = None
    for k in range(n_rows // 8):
        g = _gather2d(block[8 * k : 8 * (k + 1), :], sub, lane)
        out = g if out is None else jnp.where((row >> 3) == k, g, out)
    return out


def _win_read(stream_ref, row_base, n_rows, base, pos, mask):
    """Read per-lane words from a window of one segment's stream.

    ``row_base``: static first row of the segment inside the block;
    ``n_rows``: static rows the segment owns from ``row_base``;
    ``base``: scalar word offset of the window start within the segment;
    ``pos``: (1,128) int32 word offsets relative to ``base`` (0 ≤ pos <
    128 + free lanes where ``mask`` holds; other lanes return 0).
    Returns (1,128) int32 word values.

    Reads an aligned 8-row window (clamped so the read stays inside the
    segment's rows), then one 2-D dynamic gather picks each lane's word.
    """
    r0 = base >> 7
    start = jnp.minimum(r0, n_rows - 8)
    rows8 = stream_ref[pl.ds(row_base + start, 8), :]    # (8,128) int32
    q = (base & (NG - 1)) + pos                          # [0, 256)
    out = _gather2d(rows8, (q >> 7) + (r0 - start), q & (NG - 1))
    return jnp.where(mask, out, 0)


# ── decode ──────────────────────────────────────────────────────


def _decode_kernel(v_seg, s_seg, w_rows,
                   counts_ref, stream_ref, lut_ref, sym_ref):
    # v_seg segments decode in one slot as INDEPENDENT dataflow chains
    # (they share no data, so the scheduler interleaves their op
    # latencies — the point of V-batching).
    iota16_0, win, lane_iota, ltT = _iotas()

    slot0 = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    # count == 0 marks an ELIDED all-zero segment (ops/rans_word.py):
    # its symbols are zeros and no stream words exist.  A fully-elided
    # slot skips the serial chains; inside an active slot an elided
    # segment's chain runs on clamped window reads (garbage, in-bounds)
    # and its output rows are zeroed afterwards.
    cnts = [counts_ref[0, slot0 * v_seg + v] for v in range(v_seg)]
    slot_active = cnts[0] > 0
    for v in range(1, v_seg):
        slot_active = jnp.logical_or(slot_active, cnts[v] > 0)

    @pl.when(jnp.logical_not(slot_active))
    def _zero_slot():
        sym_ref[:, :] = jnp.zeros(sym_ref.shape, sym_ref.dtype)

    @pl.when(slot_active)
    def _decode_slot():
        _decode_slot_body(v_seg, s_seg, w_rows, cnts, stream_ref,
                          lut_ref, sym_ref, win, lane_iota, ltT)


def _decode_slot_body(v_seg, s_seg, w_rows, cnts, stream_ref,
                      lut_ref, sym_ref, win, lane_iota, ltT):
    states = []
    curs = []
    ones = lane_iota >= 0
    for v in range(v_seg):
        cnt = cnts[v]
        c0 = jnp.maximum(cnt - 2 * NG, 0)
        hi = _win_read(stream_ref, v * w_rows, w_rows, c0, lane_iota,
                       ones)
        lo = _win_read(stream_ref, v * w_rows, w_rows, c0 + NG,
                       lane_iota, ones)
        x = hi.astype(jnp.uint32) << 16
        states.append(x | lo.astype(jnp.uint32))
        curs.append(c0)

    def one(v, j, x, cur):
        slot = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)  # (1,128)
        # slot → (symbol, freq, bias) in ONE fused-LUT lookup: entry
        # e[slot] = sym | (f−1)<<8 | (slot − cum[sym])<<(8+PROB_BITS)
        # (all three fields fit i32 at PROB_BITS=11 — f ≤ 2048, bias < f).
        # Round 3 chained a packed cum_to_sym gather into a
        # symbol-indexed f/c gather; fusing per SLOT removes the
        # dependent second gather group from the serial chain (the state
        # update needs only f and bias, src/rans.rs:351-371 rewritten as
        # x' = f·(x>>PROB_BITS) + (slot − c)).
        e = _gather2d_rows(lut_ref[:, :], slot >> 7, slot & (NG - 1),
                           PROB_SCALE // NG)
        sym_ref[v * s_seg + j, :] = (e[0, :] & 255)
        f = (((e >> 8) & (PROB_SCALE - 1)) + 1).astype(jnp.uint32)
        bias = ((e >> (8 + PROB_BITS)) & (PROB_SCALE - 1)).astype(jnp.uint32)
        x = f * (x >> PROB_BITS) + bias
        # ≤1 refill per lane (16-bit renorm): sequential window read, lanes
        # ranked by an exclusive prefix sum over the need flags.
        need = x < jnp.uint32(WORD_L)
        k = jnp.sum(need.astype(jnp.int32))
        rank = jax.lax.dot_general(
            need.astype(jnp.bfloat16), ltT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                                        # (1,128)
        # base clamp: a no-op for valid streams (the cursor never
        # underflows 0), keeps an elided segment's garbage chain inside
        # an otherwise-active slot reading in-bounds
        w = _win_read(stream_ref, v * w_rows, w_rows,
                      jnp.maximum(cur - k, 0), rank, need)
        x = jnp.where(need, (x << 16) | w.astype(jnp.uint32), x)
        return x, cur - k

    def body(j, carry):
        xs, cs = carry
        outs = [one(v, j, xs[v], cs[v]) for v in range(v_seg)]
        return tuple(o[0] for o in outs), tuple(o[1] for o in outs)

    def body_u(j, carry):
        for u in range(_UNROLL):
            carry = body(j * _UNROLL + u, carry)
        return carry

    jax.lax.fori_loop(0, s_seg // _UNROLL, body_u,
                      (tuple(states), tuple(curs)))

    # elided segments decode to all zeros regardless of the garbage
    # their interleaved chain produced
    for v in range(v_seg):
        @pl.when(cnts[v] == 0)
        def _zero_seg(v=v):
            sym_ref[pl.ds(v * s_seg, s_seg), :] = jnp.zeros(
                (s_seg, NG), sym_ref.dtype)


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

    c32 = cums.astype(jnp.int32)
    f32 = freqs.astype(jnp.int32)
    # fused per-slot LUT: e[slot] = sym | (f−1)<<8 | (slot − cum[sym])<<20
    # — one gather serves the whole decode step (see _decode_slot_body).
    # (n_tables·32, 128) gather rows.
    slots = jnp.arange(PROB_SCALE, dtype=jnp.int32)

    def _entry(fr, cr):
        sym = jnp.searchsorted(cr, slots, side="right") - 1
        return (sym | ((fr[sym] - 1) << 8)
                | ((slots - cr[sym]) << (8 + PROB_BITS)))

    lut = jax.vmap(_entry)(f32, c32).reshape(
        n_tables * (PROB_SCALE // NG), 128)

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
            pl.BlockSpec((PROB_SCALE // NG, 128), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (v_seg * s_seg, 128), lambda t, s: (t * slots_per_table + s, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        counts.astype(jnp.int32).reshape(1, n_streams),
        streams.reshape(n_streams * w_rows, 128),
        lut,
    )
    return sym.reshape(n_streams, s_seg, 128)


# ── encode ──────────────────────────────────────────────────────


def _reg_append(win, cur, pos, words, mask, w0):
    """Append per-lane words into the REGISTER-resident row window.

    Same compaction as :func:`_win_append` (lane contraction against a
    (128,128) one-hot, then a dynamic lane-roll to ``cur & 127``), but
    the accumulation happens in vector registers: no stream-row reads,
    no read-modify-write dependency through VMEM.  ``w0`` is the active
    (partial) stream row ``cur >> 7``.  Returns ``(full, wrap, k)``:
    ``full`` = w0 plus this append's words landing in the active row,
    ``wrap`` = the words spilling into row ``(cur >> 7) + 1`` (nonzero
    only when the append crosses the row boundary, i.e. (cur & 127) + k
    ≥ 128), ``k`` = appended word count.
    """
    iota128_0, lane = win
    sh = cur & 127
    p = jnp.where(mask, pos, -1)
    oh = (p == iota128_0).astype(jnp.bfloat16)           # (128,128)
    w2 = jnp.concatenate(
        [jnp.where(mask, words >> 8, 0).astype(jnp.bfloat16),
         jnp.where(mask, words & 255, 0).astype(jnp.bfloat16)], axis=0
    )                                                    # (2,128)
    c = jax.lax.dot_general(
        w2, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # (2,128): [hi; lo]
    v = (256.0 * c[0:1, :] + c[1:2, :]).astype(jnp.int32)
    vr = pltpu.roll(v, sh, 1)
    k = jnp.sum(mask.astype(jnp.int32))
    full = w0 + jnp.where(lane >= sh, vr, 0)
    wrap = jnp.where(lane < sh, vr, 0)
    return full, wrap, k


def _encode_kernel(v_seg, s_seg, w_rows,
                   sym_ref, fc_ref,
                   stream_ref, counts_ref):
    # v_seg independent per-segment chains per slot (see _decode_kernel).
    iota16_0, win, lane_iota, ltT = _iotas()

    stream_ref[:, :] = jnp.zeros(stream_ref.shape, stream_ref.dtype)
    counts_ref[:, :] = jnp.zeros(counts_ref.shape, jnp.int32)

    # all-zero segments are ELIDED (wire count 0; ops/rans_word.py
    # encode_channel_words) — and a fully-elided slot skips its serial
    # chains outright.  Empty chroma planes / flat regions then cost
    # ~nothing instead of s_seg coding steps per segment (measured: the
    # north-star content's Co/Cg planes are entirely zero, 37M of its
    # 96M coded symbols).  The occupancy scan is ~0.6% of chain cost.
    has = [
        jnp.any(sym_ref[pl.ds(v * s_seg, s_seg), :] != 0)
        for v in range(v_seg)
    ]
    slot_active = has[0]
    for v in range(1, v_seg):
        slot_active = jnp.logical_or(slot_active, has[v])

    def one(v, i, x, cur, w0):
        row = sym_ref[pl.ds(v * s_seg + (s_seg - 1 - i), 1), :]  # LIFO rows
        # (freq | cum) in ONE fused lookup: fc[sym] = (f−1)<<PROB_BITS | c
        # (f ≤ 2048 and c < 2048 both fit at PROB_BITS=11) — a single
        # gather pair on the (8,128)-padded 2-row table replaces round
        # 3's lane gather + two dependent sublane gathers.
        e = _gather2d(fc_ref[:, :], row >> 7, row & (NG - 1))
        f = (((e >> PROB_BITS) & (PROB_SCALE - 1)) + 1).astype(jnp.uint32)
        c = (e & (PROB_SCALE - 1)).astype(jnp.uint32)
        emit = (x >> _EMIT_SHIFT) >= f
        w = (x & jnp.uint32(0xFFFF)).astype(jnp.int32)
        rank = jax.lax.dot_general(
            emit.astype(jnp.bfloat16), ltT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        full, wrap, k = _reg_append(win, cur, rank, w, emit, w0)
        # the active row is stored UNCONDITIONALLY every step (last store
        # wins); on a row crossing the stored row is final and the window
        # slides to the wrap row — registers hold the authoritative
        # content, so the store never feeds back into the chain.
        stream_ref[pl.ds(v * w_rows + (cur >> 7), 1), :] = full
        ncur = cur + k
        w0 = jnp.where((ncur >> 7) != (cur >> 7), wrap, full)
        x = jnp.where(emit, x >> 16, x)
        q = x // f
        x = (q << PROB_BITS) + (x - q * f) + c
        return x, ncur, w0

    def body(i, carry):
        xs, cs, w0s = carry
        outs = [one(v, i, xs[v], cs[v], w0s[v]) for v in range(v_seg)]
        return tuple(zip(*outs))

    def body_u(i, carry):
        for u in range(_UNROLL):
            carry = body(i * _UNROLL + u, carry)
        return carry

    @pl.when(slot_active)
    def _encode_slot():
        x0 = tuple(jnp.full((1, NG), WORD_L, jnp.uint32)
                   for _ in range(v_seg))
        c0 = tuple(jnp.int32(0) for _ in range(v_seg))
        wz = tuple(jnp.zeros((1, NG), jnp.int32) for _ in range(v_seg))
        xs, curs, w0s = jax.lax.fori_loop(
            0, s_seg // _UNROLL, body_u, (x0, c0, wz))

        # per-segment state flush: hi row then lo row, lane-ascending (two
        # full-row appends — each crosses exactly one row boundary, so the
        # stored ``full`` row is final and ``wrap`` becomes the new active
        # row); counts broadcast into (8,128) sub-blocks (per-slot scalar
        # outputs violate the TPU tiling rules; callers read element
        # [v·8, 0]).  Elided segments keep count 0 (their chain ran as
        # part of the active slot; count 0 discards its bytes).
        ones = lane_iota >= 0
        for v in range(v_seg):
            x, cur, w0 = xs[v], curs[v], w0s[v]
            for words in ((x >> 16).astype(jnp.int32),
                          (x & jnp.uint32(0xFFFF)).astype(jnp.int32)):
                full, wrap, _ = _reg_append(win, cur, lane_iota, words,
                                            ones, w0)
                stream_ref[pl.ds(v * w_rows + (cur >> 7), 1), :] = full
                w0 = wrap
                cur = cur + NG
            stream_ref[pl.ds(v * w_rows + (cur >> 7), 1), :] = w0
            counts_ref[v * 8 : (v + 1) * 8, :] = jnp.where(
                has[v], jnp.full((8, 128), cur, jnp.int32), 0
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
    # The encode chain is lighter than decode's, so its V-batching knee
    # sits higher (v5e: 783 Msym/s at v_seg=8 → 816 at 16, benches/
    # knobs.py); the stream bytes are identical for every v_seg, so the
    # execution batching upgrades itself whenever the grid allows.
    while v_seg < _ENC_V_SEG_MAX and seg_per_table % (2 * v_seg) == 0:
        v_seg *= 2
    slots_per_table = seg_per_table // v_seg

    # (8,128) i32 gather rows per table: rows 0-1 hold the fused
    # (f−1)<<PROB_BITS | c entries for symbols 0-127 / 128-255 (rows 2-7
    # pad to the native 8-sublane gather shape)
    packed = (((freqs.astype(jnp.int32) - 1) << PROB_BITS)
              | cums.astype(jnp.int32)).reshape(n_tables, 2, 128)
    fc = jnp.concatenate(
        [packed, jnp.zeros((n_tables, 6, 128), jnp.int32)], axis=1
    ).reshape(n_tables * 8, 128)

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
            pl.BlockSpec((8, 128), lambda t, s: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
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
        fc,
    )
    return (
        streams.reshape(n_streams, w_rows, 128),
        counts.reshape(n_streams, 8, 128)[:, 0, 0],
    )
