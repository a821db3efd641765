"""Pallas TPU kernels for ALC3 sparse significance coding (compact/expand).

Round-2 measured XLA's data-dependent gather/compaction at ~17-100 Msym/s
on TPU (pipeline.py round-2 sparse_expand docstring) — slower end-to-end
than just entropy-coding the zeros.  These kernels realize the 3-5×
symbol-reduction of sparse mode as wall-clock by making
compaction/expansion block-local window ops (the same one-hot machinery
as the rANS kernels, rans3_kernels.py), pipelined across a block grid.

Sparse plane layout (the v3 sparse wire; executable spec in
ops/sparse_spec.py):

* A channel's P symbols are viewed as ``Pr = P/128`` lane rows.  The
  significance **bitmap** packs along SUBLANES: bitmap byte at (row r',
  lane l) holds bit j = significance of pixel row ``8·r' + j``, lane l —
  so a kernel unpacks 8 pixel rows with ONE shift+mask op, and the
  bitmap plane is the (Pr/8, 128) byte array flattened row-major
  (P/8 entropy symbols per channel, same count as round 2).
* **Values** are compacted TILE-MAJOR (wire v5): the plane is tiled into
  TILES of ``TILE_ROWS = 8`` pixel rows — exactly one hardware (8,128)
  vreg and one bitmap byte-row; each tile's nonzero symbols (pixel
  order) are appended and zero-padded up to a whole number of 128-lane
  rows.  Tiles concatenate; the tail is zero-padded to the
  segment-aligned value capacity ``kcap``.

  The tile granularity is the round-3 performance redesign: every
  tile's value region starts at a ROW boundary, so the compact kernel
  builds each tile's padded rows entirely in vector registers and
  stores them with ONE aligned block store, and the expand kernel reads
  each tile's rows with ONE aligned window read + 2-D dynamic gather.
  The wire v3/v4 layout padded per 512-row BLOCK instead, which forced
  a serial lane-append chain through the whole block (measured 155 ms
  compact / most of 183 ms expand at 1080p×64 — the two largest stages
  of the roundtrip).  Tiles share NO state at all: each tile's row
  offset is an SMEM prepass value (tile_row_bases_from_*), so every
  tile body is independent dataflow and the kernels unroll
  DEFAULT_TILE_UNROLL tiles per loop step for ILP.  Rate cost of the
  finer padding: value rows grow by the per-tile ceil (≈ +6-9% value
  symbols at q=90 densities; the padding symbol 0 carries probability
  mass like every other padding, see alc3._table_hists).

Kernel processing granularity stays ``BLOCK_ROWS = 512`` pixel rows per
grid step (DMA efficiency); block value-row bases are an XLA prepass
(popcount + cumsum over the tiny (3, nb·64) tile-count array), so blocks
share NO state: the kernels V-batch blocks per grid slot exactly like
the rANS kernels V-batch segments.  Empty 8-row tiles (the common case
in high sub-bands) skip all scatter/gather work via ``pl.when`` — the
kernels are content-adaptive.

Mosaic ground rules inherited from rans3_kernels.py: lane-major
everything, one-hot matmuls instead of vector indexing, bf16-exact MXU
operands (symbols ≤ 255 and one-hots are exact — no hi/lo split needed
here), int32 compares.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rans3_kernels import NG, _compiler_params, _gather2d

#: pixel rows per KERNEL processing block (BR·128 = 65536 pixels; value
#: scratch = (BR+8)·512 B ≈ 266 KB of VMEM per v-slot).  Processing
#: granularity only — the WIRE pads values per TILE_ROWS tile.
BLOCK_ROWS = 512
#: pixel rows per value-padding tile (wire v5): one (8,128) vreg / one
#: bitmap byte-row.  Each tile's nonzeros pad to whole 128-lane rows.
TILE_ROWS = 8
#: blocks processed per grid slot as independent dataflow chains.  alc3
#: pads the sparse plane so the per-channel block count is always a
#: multiple of this (1080p×64 gives nb=2025 blocks — without padding the
#: odd count forced v_blk=1, i.e. NO chain interleaving on the flagship
#: shape).  Round-4 sweep (benches/knobs.py on v5e, 15% density): 4 →
#: 530, 8 → 508, 16 → 631 Msym/s compact (expand flat ~640) — the
#: per-tile serial chains are latency-bound deep into the interleave.
DEFAULT_V_BLK = 16

#: tiles handled per fori_loop step (per interleaved block chain) — with
#: per-tile SMEM bases the tile bodies are fully independent, so the
#: unroll multiplies the per-iteration ILP the scheduler can exploit.
DEFAULT_TILE_UNROLL = 2

__all__ = [
    "BLOCK_ROWS",
    "TILE_ROWS",
    "block_geometry",
    "block_value_rows",
    "plane_row_bases",
    "value_row_bases",
    "tile_row_bases_from_symbols",
    "tile_row_bases_from_bitmaps",
    "compact_pallas",
    "expand_pallas",
]


def block_geometry(p: int, br: int = BLOCK_ROWS) -> tuple[int, int]:
    """(pixel rows, blocks) for a channel of ``p`` symbols (``p`` must be
    a whole number of blocks; alc3 pads the symbol plane up front)."""
    if p % (NG * 8):
        raise ValueError(f"channel symbols {p} not a multiple of {NG * 8}")
    pr = p // NG
    if pr % br:
        raise ValueError(f"pixel rows {pr} not a multiple of BR={br}")
    return pr, pr // br


def _norm_krs(krs, nc: int) -> tuple[int, ...]:
    """Normalize a capacity spec to a per-plane tuple of value rows."""
    if isinstance(krs, int):
        return (krs,) * nc
    krs = tuple(int(k) for k in krs)
    if len(krs) != nc:
        raise ValueError(f"{len(krs)} capacities for {nc} planes")
    return krs


def block_value_rows(planes: jnp.ndarray):
    """Value rows each plane needs under tile-major (wire v5) padding.

    ``planes``: (nc, P) symbols (P a whole number of tiles).  Returns
    (nc,) int32.  The ONE owner of the ceil-per-tile rule — encoder
    capacity sizing (alc3/pipeline phase 1) and the kernels' vbase
    prepass must agree on it exactly."""
    nc, p = planes.shape
    blk = TILE_ROWS * NG
    cnt = jnp.sum(
        (planes.reshape(nc, p // blk, blk) != 0).astype(jnp.int32), axis=-1)
    return jnp.sum(-(-cnt // NG), axis=-1).astype(jnp.int32)


def plane_row_bases(krs: tuple[int, ...], br: int = BLOCK_ROWS):
    """Starting row of each plane's region in the flattened values array
    (each plane occupies ``krs[c] + br`` rows: capacity + DMA margin)."""
    bases, acc = [], 0
    for k in krs:
        bases.append(acc)
        acc += k + br
    return tuple(bases), acc


def value_row_bases(bitmaps: jnp.ndarray, p: int, krs,
                    br: int = BLOCK_ROWS):
    """XLA prepass: per-block value row bases from the packed bitmaps.

    ``bitmaps``: (nc, P/8) uint8 (row-major over the (Pr/8, 128) byte
    array; nc = 3 planes, or 6 for deep×sparse).  ``krs``: per-plane
    value capacity rows (int = uniform) — planes may differ (chroma
    planes are typically far sparser than luma).  Returns ``(vbase
    (nc·nb,) int32 — ABSOLUTE row bases into the flattened
    (sum(krs)+nc·br, 128) values array, ch_rows (nc,) int32 — total
    value rows per plane)``.
    """
    nc = bitmaps.shape[0]
    krs = _norm_krs(krs, nc)
    pr, nb = block_geometry(p, br)
    # one bitmap byte-row (128 bytes) per tile → per-tile set counts
    counts = jax.lax.population_count(
        bitmaps.astype(jnp.uint8).reshape(nc, nb * (br // TILE_ROWS), NG)
    ).astype(jnp.int32).sum(axis=-1)                       # (nc, ntiles)
    trows = -(-counts // NG)                               # ceil per tile
    rows = trows.reshape(nc, nb, br // TILE_ROWS).sum(-1)  # (nc, nb)
    ch_rows = rows.sum(axis=-1)                            # (nc,)
    excl = jnp.cumsum(rows, axis=-1) - rows                # exclusive scan
    # clamp to capacity so a hostile bitmap (popcount beyond the declared
    # capacity) can never drive the expand kernel's window DMAs out of
    # bounds (the br margin rows absorb the clamped block's window)
    excl = jnp.minimum(excl, jnp.asarray(krs, jnp.int32)[:, None])
    bases, _ = plane_row_bases(krs, br)
    vbase = excl + jnp.asarray(bases, jnp.int32)[:, None]
    return vbase.reshape(-1).astype(jnp.int32), ch_rows


def _tile_rel_bases(trows: jnp.ndarray) -> jnp.ndarray:
    """(nc, nb, bm8) per-tile ceil rows → flat (nc·nb·bm8,) PACKED tile
    descriptors: ``(rows << 16) | base`` where ``base`` is the tile's
    BLOCK-RELATIVE value-row offset (exclusive prefix within each block)
    and ``rows`` its ceil row count.  Each tile's ceil is ≤ 8 rows and a
    block has bm8 tiles, so bases are bounded by 8·(bm8-1) ≤ br-8 by
    construction — even for hostile bitmaps the kernels' tile windows
    stay inside the staged br(+8) rows.  Packing both scalars into one
    SMEM word keeps ALL per-tile control scalar-side: the kernels never
    move a vector reduction into a scalar register."""
    rel = jnp.cumsum(trows, axis=-1) - trows
    packed = (trows << 16) | rel
    return packed.reshape(-1).astype(jnp.int32)


def tile_row_bases_from_symbols(symbols: jnp.ndarray, p: int,
                                br: int = BLOCK_ROWS) -> jnp.ndarray:
    """Encode-side prepass: block-relative value-row offset of every
    8-row tile, from the (nc, P) symbol planes.  Must agree with
    :func:`block_value_rows`' ceil-per-tile rule exactly."""
    nc = symbols.shape[0]
    _, nb = block_geometry(p, br)
    bm8 = br // TILE_ROWS
    blk = TILE_ROWS * NG
    cnt = jnp.sum(
        (symbols.reshape(nc, nb * bm8, blk) != 0).astype(jnp.int32), axis=-1)
    return _tile_rel_bases((-(-cnt // NG)).reshape(nc, nb, bm8))


def tile_row_bases_from_bitmaps(bitmaps: jnp.ndarray, p: int,
                                br: int = BLOCK_ROWS) -> jnp.ndarray:
    """Decode-side prepass: same offsets, recovered from the packed
    bitmaps (one bitmap byte-row = one tile)."""
    nc = bitmaps.shape[0]
    _, nb = block_geometry(p, br)
    bm8 = br // TILE_ROWS
    counts = jax.lax.population_count(
        bitmaps.astype(jnp.uint8).reshape(nc, nb * bm8, NG)
    ).astype(jnp.int32).sum(axis=-1)
    return _tile_rel_bases((-(-counts // NG)).reshape(nc, nb, bm8))


def _iotas():
    iota8_0 = jax.lax.broadcasted_iota(jnp.int32, (8, NG), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, NG), 1)
    i = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (NG, NG), 1)
    ltT = (i < j).astype(jnp.bfloat16)
    lt8 = (i[:8, :8] > j[:8, :8]).astype(jnp.float32)  # strict lower tri (8,8)
    return iota8_0, (i, lane_iota), ltT, lt8


def _flat_shift_left(x, s: int):
    """Row-major flat shift on an (8, NG) tile: out[f] = x[f + s] (zeros
    shifted in past the end).  s < NG: one lane roll + one row shift +
    one select; s a multiple of NG: pure row shift."""
    rows = x.shape[0]
    rshift, lshift = divmod(s, NG)

    def rows_up(a, k):
        if k == 0:
            return a
        if k >= rows:
            return jnp.zeros_like(a)
        return jnp.concatenate(
            [a[k:, :], jnp.zeros((k, NG), a.dtype)], axis=0)

    if lshift == 0:
        return rows_up(x, rshift)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    a = pltpu.roll(x, NG - lshift, 1)      # (r, (l+s) mod NG)
    b = rows_up(a, 1)                      # next row's wrap lanes
    base = jnp.where(lane < NG - lshift, a, b)
    return rows_up(base, rshift)


def _tile_prefix(bits):
    """(exclusive in-row rank (8,NG), exclusive row-count prefix (8,1))
    via log-step shift+adds — pure VPU, no MXU round trip."""
    lane = jax.lax.broadcasted_iota(jnp.int32, bits.shape, 1)
    inc = bits
    for s in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(inc, s, 1)
        inc = inc + jnp.where(lane >= s, sh, 0)
    rank = inc - bits                      # exclusive within-row
    cnt = inc[:, NG - 1 :]                 # (8,1) row totals
    row = jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 0)
    pre = cnt
    for s in (1, 2, 4):                    # sublane Hillis-Steele scan
        sh = pltpu.roll(pre, s, 0)
        pre = pre + jnp.where(row >= s, sh, 0)
    return rank, pre - cnt                 # (…, exclusive row prefix)


def _butterfly_compact(rows, bits):
    """Within-tile stream compaction as an LSB-first butterfly route
    (the PEXT network construction, word-level).  Each valid element
    carries its left-displacement d = flat_pos − global_rank packed
    alongside its value; round k shifts elements with bit k of d by 2^k.
    Collision-free: if valid a<b landed on one lane after round k, then
    d_b ≡ d_a + (b−a) (mod 2^{k+1}) with d monotone forces
    rank_b ≤ rank_a — contradiction.  ~150 VPU ops per 1024-symbol tile
    vs ~400 for the per-row one-hot + MXU-dot scatter ("dot"), with no
    serial MXU round trips.  Returns the tile's value rows, zero-padded
    (rows ≥ ceil(nnz/128) are all zero)."""
    rank, off = _tile_prefix(bits)
    row8 = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    flat = row8 * NG + lane
    d = flat - (off + rank)                # 0 ≤ d ≤ 1023
    packed = jnp.where(bits == 1, rows | (d << 8) | (1 << 18), 0)
    for k in range(10):                    # shifts 1, 2, …, 512
        inc = _flat_shift_left(packed, 1 << k)
        move_in = (inc >> (8 + k)) & (inc >> 18) & 1
        stay = ((packed >> 18) & 1) & (1 - ((packed >> (8 + k)) & 1))
        packed = jnp.where(move_in == 1, inc,
                           jnp.where(stay == 1, packed, 0))
    return jnp.where((packed >> 18) & 1 == 1, packed & 255, 0)


def _row_ranks(bits8, ltT, lt8):
    """Per-row machinery for an (8, NG) bit tile: returns ``(rank (8,NG)
    int32 — exclusive prefix within each row, off (8,1) int32 — exclusive
    prefix of full-row counts)``."""
    b = bits8.astype(jnp.bfloat16)
    rank = jax.lax.dot_general(
        b, ltT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (8, NG)
    cnt = jnp.sum(b.astype(jnp.float32), axis=1, keepdims=True)   # (8,1)
    off = jax.lax.dot_general(
        lt8, cnt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (8,1) exclusive
    return rank.astype(jnp.int32), off.astype(jnp.int32)


# ── compact (encode side) ───────────────────────────────────────


def _compact_kernel(v_blk, br, u, skip_empty, algo,
                    vbase_ref, tbase_ref, brows_ref, sym_ref,
                    bm_ref, vals_hbm, scratch, sems):
    iota8_0, win, ltT, lt8 = _iotas()
    iota128_0, lane = win
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, NG), 0)
    slot = pl.program_id(0)
    bm8 = br // TILE_ROWS

    # Whole-slot skip: the per-tile iteration costs ~300-400 cycles of
    # fixed overhead (SMEM descriptor read + dynamic store bases + when
    # machinery) EVEN when every tile is empty — measured 37.8 ms for an
    # all-zero 98k-tile plane set on v5e.  A slot whose v_blk blocks all
    # have zero value rows (empty chroma planes, flat regions) writes
    # its bitmap zeros as one block store and skips the tile loop AND
    # the write-out DMAs (its HBM value regions are either overwritten
    # by the next non-empty block's sequential DMA or ≥ ch_rows and
    # masked by the caller).
    slot_active = brows_ref[0, slot * v_blk] > 0
    for _v in range(1, v_blk):
        slot_active = jnp.logical_or(
            slot_active, brows_ref[0, slot * v_blk + _v] > 0)

    @pl.when(jnp.logical_not(slot_active))
    def _zero_slot():
        bm_ref[:, :] = jnp.zeros(bm_ref.shape, jnp.int32)

    @pl.when(slot_active)
    def _active_slot():
        _compact_slot(v_blk, br, u, skip_empty, algo, slot,
                      vbase_ref, tbase_ref, sym_ref, bm_ref, vals_hbm,
                      scratch, sems, iota8_0, win, ltT, lt8, row8, bm8)


def _compact_slot(v_blk, br, u, skip_empty, algo, slot,
                  vbase_ref, tbase_ref, sym_ref, bm_ref, vals_hbm,
                  scratch, sems, iota8_0, win, ltT, lt8, row8, bm8):
    iota128_0, lane = win

    # No scratch zero-init (round 3 zeroed all v_blk·(br+8) rows every
    # grid step — 4.3 MB of stores at v_blk=16): consecutive tile stores
    # cover [0, cur_final+8) gap-free (a skipped tile leaves cur in
    # place, so the next tile's window overlaps its region), rows past a
    # block's used rows land in the NEXT block's HBM region and its
    # sequential DMA overwrites them, and rows ≥ ch_rows of the final
    # blocks are masked to the zero padding symbol by the caller
    # (alc3._encode_chunk_sparse) — the vals output's contract already
    # leaves rows beyond each plane's used rows UNSPECIFIED.

    def one(v, g):
        # per-tile descriptor from the SMEM prepass: value-row offset
        # within the block (low 16 bits) and ceil row count (high bits).
        # ALL control scalars come from SMEM — no vector reduction ever
        # crosses into a scalar register.
        packed = tbase_ref[0, 0, v * bm8 + g]
        cur = packed & 0xFFFF
        trows = packed >> 16
        rows = sym_ref[pl.ds(v * br + TILE_ROWS * g, 8), :]
        bits = (rows != 0).astype(jnp.int32)                   # (8,NG)
        # bitmap byte row: bit j = pixel row 8g+j
        byte = jnp.sum(bits << iota8_0, axis=0, keepdims=True)
        bm_ref[pl.ds(v * bm8 + g, 1), :] = byte

        def _search():
            # GATHER-based compaction (the rans3 lesson: Mosaic dynamic
            # gathers beat one-hot MXU scatters).  For each OUTPUT value
            # row r < trows, each lane o = 128r+l pulls its source
            # element with a branchless binary search over the tile's
            # inclusive global prefix cg (row-major monotone): the o-th
            # nonzero lives at flat index #{cg ≤ o}.  Work scales with
            # the tile's VALUE rows (≈ density·8), not its 8 pixel rows.
            rank, off = _row_ranks(bits, ltT, lt8)
            cg = off + rank + bits                # (8,NG) inclusive prefix
            cnt_v = cg[7:8, NG - 1 :]             # (1,1) total, vector side
            for r in range(8):
                def _row(r=r):
                    o = lane + r * NG
                    inv = jnp.zeros((1, NG), jnp.int32)
                    for step in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
                        cand = inv + (step - 1)
                        cc = jnp.minimum(cand, 8 * NG - 1)
                        val = _gather2d(cg, cc >> 7, cc & (NG - 1))
                        ok = jnp.logical_and(val <= o, cand < 8 * NG)
                        inv = jnp.where(ok, inv + step, inv)
                    iv = jnp.minimum(inv, 8 * NG - 1)
                    out = _gather2d(rows, iv >> 7, iv & (NG - 1))
                    scratch[pl.ds(v * (br + 8) + cur + r, 1), :] = (
                        jnp.where(o < cnt_v, out, 0))
                pl.when(r < trows)(_row)

        def _butterfly():
            acc = _butterfly_compact(rows, bits)
            # same store contract as _scatter: rows past the tile's ceil
            # are zeros; the next tile's store overwrites them.
            scratch[pl.ds(v * (br + 8) + cur, 8), :] = acc

        def _scatter():
            rank, off = _row_ranks(bits, ltT, lt8)
            # the tile's padded value rows build entirely in registers:
            # per pixel row j, one-hot left-compaction (independent MXU
            # dots), then placement at the tile-local offset off_j —
            # a lane roll plus row-select masks.  No appends through
            # VMEM, no cross-tile chain.
            parts = []
            for j in range(8):
                mask = bits[j : j + 1, :] == 1
                word = jnp.where(mask, rows[j : j + 1, :], 0)
                pp = jnp.where(mask, rank[j : j + 1, :], -1)
                oh = (pp == iota128_0).astype(jnp.bfloat16)
                c = jax.lax.dot_general(
                    word.astype(jnp.bfloat16), oh,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (1,128)
                cj = c.astype(jnp.int32)
                oj = off[j, 0]                  # tile-local word offset
                sh = oj & 127
                vr = pltpu.roll(cj, sh, 1)
                r0 = oj >> 7
                a = jnp.where(lane >= sh, vr, 0)      # lands in row r0
                b = jnp.where(lane < sh, vr, 0)       # spills to r0+1
                parts.append(jnp.where(row8 == r0, a, 0)
                             + jnp.where(row8 == r0 + 1, b, 0))
            acc = parts[0]
            for part in parts[1:]:
                acc = acc + part
            # one aligned 8-row store; rows past this tile's ceil are
            # zeros and the NEXT tile's store (program order over the
            # overlapping dynamic windows) overwrites them — trailing
            # zeros past the block's rows land in the next block's
            # region and are overwritten by its write-out DMA
            # (sequential block order below).
            scratch[pl.ds(v * (br + 8) + cur, 8), :] = acc

        body = {"search": _search, "dot": _scatter,
                "butterfly": _butterfly}[algo]
        if skip_empty:
            pl.when(trows > 0)(body)
        else:
            body()

    def tile(g, _):
        # u tiles × v_blk blocks per step, all independent dataflow (the
        # compute chains interleave; only the overlapping scratch stores
        # keep program order).
        for k in range(u):
            for v in range(v_blk):
                one(v, g * u + k)
        return 0

    jax.lax.fori_loop(0, bm8 // u, tile, jnp.int32(0))

    # SEQUENTIAL write-out: consecutive blocks' value windows overlap
    # (block k's zero tail is block k+1's data region), so the DMAs must
    # land in block order — concurrent starts would race on the overlap.
    for v in range(v_blk):
        dma = pltpu.make_async_copy(
            scratch.at[pl.ds(v * (br + 8), br), :],
            vals_hbm.at[pl.ds(vbase_ref[0, slot * v_blk + v], br), :],
            sems.at[v],
        )
        dma.start()
        dma.wait()


@partial(jax.jit, static_argnames=("p", "kr", "br", "v_blk", "unroll",
                                   "skip_empty", "algo", "interpret"))
def compact_pallas(
    symbols: jnp.ndarray,
    vbase: jnp.ndarray,
    *,
    p: int,
    kr,
    br: int = BLOCK_ROWS,
    v_blk: int | None = None,
    unroll: int = DEFAULT_TILE_UNROLL,
    skip_empty: bool = True,
    algo: str = "dot",
    interpret: bool = False,
):
    """Sparse compact: (nc, P) int32/uint8 symbols → (bitmaps, values).

    ``vbase``: (nc·nb,) absolute value row bases (:func:`value_row_bases`
    with the same ``kr``).  Returns ``(bitmaps (nc, P/8) int32 bytes,
    values (sum(kr)+nc·br, 128) int32)`` — values rows beyond each
    plane's used rows are UNSPECIFIED; mask with ``ch_rows`` before
    entropy coding (alc3 does).  ``kr`` = value capacity rows per plane
    (int, or a per-plane tuple); ``br`` = KERNEL block rows (processing
    granularity — the wire pads values per TILE_ROWS tile).

    ``algo`` picks the compaction strategy: ``"dot"`` (default) builds
    each tile's padded value rows with the one-hot register-append chain;
    ``"search"`` inverts the dataflow — every OUTPUT value lane
    binary-searches the tile's inclusive prefix for its source element,
    so work scales with value rows (density·8) instead of pixel rows.
    Measured on v5e at q=90 density the searches' 10 dependent gather
    rounds lose to the dot chain (294 vs 656 Msym/s) — "dot" stays the
    default; "search" is kept for very-sparse regimes (density ≪ 1/8).
    """
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    nc = symbols.shape[0]
    krs = _norm_krs(kr, nc)
    pr, nb = block_geometry(p, br)
    bm8 = br // TILE_ROWS
    if v_blk is None:  # largest dividing factor <= DEFAULT_V_BLK
        v_blk = DEFAULT_V_BLK
        while nb % v_blk:
            v_blk //= 2
    if nb % v_blk:
        raise ValueError(f"blocks per channel ({nb}) % v_blk ({v_blk})")
    if (v_blk * br // 8) % 8:
        raise ValueError("v_blk*br/8 must be a multiple of 8 (TPU sublanes)")
    if bm8 % unroll:
        raise ValueError(f"tiles per block ({bm8}) % unroll ({unroll})")
    _, total_rows = plane_row_bases(krs, br)
    # one prepass over the symbols yields both the per-tile descriptors
    # and the per-block row totals (the whole-slot skip scalar)
    blk = TILE_ROWS * NG
    cnt = jnp.sum(
        (symbols.reshape(nc, nb * bm8, blk) != 0).astype(jnp.int32), axis=-1)
    trows = -(-cnt // NG)
    tbase = _tile_rel_bases(trows.reshape(nc, nb, bm8))
    brows = trows.reshape(nc * nb, bm8).sum(axis=-1).astype(jnp.int32)
    if algo not in ("search", "dot", "butterfly"):
        raise ValueError(f"unknown compact algo {algo!r}")
    kernel = partial(_compact_kernel, v_blk, br, unroll, skip_empty, algo)
    bm, vals = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nc * pr // 8, NG), jnp.int32),
            jax.ShapeDtypeStruct((total_rows, NG), jnp.int32),
        ),
        grid=(nc * nb // v_blk,),
        in_specs=[
            pl.BlockSpec((1, nc * nb), lambda s: (0, 0),
                         memory_space=pltpu.SMEM),
            # 3-D so the BLOCKED last-two dims equal the array dims (the
            # Mosaic SMEM block rule); the grid steps over the leading dim.
            pl.BlockSpec((1, 1, v_blk * bm8), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc * nb), lambda s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((v_blk * br, NG), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((v_blk * br // 8, NG), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((v_blk * (br + 8), NG), jnp.int32),
            pltpu.SemaphoreType.DMA((v_blk,)),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        vbase.astype(jnp.int32).reshape(1, nc * nb),
        tbase.reshape(nc * nb // v_blk, 1, v_blk * bm8),
        brows.reshape(1, nc * nb),
        symbols.astype(jnp.int32).reshape(nc * pr, NG),
    )
    return bm.reshape(nc, p // 8), vals


# ── expand (decode side) ────────────────────────────────────────


def _expand_kernel(v_blk, br, u, skip_empty,
                   vbase_ref, tbase_ref, brows_ref, bm_ref, vals_hbm,
                   sym_ref, scratch, sems):
    iota8_0, win, ltT, lt8 = _iotas()
    slot = pl.program_id(0)
    bm8 = br // TILE_ROWS

    # Whole-slot skip (see _compact_kernel): a slot whose blocks all
    # decode to zeros (empty chroma planes, flat regions) writes its
    # symbol zeros as one block store and skips the staging DMAs and
    # the per-tile loop — the per-tile iteration overhead (~300-400
    # cycles) dominates the zero tiles otherwise.
    slot_active = brows_ref[0, slot * v_blk] > 0
    for _v in range(1, v_blk):
        slot_active = jnp.logical_or(
            slot_active, brows_ref[0, slot * v_blk + _v] > 0)

    @pl.when(jnp.logical_not(slot_active))
    def _zero_slot():
        sym_ref[:, :] = jnp.zeros(sym_ref.shape, jnp.int32)

    @pl.when(slot_active)
    def _active_slot():
        _expand_slot(v_blk, br, u, skip_empty, slot, vbase_ref,
                     tbase_ref, bm_ref, vals_hbm, sym_ref, scratch,
                     sems, iota8_0, win, ltT, lt8, bm8)


def _expand_slot(v_blk, br, u, skip_empty, slot, vbase_ref, tbase_ref,
                 bm_ref, vals_hbm, sym_ref, scratch, sems,
                 iota8_0, win, ltT, lt8, bm8):
    # stage each block's value window first (reads may overlap freely; the
    # DMAs run while the first tiles' bitmap work proceeds).  Tile window
    # reads stay within the staged br rows: a tile's base is the sum of
    # at most 63 preceding 8-row ceils (≤ 504), so [cur, cur+8) ≤ br.
    for v in range(v_blk):
        base = vbase_ref[0, slot * v_blk + v]
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(base, br), :],
            scratch.at[pl.ds(v * (br + 8), br), :],
            sems.at[v],
        ).start()

    for v in range(v_blk):
        pltpu.make_async_copy(
            vals_hbm.at[pl.ds(vbase_ref[0, slot * v_blk + v], br), :],
            scratch.at[pl.ds(v * (br + 8), br), :],
            sems.at[v],
        ).wait()

    iota128_0, lane = win

    def one(v, g):
        # per-tile descriptor from the SMEM prepass
        # (tile_row_bases_from_bitmaps): value-row offset within the
        # block (low 16 bits), ceil row count (high bits).  All control
        # scalars are SMEM-side — no vector reduction crosses to sregs.
        packed = tbase_ref[0, 0, v * bm8 + g]
        cur = packed & 0xFFFF
        trows = packed >> 16
        byte = bm_ref[pl.ds(v * bm8 + g, 1), :]                # (1,NG)
        bits = (byte >> iota8_0) & 1                           # (8,NG)

        # branch-free mode: see _compact_kernel — an empty tile's masked
        # gather writes exactly the zero rows, so unconditional execution
        # is correct and keeps the tile bodies schedulable as one block.
        def _zeros():
            sym_ref[pl.ds(v * br + TILE_ROWS * g, 8), :] = jnp.zeros(
                (8, NG), jnp.int32)

        def _gather():
            rank, off = _row_ranks(bits, ltT, lt8)
            # the tile's value rows are one aligned (8,128) window; each
            # pixel row is a 2-D dynamic gather at tile-local positions
            # off_j + rank — no serial chain, the 8 gathers and the
            # v_blk block chains all overlap.  off stays vector-side
            # ((8,1) broadcast), never a scalar extract.  The 8 decoded
            # rows accumulate in registers and land as ONE aligned
            # (8,128) store (round 3 issued 8 separate row stores, which
            # Mosaic orders conservatively against each other).
            win8 = scratch[pl.ds(v * (br + 8) + cur, 8), :]
            rows_out = []
            for j in range(8):
                mask = bits[j : j + 1, :] == 1
                pj = jnp.where(mask, off[j : j + 1, :1]
                               + rank[j : j + 1, :], 0)
                out = _gather2d(win8, pj >> 7, pj & (NG - 1))
                rows_out.append(jnp.where(mask, out, 0))
            sym_ref[pl.ds(v * br + TILE_ROWS * g, 8), :] = (
                jnp.concatenate(rows_out, axis=0))

        if skip_empty:
            pl.when(trows == 0)(_zeros)
            pl.when(trows > 0)(_gather)
        else:
            _gather()

    def tile(g, _):
        # u tiles × v_blk blocks per step, all independent dataflow (the
        # same V-batching as rans3_kernels, multiplied by the unroll).
        for k in range(u):
            for v in range(v_blk):
                one(v, g * u + k)
        return 0

    jax.lax.fori_loop(0, bm8 // u, tile, jnp.int32(0))


@partial(jax.jit, static_argnames=("p", "kr", "br", "v_blk", "unroll",
                                   "skip_empty", "interpret"))
def expand_pallas(
    bitmaps: jnp.ndarray,
    values: jnp.ndarray,
    vbase: jnp.ndarray,
    *,
    p: int,
    kr,
    br: int = BLOCK_ROWS,
    v_blk: int | None = None,
    unroll: int = DEFAULT_TILE_UNROLL,
    skip_empty: bool = True,
    interpret: bool = False,
):
    """Sparse expand: (bitmaps (nc, P/8), values (sum(kr)+nc·br, 128)) →
    (nc, P) int32 symbols.  Inverse of :func:`compact_pallas` (values rows
    between a plane's used rows and its capacity must be zero — they are
    after entropy decode, which codes the explicit zero padding)."""
    if not interpret and jax.default_backend() == "cpu":
        interpret = True
    nc = bitmaps.shape[0]
    krs = _norm_krs(kr, nc)
    pr, nb = block_geometry(p, br)
    bm8 = br // TILE_ROWS
    if v_blk is None:  # largest dividing factor <= DEFAULT_V_BLK
        v_blk = DEFAULT_V_BLK
        while nb % v_blk:
            v_blk //= 2
    if nb % v_blk:
        raise ValueError(f"blocks per channel ({nb}) % v_blk ({v_blk})")
    if (v_blk * br // 8) % 8:
        raise ValueError("v_blk*br/8 must be a multiple of 8 (TPU sublanes)")
    if bm8 % unroll:
        raise ValueError(f"tiles per block ({bm8}) % unroll ({unroll})")
    _, total_rows = plane_row_bases(krs, br)
    if values.shape != (total_rows, NG):
        raise ValueError(
            f"values shape {values.shape} != {(total_rows, NG)}")
    # one prepass over the bitmaps yields both the per-tile descriptors
    # and the per-block row totals (the whole-slot skip scalar)
    counts = jax.lax.population_count(
        bitmaps.astype(jnp.uint8).reshape(nc, nb * bm8, NG)
    ).astype(jnp.int32).sum(axis=-1)
    trows = -(-counts // NG)
    tbase = _tile_rel_bases(trows.reshape(nc, nb, bm8))
    brows = trows.reshape(nc * nb, bm8).sum(axis=-1).astype(jnp.int32)
    kernel = partial(_expand_kernel, v_blk, br, unroll, skip_empty)
    sym = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nc * pr, NG), jnp.int32),
        grid=(nc * nb // v_blk,),
        in_specs=[
            pl.BlockSpec((1, nc * nb), lambda s: (0, 0),
                         memory_space=pltpu.SMEM),
            # 3-D so the BLOCKED last-two dims equal the array dims (the
            # Mosaic SMEM block rule); the grid steps over the leading dim.
            pl.BlockSpec((1, 1, v_blk * bm8), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nc * nb), lambda s: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((v_blk * br // 8, NG), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((v_blk * br, NG), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((v_blk * (br + 8), NG), jnp.int32),
            pltpu.SemaphoreType.DMA((v_blk,)),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        vbase.astype(jnp.int32).reshape(1, nc * nb),
        tbase.reshape(nc * nb // v_blk, 1, v_blk * bm8),
        brows.reshape(1, nc * nb),
        bitmaps.astype(jnp.int32).reshape(nc * pr // 8, NG),
        values.astype(jnp.int32),
    )
    return sym.reshape(nc, p)
