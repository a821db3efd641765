"""TPU-device interleaved rANS — entropy coding without leaving HBM.

The reference's rANS is an inherently serial byte-oriented state chain
(reference: src/rans.rs), with a 4-stream AVX2 variant (src/rans.rs:393-524).
On TPU the re-architecture widens that idea to **thousands of lanes**: lane
k owns symbols k, k+N, k+2N, … of a channel; all lane states advance in
lock-step under one ``lax.scan`` over symbol index, so every step is a pure
VPU-wide vector op (gather freq/cum, compare-renormalize, state update).

Encode (LIFO, scanning the symbol stream in reverse):
  * per step each lane emits 0-2 renormalization bytes — stored as a fixed
    ``(steps, lanes)`` uint16 (two byte slots) plus a count plane;
  * a post-pass exclusive scan over counts gives per-lane byte offsets and
    the scatter that packs per-lane contiguous streams (done in one
    vectorized gather on device or host — bytes are already final).
Decode is symmetric: per-lane byte cursors advance by the per-step refill
count; refilled bytes are gathered from the packed lane streams.

Wire compatibility: each lane is a *bit-exact* reference rANS stream (same
state math, renormalization and flush), and lane framing equals the N-way
generalized container of ops/rans.py / native alc_rans_encode_nway — so
device-encoded ALC2 payloads decode on the host C++ path and vice versa.

The per-channel frequency table must be valid (``sanitize=True``); tables
live in VMEM as (256,) uint16 vectors, the decode LUT as (4096,) uint8.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "encode_device_nway",
    "decode_device_nway",
    "encode_pack_device",
    "pack_device",
    "pack_lane_streams",
]

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS32_L = 1 << 23

#: Max renorm bytes one symbol can force out of a 32-bit state with byte
#: renormalization and 12-bit probabilities: state < 2^31, threshold
#: ≥ 2^19 ⇒ at most 2 bytes per step (⌈(31-19)/8⌉ = 2).
_MAX_BYTES_PER_STEP = 2


def _mxu_table_lookup(idx: jnp.ndarray, table_f32: jnp.ndarray) -> jnp.ndarray:
    """Lookup rows of a small f32 table by index via one-hot × table matmul.

    TPU dynamic gathers from a (256,) table cost ~O(lanes) VPU time per
    step; the one-hot contraction runs on the MXU instead (table values
    ≤ 4096 are exact in f32).  ``idx``: (lanes,) int32; ``table_f32``:
    (n, k); returns (lanes, k) f32.

    HIGHEST precision is required: the TPU MXU's default f32 matmul rounds
    inputs to bfloat16 (7 mantissa bits), which corrupts table values
    > 256 and silently breaks bitstream compatibility on TPU while CPU
    results stay exact.
    """
    n = table_f32.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    onehot = (idx[:, None] == iota).astype(jnp.float32)
    return jnp.dot(onehot, table_f32, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _iota16(lanes: int) -> jnp.ndarray:
    return jax.lax.broadcasted_iota(jnp.int32, (lanes, 16), 1)


def _two_level_lookup(idx: jnp.ndarray, table2: jnp.ndarray) -> jnp.ndarray:
    """256-entry table lookup in two 16-wide stages (hi nibble selects the
    block via a 16×16k matmul, lo nibble selects within it) — 16x less
    one-hot work per step than the flat 256-wide version.

    ``idx``: (lanes,) int32 in [0, 256); ``table2``: (16, 16*k) f32, the
    (256, k) table reshaped block-row-major.  Returns (lanes, k) f32.
    """
    lanes = idx.shape[0]
    k = table2.shape[1] // 16
    i16 = _iota16(lanes)
    hi_oh = ((idx[:, None] >> 4) == i16).astype(jnp.float32)
    block = jnp.dot(hi_oh, table2, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    block = block.reshape(lanes, 16, k)
    lo_oh = ((idx[:, None] & 15) == i16).astype(jnp.float32)
    # HIGHEST here too: the contracted block holds freq/cum values up to
    # 4095, beyond the bf16-exact range the MXU's default precision rounds
    # inputs to (silent bitstream corruption on TPU; CPU tests can't see it).
    return jnp.einsum("lb,lbk->lk", lo_oh, block,
                      precision=jax.lax.Precision.HIGHEST)


def _lane_view(symbols: jnp.ndarray, n_lanes: int) -> jnp.ndarray:
    """(n,) symbols → (steps, lanes) where row j holds symbols j*N..j*N+N-1.

    Requires n % n_lanes == 0 (callers pad the symbol stream; codec symbol
    counts are padded-volume sizes, multiples of large powers of two).
    """
    n = symbols.shape[0]
    return symbols.reshape(n // n_lanes, n_lanes)


@partial(jax.jit, static_argnames=("n_lanes",))
def encode_device_nway(
    symbols: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    n_lanes: int,
):
    """Encode uint8 ``symbols`` (length divisible by n_lanes) into per-lane
    rANS byte streams, entirely on device.

    Returns ``(bytes_rev, counts, states)``:
      * ``bytes_rev``: (steps, lanes, 2) uint8 — renorm bytes emitted at
        each scan step (slot 0 first), in *emission* order;
      * ``counts``: (steps, lanes) int32 — bytes emitted per step (0-2);
      * ``states``: (lanes,) uint32 — final states (flushed by the packer).

    The scan walks the symbol rows in reverse (LIFO), matching the
    reference's encode order per lane.
    """
    sym_rows = _lane_view(symbols, n_lanes).astype(jnp.int32)
    table2 = jnp.stack(
        [freqs.astype(jnp.float32), cums.astype(jnp.float32)], axis=-1
    ).reshape(16, 32)  # (256,2) block-row-major

    def step(states, row):
        fc = _two_level_lookup(row, table2)
        f = fc[:, 0].astype(jnp.uint32)
        c = fc[:, 1].astype(jnp.uint32)
        # renormalize: emit while state >= ((L >> 12) << 8) * f.
        # threshold fits uint32: (2^11 << 8) * f <= 2^19 * 2^12 = 2^31.
        x_max = (jnp.uint32((RANS32_L >> PROB_BITS) << 8)) * f
        emit0 = states >= x_max
        b0 = (states & 0xFF).astype(jnp.uint8)
        states = jnp.where(emit0, states >> 8, states)
        emit1 = states >= x_max
        b1 = (states & 0xFF).astype(jnp.uint8)
        states = jnp.where(emit1, states >> 8, states)
        # state update: x' = (x / f) << 12 + x % f + cum
        q = states // f
        r = states - q * f
        states = (q << PROB_BITS) + r + c
        count = emit0.astype(jnp.int32) + emit1.astype(jnp.int32)
        return states, (jnp.stack([b0, b1], axis=-1), count,
                        jnp.stack([emit0, emit1], axis=-1))

    init = jnp.full((n_lanes,), RANS32_L, jnp.uint32)
    states, (bytes2, counts, emits) = jax.lax.scan(
        step, init, sym_rows, reverse=True
    )
    # mask unemitted slots to 0 for determinism
    bytes2 = jnp.where(emits, bytes2, 0)
    return bytes2, counts, states


@partial(jax.jit, static_argnames=("n_lanes", "use_pallas"))
def encode_pack_device(
    symbols: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    *,
    n_lanes: int,
    use_pallas: bool = False,
):
    """Fused device encode **and pack**: symbols → final packed payload.

    Combines :func:`encode_device_nway` with an on-device scatter that
    assembles the per-lane reference streams (renorm bytes in emission
    order + 4-byte state flush, whole lane reversed — the exact
    ``RansEncoder::finish`` layout).  Only the compressed bytes ever leave
    the device: callers fetch ``payload[:int(total)]`` (an on-device slice)
    plus the (lanes,) length vector — shrinking device→host traffic by the
    compression ratio instead of shipping raw symbols.

    Returns (payload_padded, lane_lens, total):
      * payload_padded: (2*n + 4*n_lanes,) uint8 — packed lane streams,
        front-aligned; bytes past ``total`` are zero;
      * lane_lens: (n_lanes,) int32 (includes the 4 flush bytes);
      * total: scalar int32.
    """
    if use_pallas:
        from .pallas.rans_kernel import encode_nway_pallas

        bytes2, counts, states = encode_nway_pallas(
            symbols, freqs, cums, n_lanes=n_lanes
        )
    else:
        bytes2, counts, states = encode_device_nway(
            symbols, freqs, cums, n_lanes=n_lanes
        )
    return pack_device(bytes2, counts, states, n=symbols.shape[0],
                       n_lanes=n_lanes)


@partial(jax.jit, static_argnames=("n", "n_lanes"))
def pack_device(bytes2, counts, states, *, n: int, n_lanes: int):
    """On-device stream packing (second half of :func:`encode_pack_device`):
    scan outputs → final reversed per-lane streams in one scatter."""
    cap = 2 * n + 4 * n_lanes

    # Emission order is reversed row order (the scan ran reverse=True).
    c_em = counts[::-1]                      # (steps, lanes)
    b_em = bytes2[::-1]                      # (steps, lanes, 2)
    prefix = jnp.cumsum(c_em, axis=0) - c_em  # exclusive prefix per lane
    tot = counts.sum(axis=0)                  # (lanes,) renorm bytes
    lane_lens = tot + 4
    lane_start = jnp.cumsum(lane_lens) - lane_lens  # exclusive
    total = lane_lens.sum()

    # Final position of emission byte p in lane k: start_k + len_k - 1 - p.
    flip_base = lane_start + lane_lens - 1           # (lanes,)
    dst0 = flip_base[None, :] - prefix               # slot 0 emission pos
    dst1 = dst0 - 1                                  # slot 1 follows slot 0
    emitted0 = c_em >= 1
    emitted1 = c_em >= 2
    dst0 = jnp.where(emitted0, dst0, cap)            # drop via OOB
    dst1 = jnp.where(emitted1, dst1, cap)

    payload = jnp.zeros((cap,), jnp.uint8)
    payload = payload.at[dst0.reshape(-1)].set(
        b_em[..., 0].reshape(-1), mode="drop"
    )
    payload = payload.at[dst1.reshape(-1)].set(
        b_em[..., 1].reshape(-1), mode="drop"
    )
    # State flush: emission positions tot..tot+3 → final positions 3..0.
    for b in range(4):
        payload = payload.at[lane_start + (3 - b)].set(
            ((states >> (8 * b)) & 0xFF).astype(jnp.uint8), mode="drop"
        )
    return payload, lane_lens.astype(jnp.int32), total.astype(jnp.int32)


def pack_lane_streams(bytes2, counts, emits_counts_states=None, states=None):
    """Host-side packer: turn scan outputs into per-lane reference streams.

    Per lane: concatenate emitted bytes in scan order (reverse symbol
    order), append the 4 state-flush bytes LSB-first, then reverse — the
    exact ``RansEncoder::finish`` layout (reference src/rans.rs:298-308).
    Returns (payload bytes, lane_lens uint32[lanes]).

    The gather is vectorized NumPy; a Pallas scatter version replaces it
    when the full on-device container assembly lands.
    """
    b = np.asarray(bytes2)  # (steps, lanes, 2), aligned to symbol rows
    c = np.asarray(counts)  # (steps, lanes)
    st = np.asarray(states)  # (lanes,)
    # The encode scan runs reverse=True (LIFO): emission order is the
    # reversed row order, but scan outputs stay aligned to row index —
    # flip to emission order before packing.
    b = b[::-1]
    c = c[::-1]
    steps, lanes, _ = b.shape

    lane_lens = c.sum(axis=0).astype(np.int64) + 4
    payload = np.empty(int(lane_lens.sum()), np.uint8)
    # Scan emitted rows once per lane (vectorized over steps).
    pos = 0
    for k in range(lanes):
        ck = c[:, k]
        mask0 = ck >= 1
        mask1 = ck >= 2
        # interleave slot0/slot1 in emission order per step
        n_bytes = int(ck.sum())
        lane_bytes = np.empty(n_bytes + 4, np.uint8)
        idx = np.zeros(steps, np.int64)
        np.cumsum(ck, out=idx)
        starts = idx - ck
        lane_bytes[starts[mask0]] = b[mask0, k, 0]
        lane_bytes[starts[mask1] + 1] = b[mask1, k, 1]
        x = int(st[k])
        lane_bytes[n_bytes : n_bytes + 4] = [
            x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF, (x >> 24) & 0xFF,
        ]
        lane_bytes = lane_bytes[::-1]
        payload[pos : pos + lane_bytes.size] = lane_bytes
        pos += lane_bytes.size
    return payload.tobytes(), lane_lens.astype(np.uint32)


@partial(jax.jit, static_argnames=("n_lanes", "steps", "max_lane_bytes"))
def decode_device_nway(
    lane_bytes: jnp.ndarray,
    lane_lens: jnp.ndarray,
    freqs: jnp.ndarray,
    cums: jnp.ndarray,
    cum_to_sym: jnp.ndarray,
    *,
    n_lanes: int,
    steps: int,
    max_lane_bytes: int,
):
    """Decode per-lane rANS streams on device.

    ``lane_bytes``: (lanes, max_lane_bytes) uint8 — each lane's stream,
    front-aligned; ``lane_lens``: (lanes,) int32.  Returns (steps, lanes)
    uint8 symbols in stream order (row j = symbols j*N..j*N+N-1).
    """
    # sanitized tables have strictly increasing cums (freq >= 1), so the
    # 4096-entry LUT is equivalent to counting cums <= slot; both the
    # symbol resolution and the freq/cum fetch run as MXU/VPU-wide ops
    # instead of per-lane gathers.
    cums_f32 = cums.astype(jnp.float32)
    # two-level structures: block heads (16,) and per-block (freq, cum)
    # rows (16, 32); valid tables have strictly increasing cums.
    cum_heads = cums_f32[::16]
    table2 = jnp.stack(
        [freqs.astype(jnp.float32), cums_f32], axis=-1
    ).reshape(16, 32)
    cums_blocks = cums_f32.reshape(16, 16)
    del cum_to_sym
    lens = lane_lens.astype(jnp.int32)
    lane_ids = jnp.arange(n_lanes)
    # transpose so the per-step refill gathers along the lane-contiguous
    # (minor) axis
    bytes_t = lane_bytes.T  # (maxlen, lanes)

    # initial state: first 4 big-endian bytes of each lane
    init_states = (
        (lane_bytes[:, 0].astype(jnp.uint32) << 24)
        | (lane_bytes[:, 1].astype(jnp.uint32) << 16)
        | (lane_bytes[:, 2].astype(jnp.uint32) << 8)
        | lane_bytes[:, 3].astype(jnp.uint32)
    )
    init_pos = jnp.full((n_lanes,), 4, jnp.int32)

    def step(carry, _):
        states, pos = carry
        slot = (states & (PROB_SCALE - 1)).astype(jnp.int32)
        slot_f = slot[:, None].astype(jnp.float32)
        # two-level search: block index, then position within the block
        hi = (jnp.sum(cum_heads[None, :] <= slot_f, axis=1) - 1).astype(jnp.int32)
        i16 = _iota16(slot.shape[0])
        hi_oh = (hi[:, None] == i16).astype(jnp.float32)
        cand = jnp.dot(hi_oh, cums_blocks, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
        lo = (jnp.sum(cand <= slot_f, axis=1) - 1).astype(jnp.int32)
        sym = hi * 16 + lo
        fc = _two_level_lookup(sym, table2)
        f = fc[:, 0].astype(jnp.uint32)
        c = fc[:, 1].astype(jnp.uint32)
        states = f * (states >> PROB_BITS) + slot.astype(jnp.uint32) - c
        # Byte refill while state < L.  Two iterations always suffice: the
        # updated state is ≥ f·(x>>12) ≥ 2^11, so at most ⌈(23-11)/8⌉ = 2
        # bytes are needed to re-enter [L, ∞).
        for _refill in range(2):
            need = (states < RANS32_L) & (pos < lens)
            nxt = bytes_t[jnp.minimum(pos, max_lane_bytes - 1), lane_ids]
            states = jnp.where(need, (states << 8) | nxt.astype(jnp.uint32), states)
            pos = jnp.where(need, pos + 1, pos)
        return (states, pos), sym.astype(jnp.uint8)

    (states, pos), syms = jax.lax.scan(
        step, (init_states, init_pos), None, length=steps
    )
    return syms, states, pos
