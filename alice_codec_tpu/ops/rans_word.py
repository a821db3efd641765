"""ALC3 word-rANS: the TPU-native entropy wire format (executable spec).

The round-1 device entropy coders kept the reference's byte-oriented
per-lane streams (reference src/rans.rs:238-389), which forces the decoder
to track one byte cursor PER LANE — on TPU that refill becomes a gather
(or an O(stream) masked reduction) per symbol step and dominates decode
time.  ALC3 re-blocks the wire so the whole lane group shares ONE cursor:

* **16-bit renormalization** ("word rANS"): 32-bit state, interval
  [2^16, 2^32), emitting/consuming one uint16 at a time.  Each decode step
  refills each lane with AT MOST ONE u16 (vs 0-2 bytes for the byte
  variant), and the emit test is branch-free: ``emit ⇔ (x >> 20) >= freq``.
* **Decode-order interleave**: the stream stores, for decode step j, the
  u16s consumed at step j by the refilling lanes in ascending lane order.
  The decoder's refill is then a *sequential window read* — one global
  cursor, advanced by the per-step refill count; each lane's position
  within the window is the exclusive cumsum of the refill flags (a
  vector op).  No per-lane cursors, no gathers over the whole stream.
* **Group framing**: lanes are split into groups of ``group_size``; each
  group owns an independent stream (its own cursor), so a Pallas kernel
  can process one group per grid slot with bounded VMEM.

Per-group stream layout (u16 little-endian on the wire)::

    row 0: Ng × u16   state_hi  (lane-ascending)    ─┐ decoder init:
    row 1: Ng × u16   state_lo                       ┘ x = hi<<16 | lo
    then for j = 0..S-1: the u16s decode step j consumes, lane-ascending

Lane ownership: with N total lanes (= n_groups × group_size) over a
symbol buffer of length S·N, lane k owns symbols k, k+N, k+2N, …; group g
owns lanes [g·Ng, (g+1)·Ng) — i.e. symbol row j of group g is the
contiguous slice ``symbols[j*N + g*Ng : j*N + (g+1)*Ng]``.

State math (PROB_BITS=12, same tables/histograms as `.alc`):

* encode (LIFO):  ``if (x >> 20) >= f: emit u16 = x & 0xFFFF; x >>= 16``
  then ``x = (x // f) << 12 | (x % f + cum)``;
* decode: ``slot = x & 4095; x = f·(x >> 12) + slot - cum``
  then ``if x < 2^16: x = x << 16 | next_u16``.

One refill always suffices: after the decode update ``x ≥ x_prev >> 12 ≥
2^4``, so ``x << 16 ≥ 2^20 ≥ 2^16``.  The emit threshold is evaluated as
``(x >> 20) >= f`` so that f = 4096 (a single-symbol table) cannot
overflow the 32-bit product ``f << 20``.

This module is the NumPy reference implementation (the "spec"); the
Pallas kernels in ops/pallas/rans3_kernels.py and the XLA glue in
ops/rans3_device.py must match it u16-for-u16.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "WORD_L",
    "PROB_BITS",
    "PROB_SCALE",
    "encode_group_words",
    "decode_group_words",
    "encode_channel_words",
    "decode_channel_words",
]

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
#: Lower bound of the normalized state interval for the 16-bit-renorm coder.
WORD_L = 1 << 16


def encode_group_words(sym_rows: np.ndarray, freqs, cums) -> np.ndarray:
    """Encode one lane group.  ``sym_rows``: (S, Ng) uint8 symbol rows
    (row j = the group's symbols at decode step j).  Returns the group's
    u16 stream in decode order (2 state rows + per-step refill words)."""
    sym_rows = np.asarray(sym_rows, np.uint8)
    s_steps, ng = sym_rows.shape
    freqs = np.asarray(freqs).astype(np.uint32)
    cums = np.asarray(cums).astype(np.uint32)

    x = np.full(ng, WORD_L, np.uint32)
    step_words: list[np.ndarray] = [None] * s_steps  # type: ignore[list-item]
    for j in range(s_steps - 1, -1, -1):
        s = sym_rows[j]
        f = freqs[s]
        c = cums[s]
        emit = (x >> 20) >= f
        # decode step j consumes these, ascending lane order
        step_words[j] = (x[emit] & 0xFFFF).astype(np.uint16)
        x = np.where(emit, x >> 16, x)
        x = ((x // f) << PROB_BITS) + (x % f) + c
    head = np.concatenate([x >> 16, x & 0xFFFF]).astype(np.uint16)
    return np.concatenate([head] + step_words)


def decode_group_words(
    stream: np.ndarray, n_steps: int, ng: int, freqs, cums, cum_to_sym
) -> tuple[np.ndarray, int]:
    """Decode one group stream.  Returns ``(symbols (S, Ng) uint8,
    words_consumed)``.  A valid stream ends with every lane back at
    ``WORD_L`` and ``words_consumed == len(meaningful stream)`` — the
    final-state invariant callers may verify."""
    stream = np.asarray(stream, np.uint16)
    freqs = np.asarray(freqs).astype(np.uint32)
    cums = np.asarray(cums).astype(np.uint32)
    lut = np.asarray(cum_to_sym, np.uint8)

    x = (stream[:ng].astype(np.uint32) << 16) | stream[ng : 2 * ng]
    pos = 2 * ng
    out = np.empty((n_steps, ng), np.uint8)
    for j in range(n_steps):
        slot = x & (PROB_SCALE - 1)
        sym = lut[slot]
        out[j] = sym
        f = freqs[sym]
        c = cums[sym]
        x = f * (x >> PROB_BITS) + slot - c
        need = x < WORD_L
        k = int(need.sum())
        refill = stream[pos : pos + k].astype(np.uint32)
        x[need] = (x[need] << 16) | refill
        pos += k
    return out, pos


def _group_rows(symbols: np.ndarray, n_lanes: int, group_size: int) -> np.ndarray:
    """(S·N,) symbols → (G, S, Ng) per-group symbol rows."""
    n = symbols.shape[0]
    s_steps = n // n_lanes
    rows = symbols.reshape(s_steps, n_lanes // group_size, group_size)
    return rows.transpose(1, 0, 2)


def encode_channel_words(
    symbols: np.ndarray, freqs, cums, *, n_lanes: int, group_size: int
) -> tuple[bytes, np.ndarray]:
    """Encode a channel's symbols (length divisible by ``n_lanes``) into the
    ALC3 payload: per-group streams, each padded with zero u16s to a
    multiple of ``group_size``, concatenated in group order.

    Returns ``(payload_bytes, word_counts)`` where ``word_counts[g]`` is the
    number of meaningful u16s in group g's stream (states included,
    padding excluded).
    """
    if n_lanes % group_size:
        raise ValueError(f"n_lanes {n_lanes} not a multiple of group {group_size}")
    groups = _group_rows(np.asarray(symbols, np.uint8), n_lanes, group_size)
    counts = np.empty(groups.shape[0], np.uint32)
    parts = []
    for g in range(groups.shape[0]):
        stream = encode_group_words(groups[g], freqs, cums)
        counts[g] = stream.shape[0]
        pad = (-stream.shape[0]) % group_size
        if pad:
            stream = np.concatenate([stream, np.zeros(pad, np.uint16)])
        parts.append(stream)
    payload = np.concatenate(parts) if parts else np.empty(0, np.uint16)
    return payload.astype("<u2").tobytes(), counts


def decode_channel_words(
    payload: bytes | np.ndarray,
    word_counts: np.ndarray,
    n_symbols: int,
    *,
    n_lanes: int,
    group_size: int,
    freqs,
    cums,
    cum_to_sym,
    validate: bool = False,
) -> np.ndarray:
    """Inverse of :func:`encode_channel_words`; returns (n_symbols,) uint8."""
    data = np.frombuffer(bytes(payload), "<u2") if isinstance(
        payload, (bytes, bytearray)
    ) else np.asarray(payload, np.uint16)
    n_groups = n_lanes // group_size
    s_steps = n_symbols // n_lanes
    out = np.empty((s_steps, n_groups, group_size), np.uint8)
    off = 0
    for g in range(n_groups):
        count = int(word_counts[g])
        padded = count + (-count) % group_size
        syms, consumed = decode_group_words(
            data[off : off + count], s_steps, group_size, freqs, cums, cum_to_sym
        )
        if validate and consumed != count:
            raise ValueError(
                f"group {g}: consumed {consumed} of {count} words — corrupt stream"
            )
        out[:, g, :] = syms
        off += padded
    return out.reshape(-1)
