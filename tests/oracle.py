"""NumPy oracle: a direct transliteration of the reference Rust arithmetic.

Used only by tests, as the ground truth for bit-exactness checks — the same
oracle pattern the reference uses for FastQuantizer vs Quantizer
(reference: src/quant.rs:848-864).  Deliberately slow and literal; every
function mirrors the cited Rust lines operation-for-operation, including
integer widths, truncations and wraps.
"""

from __future__ import annotations

import numpy as np

# ── color.rs ────────────────────────────────────────────────────


def rgb_to_ycocg_pixel(r: int, g: int, b: int) -> tuple[int, int, int]:
    """src/color.rs:75-86 (i16 arithmetic)."""
    r, g, b = np.int16(r), np.int16(g), np.int16(b)
    co = np.int16(r - b)
    t = np.int16(b + (co >> 1))
    cg = np.int16(g - t)
    y = np.int16(t + (cg >> 1))
    return int(y), int(co), int(cg)


def ycocg_to_rgb_pixel(y: int, co: int, cg: int) -> tuple[int, int, int]:
    """src/color.rs:100-112 (i16 arithmetic, clamp to [0,255])."""
    y, co, cg = np.int16(y), np.int16(co), np.int16(cg)
    t = np.int16(y - (cg >> 1))
    g = np.int16(cg + t)
    b = np.int16(t - (co >> 1))
    r = np.int16(co + b)
    clamp = lambda v: int(min(max(int(v), 0), 255))
    return clamp(r), clamp(g), clamp(b)


# ── wavelet.rs ──────────────────────────────────────────────────

LIFT_COEFFS = {
    "cdf97": [(-6497, True), (-217, False), (3616, True), (1817, False)],
    "haar": [(-4096, True), (2048, False)],
    "cdf53": [(-4096, True), (1024, False)],
}


def _lift_predict(signal: list[int], coeff: int) -> None:
    """src/wavelet.rs:180-197."""
    n = len(signal)
    for i in range(n // 2):
        even_left = signal[i * 2]
        even_right = signal[i * 2 + 2] if i * 2 + 2 < n else signal[i * 2]
        avg = even_left + even_right
        delta = (avg * coeff + 4096) >> 13  # Python ints == i64 here
        signal[i * 2 + 1] += delta


def _lift_update(signal: list[int], coeff: int) -> None:
    """src/wavelet.rs:201-217."""
    n = len(signal)
    for i in range(n // 2):
        odd_left = signal[i * 2 - 1] if i > 0 else signal[1]
        odd_right = signal[i * 2 + 1]
        avg = odd_left + odd_right
        delta = (avg * coeff + 4096) >> 13
        signal[i * 2] += delta


def wavelet_forward_1d(signal: np.ndarray, kind: str) -> np.ndarray:
    """src/wavelet.rs:133-152."""
    sig = [int(v) for v in signal]
    n = len(sig)
    if n < 2:
        return np.array(sig, np.int32)
    for coeff, predict in LIFT_COEFFS[kind]:
        (_lift_predict if predict else _lift_update)(sig, coeff)
    half = n // 2
    temp = [0] * n
    for i in range(half):
        temp[i] = sig[i * 2]
        temp[half + i] = sig[i * 2 + 1]
    return np.array(temp, np.int32)


def wavelet_inverse_1d(signal: np.ndarray, kind: str) -> np.ndarray:
    """src/wavelet.rs:157-176 (negated-coefficient replay)."""
    sig_in = [int(v) for v in signal]
    n = len(sig_in)
    if n < 2:
        return np.array(sig_in, np.int32)
    half = n // 2
    sig = [0] * n
    for i in range(half):
        sig[i * 2] = sig_in[i]
        sig[i * 2 + 1] = sig_in[half + i]
    for coeff, predict in reversed(LIFT_COEFFS[kind]):
        (_lift_predict if predict else _lift_update)(sig, -coeff)
    return np.array(sig, np.int32)


def wavelet_forward_3d(volume: np.ndarray, kind: str) -> np.ndarray:
    """src/wavelet.rs:392-438: per-frame rows, columns, then temporal."""
    vol = np.array(volume, np.int32)
    depth, height, width = vol.shape
    for t in range(depth):
        for y in range(height):
            vol[t, y, :] = wavelet_forward_1d(vol[t, y, :], kind)
        for x in range(width):
            vol[t, :, x] = wavelet_forward_1d(vol[t, :, x], kind)
    for y in range(height):
        for x in range(width):
            vol[:, y, x] = wavelet_forward_1d(vol[:, y, x], kind)
    return vol


def wavelet_inverse_3d(volume: np.ndarray, kind: str) -> np.ndarray:
    """src/wavelet.rs:441-484: temporal, then columns, then rows."""
    vol = np.array(volume, np.int32)
    depth, height, width = vol.shape
    for y in range(height):
        for x in range(width):
            vol[:, y, x] = wavelet_inverse_1d(vol[:, y, x], kind)
    for t in range(depth):
        for x in range(width):
            vol[t, :, x] = wavelet_inverse_1d(vol[t, :, x], kind)
        for y in range(height):
            vol[t, y, :] = wavelet_inverse_1d(vol[t, y, :], kind)
    return vol


# ── quant.rs ────────────────────────────────────────────────────


def quantize(value: int, step: int, dead_zone: int) -> int:
    """src/quant.rs:89-97 (Rust / truncates toward zero)."""
    if abs(value) < dead_zone:
        return 0
    if value >= 0:
        return _trunc_div(value - _trunc_div(dead_zone, 2), step)
    return _trunc_div(value + _trunc_div(dead_zone, 2), step)


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def fast_quantize(value: int, step: int, dead_zone: int) -> int:
    """src/quant.rs:190-264: literal magic-number path."""
    step_u = step & 0xFFFFFFFF
    extra_bits = 32 - _leading_zeros_u32(step_u)
    shift = 32 + extra_bits
    power = 1 << shift
    reciprocal = -(-power // step_u)  # ceil
    abs_val = abs(value)
    if abs_val < dead_zone:
        return 0
    offset = dead_zone >> 1
    adjusted = (abs_val - offset) & 0xFFFFFFFF
    q_abs = ((adjusted * reciprocal) >> shift) & 0xFFFFFFFF
    if q_abs >= 1 << 31:  # `as i32` wrap
        q_abs -= 1 << 32
    return -q_abs if value < 0 else q_abs


def _leading_zeros_u32(v: int) -> int:
    return 32 - v.bit_length() if v else 32


def to_symbols(coeffs: np.ndarray) -> np.ndarray:
    """src/quant.rs:547-563 (u8 wrap via `as u8`)."""
    out = np.zeros(len(coeffs), np.uint8)
    for i, c in enumerate(np.asarray(coeffs, np.int64)):
        if c == 0:
            out[i] = 0
        elif c > 0:
            out[i] = (c * 2 - 1) & 0xFF
        else:
            out[i] = (-c * 2) & 0xFF
    return out


def from_symbols(symbols: np.ndarray) -> np.ndarray:
    """src/quant.rs:572-590."""
    out = np.zeros(len(symbols), np.int32)
    for i, s in enumerate(np.asarray(symbols, np.int64)):
        if s == 0:
            out[i] = 0
        elif s % 2 == 1:
            out[i] = (s + 1) // 2
        else:
            out[i] = -(s // 2)
    return out


# ── rans.rs ─────────────────────────────────────────────────────

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS32_L = 1 << 23


def freq_table_from_histogram(histogram: np.ndarray):
    """src/rans.rs:102-150 → (freq[256], cum[256], cum_to_sym[4096])."""
    hist = np.asarray(histogram, np.uint64)
    n_symbols = len(hist)
    total = int(hist.sum())
    if total == 0:
        return freq_table_uniform(n_symbols)
    freqs, cums = [], []
    cum_freq = 0
    normalized_total = 0
    for count in hist:
        count = int(count)
        if count == 0:
            freq = 1
        else:
            freq = max((count * PROB_SCALE) // total, 1)
        normalized_total += freq
        cums.append(cum_freq & 0xFFFF)
        freqs.append(freq & 0xFFFF)
        cum_freq += freq
    if freqs and normalized_total != PROB_SCALE:
        diff = PROB_SCALE - normalized_total
        freqs[-1] = (freqs[-1] + diff) & 0xFFFF
    cum_to_sym = np.zeros(PROB_SCALE, np.uint8)
    for sym in range(n_symbols):
        start = cums[sym]
        end = min(start + freqs[sym], PROB_SCALE)
        if start < end:
            cum_to_sym[start:end] = sym & 0xFF
    return (np.array(freqs, np.uint16), np.array(cums, np.uint16), cum_to_sym)


def freq_table_uniform(n_symbols: int):
    """src/rans.rs:158-189."""
    freq_per_symbol = PROB_SCALE // n_symbols
    freqs = [freq_per_symbol] * n_symbols
    cums = [(i * freq_per_symbol) & 0xFFFF for i in range(n_symbols)]
    if freqs:
        freqs[-1] = (PROB_SCALE - cums[-1]) & 0xFFFF
    cum_to_sym = np.zeros(PROB_SCALE, np.uint8)
    for sym in range(n_symbols):
        start = cums[sym]
        end = min(start + freqs[sym], PROB_SCALE)
        if start < end:
            cum_to_sym[start:end] = sym & 0xFF
    return (np.array(freqs, np.uint16), np.array(cums, np.uint16), cum_to_sym)


def rans_encode(symbols: np.ndarray, freqs: np.ndarray, cums: np.ndarray) -> bytes:
    """src/rans.rs:246-308: encode in reverse, flush 4 bytes, reverse output."""
    state = RANS32_L
    out = bytearray()
    for sym in np.asarray(symbols, np.uint8)[::-1]:
        freq = int(freqs[sym])
        cum = int(cums[sym])
        x_max = ((RANS32_L >> PROB_BITS) << 8) * freq
        while state >= x_max:
            out.append(state & 0xFF)
            state >>= 8
        state = ((state // freq) << PROB_BITS) + (state % freq) + cum
    for shift in (0, 8, 16, 24):
        out.append((state >> shift) & 0xFF)
    out.reverse()
    return bytes(out)


def rans_decode(data: bytes, n: int, freqs, cums, cum_to_sym) -> np.ndarray:
    """src/rans.rs:327-381."""
    state = 0
    pos = 0
    if len(data) >= 4:
        state = int.from_bytes(data[0:4], "big")
        pos = 4
    out = np.zeros(n, np.uint8)
    for i in range(n):
        slot = state & (PROB_SCALE - 1)
        sym = int(cum_to_sym[slot])
        freq = int(freqs[sym])
        cum = int(cums[sym])
        state = (freq * (state >> PROB_BITS) + slot - cum) & 0xFFFFFFFF
        while state < RANS32_L and pos < len(data):
            state = ((state << 8) | data[pos]) & 0xFFFFFFFF
            pos += 1
        out[i] = sym
    return out
