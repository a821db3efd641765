"""NumPy executable spec of the ALC3 v5 sparse plane layout.

The Pallas kernels in ops/pallas/sparse_kernels.py must match this
word-for-word (the same spec/kernel split as ops/rans_word.py vs
rans3_kernels.py).  See sparse_kernels.py for the layout rationale.

Layout summary for a channel of P symbols (P % 1024 == 0):

* pixel rows: the (P,) symbol stream viewed as (Pr, 128), Pr = P/128;
* bitmap: (Pr/8, 128) bytes, byte (r', l) bit j = ``symbols[(8r'+j)·128+l]
  != 0``; the bitmap PLANE (entropy-coded) is this array flattened
  row-major → (P/8,) uint8;
* values: TILES of TILE_ROWS = 8 pixel rows (one bitmap byte-row); tile
  k's nonzero symbols in pixel (row-major) order, zero-padded to a
  multiple of 128; tiles concatenated, tail zero-padded to ``kcap``.

Wire v4 padded values per 512-pixel-row BLOCK instead; the 8-row tile
granularity (v5) is what lets the kernels build/read every tile's value
rows as ONE aligned register block (sparse_kernels.py docstring).
"""

from __future__ import annotations

import numpy as np

from .pallas.sparse_kernels import TILE_ROWS

__all__ = ["pack_bitmap", "unpack_bitmap", "compact_values",
           "expand_values", "value_rows_needed"]


def pack_bitmap(symbols: np.ndarray) -> np.ndarray:
    """(..., P) symbols → (..., P/8) uint8 packed bitmap."""
    s = np.asarray(symbols)
    p = s.shape[-1]
    bits = (s != 0).astype(np.uint8).reshape(*s.shape[:-1], p // 1024, 8, 128)
    byte = np.zeros((*s.shape[:-1], p // 1024, 128), np.uint8)
    for j in range(8):
        byte |= bits[..., j, :] << j
    return byte.reshape(*s.shape[:-1], p // 8)


def unpack_bitmap(bitmap: np.ndarray) -> np.ndarray:
    """(..., P/8) uint8 → (..., P) uint8 significance bits."""
    b = np.asarray(bitmap, np.uint8)
    p8 = b.shape[-1]
    byte = b.reshape(*b.shape[:-1], p8 // 128, 1, 128)
    shifts = np.arange(8, dtype=np.uint8).reshape(1, 8, 1)
    bits = (byte >> shifts) & 1
    return bits.reshape(*b.shape[:-1], p8 * 8)


def value_rows_needed(symbols: np.ndarray, br: int = TILE_ROWS) -> int:
    """Value rows (128-lane) for one channel under tile-major padding
    (``br``: padding granularity in pixel rows — TILE_ROWS on the wire)."""
    s = np.asarray(symbols).reshape(-1)
    blocks = s.reshape(-1, br * 128)
    cnt = (blocks != 0).sum(axis=1)
    return int((-(-cnt // 128)).sum())


def compact_values(symbols: np.ndarray, kcap: int,
                   br: int = TILE_ROWS) -> np.ndarray:
    """One channel's (P,) symbols → (kcap,) tile-major padded values."""
    s = np.asarray(symbols).reshape(-1)
    out = np.zeros(kcap, s.dtype)
    off = 0
    for blk in s.reshape(-1, br * 128):
        nz = blk[blk != 0]
        out[off : off + nz.size] = nz
        off += -(-nz.size // 128) * 128
    assert off <= kcap, "kcap smaller than padded value rows"
    return out


def expand_values(bitmap: np.ndarray, values: np.ndarray,
                  br: int = TILE_ROWS) -> np.ndarray:
    """Inverse of (pack_bitmap, compact_values) for one channel."""
    bits = unpack_bitmap(bitmap).astype(bool)
    p = bits.shape[-1]
    vals = np.asarray(values).reshape(-1)
    out = np.zeros(p, vals.dtype)
    off = 0
    for k in range(p // (br * 128)):
        sl = slice(k * br * 128, (k + 1) * br * 128)
        b = bits[sl]
        n = int(b.sum())
        out[sl][b] = vals[off : off + n]
        off += -(-n // 128) * 128
    return out
