"""NumPy oracle for segmentation: transliterates src/segment.rs exactly."""

from __future__ import annotations

import numpy as np


def _dilate_separable(mask: np.ndarray, w: int, h: int, r: int) -> np.ndarray:
    """src/segment.rs:313-373 (forward+backward distance scans, H then V)."""
    temp = np.zeros(w * h, np.uint8)
    m = mask.reshape(-1)
    for y in range(h):
        off = y * w
        dist = r + 1
        for x in range(w):
            if m[off + x]:
                dist = 0
            if dist <= r:
                temp[off + x] = 1
            dist += 1
        dist = r + 1
        for x in range(w - 1, -1, -1):
            if m[off + x]:
                dist = 0
            if dist <= r:
                temp[off + x] = 1
            dist += 1
    out = np.zeros(w * h, np.uint8)
    for x in range(w):
        dist = r + 1
        for y in range(h):
            idx = y * w + x
            if temp[idx]:
                dist = 0
            if dist <= r:
                out[idx] = 1
            dist += 1
        dist = r + 1
        for y in range(h - 1, -1, -1):
            idx = y * w + x
            if temp[idx]:
                dist = 0
            if dist <= r:
                out[idx] = 1
            dist += 1
    return out.reshape(h, w)


def _erode_separable(mask: np.ndarray, w: int, h: int, r: int) -> np.ndarray:
    """src/segment.rs:378-390: erosion = ¬dilate(¬mask)."""
    inv = (mask.reshape(h, w) ^ 1).astype(np.uint8)
    return (_dilate_separable(inv, w, h, r) ^ 1).astype(np.uint8)


def _bbox(mask: np.ndarray, w: int, h: int):
    """src/segment.rs:400-441."""
    m = mask.reshape(h, w)
    fg = int(m.sum())
    if fg == 0:
        return [0, 0, 0, 0], 0
    rows = np.nonzero(m.any(axis=1))[0]
    cols = np.nonzero(m.any(axis=0))[0]
    min_y, max_y = int(rows[0]), int(rows[-1])
    min_x, max_x = int(cols[0]), int(cols[-1])
    return [min_x, min_y, max_x - min_x + 1, max_y - min_y + 1], fg


def segment_by_motion(cur, ref, threshold, dilate_r, erode_r):
    """src/segment.rs:172-222."""
    cur = np.asarray(cur, np.uint8)
    ref = np.asarray(ref, np.uint8)
    h, w = cur.shape
    diff = np.abs(cur.astype(np.int16) - ref.astype(np.int16))
    mask = (diff > threshold).astype(np.uint8)
    if dilate_r > 0:
        mask = _dilate_separable(mask, w, h, dilate_r)
    if erode_r > 0:
        mask = _erode_separable(mask, w, h, erode_r)
    bbox, fg = _bbox(mask, w, h)
    return mask.reshape(h, w), bbox, fg
