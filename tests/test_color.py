"""Color transform parity + roundtrip tests (reference: src/color.rs tests)."""

import numpy as np
import pytest

from alice_codec_tpu.ops import color

import oracle


def _roundtrip(rgb_u8: np.ndarray) -> np.ndarray:
    y, co, cg = color.rgb_to_ycocg_r(rgb_u8)
    return np.asarray(color.ycocg_r_to_rgb(y, co, cg))


def test_roundtrip_corner_cases():
    cases = np.array(
        [
            [0, 0, 0],
            [255, 255, 255],
            [255, 0, 0],
            [0, 255, 0],
            [0, 0, 255],
            [128, 128, 128],
            [100, 150, 200],
        ],
        np.uint8,
    )
    assert np.array_equal(_roundtrip(cases), cases)


def test_roundtrip_full_cube():
    """Exhaustive 256^3 roundtrip — vectorized, unlike the reference's 17-step sweep."""
    v = np.arange(256, dtype=np.uint8)
    r, g, b = np.meshgrid(v, v, v, indexing="ij")
    rgb = np.stack([r, g, b], axis=-1).reshape(-1, 3)
    assert np.array_equal(_roundtrip(rgb), rgb)


def test_forward_matches_oracle():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(512, 3), dtype=np.uint8)
    y, co, cg = color.rgb_to_ycocg_r(rgb)
    y, co, cg = np.asarray(y), np.asarray(co), np.asarray(cg)
    for i in range(len(rgb)):
        oy, oco, ocg = oracle.rgb_to_ycocg_pixel(*rgb[i])
        assert (y[i], co[i], cg[i]) == (oy, oco, ocg)


def test_inverse_matches_oracle_with_quantization_noise():
    """Decode-side inputs are perturbed by quantization; clamp must match."""
    rng = np.random.default_rng(1)
    y = rng.integers(-300, 600, size=1000).astype(np.int16)
    co = rng.integers(-600, 600, size=1000).astype(np.int16)
    cg = rng.integers(-600, 600, size=1000).astype(np.int16)
    rgb = np.asarray(color.ycocg_r_to_rgb(y, co, cg))
    for i in range(len(y)):
        assert tuple(rgb[i]) == oracle.ycocg_to_rgb_pixel(y[i], co[i], cg[i])


def test_grayscale_decorrelation():
    v = np.arange(0, 256, 5, dtype=np.uint8)
    rgb = np.stack([v, v, v], axis=-1)
    y, co, cg = color.rgb_to_ycocg_r(rgb)
    assert np.array_equal(np.asarray(y), v.astype(np.int16))
    assert not np.asarray(co).any()
    assert not np.asarray(cg).any()


def test_dtypes():
    rgb = np.zeros((4, 3), np.uint8)
    y, co, cg = color.rgb_to_ycocg_r(rgb)
    assert y.dtype == np.int16
    out = color.ycocg_r_to_rgb(y, co, cg)
    assert out.dtype == np.uint8
    raw = color.ycocg_r_to_rgb(y, co, cg, clamp=False)
    assert raw.dtype == np.int16
