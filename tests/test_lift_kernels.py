"""Parity tests: Pallas fused 3D lifting kernels vs the XLA interleaved
transform (which is itself oracle-verified against the reference lifting
arithmetic in test_wavelet.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from alice_codec_tpu.core import WaveletType
from alice_codec_tpu.ops import wavelet
from alice_codec_tpu.ops.pallas.lift_kernels import (
    forward_3d_pallas, inverse_3d_pallas, lift3d_ok)

WAVELETS = [WaveletType.HAAR, WaveletType.CDF53, WaveletType.CDF97]
SHAPES = [(2, 4, 6, 8), (1, 8, 10, 128), (3, 2, 2, 2), (2, 6, 8, 130)]


def _vol(shape, seed=0, bound=4000, dtype=np.int32):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(-bound, bound, size=shape, dtype=np.int32)
    ).astype(dtype)


@pytest.mark.parametrize("wt", WAVELETS)
@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_xla(wt, shape):
    x = _vol(shape)
    want = jnp.stack([wavelet.forward_3d_inter(c, wt) for c in x])
    got = forward_3d_pallas(x, wt)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("wt", WAVELETS)
@pytest.mark.parametrize("exact", [False, True])
def test_inverse_matches_xla(wt, exact):
    shape = (2, 4, 6, 128)
    coeffs = forward_3d_pallas(_vol(shape, 1), wt)
    want = jnp.stack([
        wavelet.inverse_3d_inter(c, wt, exact=exact) for c in coeffs])
    got = inverse_3d_pallas(coeffs, wt, exact=exact)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("wt", WAVELETS)
def test_exact_roundtrip(wt):
    x = _vol((1, 4, 8, 130), 2)
    back = inverse_3d_pallas(forward_3d_pallas(x, wt), wt, exact=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("wt", WAVELETS)
def test_forward_quant_fused_matches_unfused(wt):
    from alice_codec_tpu.ops import quant
    from alice_codec_tpu.ops.pallas.lift_kernels import forward_quant_pallas

    x = _vol((3, 4, 6, 128), 3)
    step = jnp.asarray([3, 5, 7], jnp.int32)
    dz = jnp.asarray([3, 5, 7], jnp.int32)
    coeffs = forward_3d_pallas(x, wt)
    want = quant.to_symbols(
        quant.quantize(coeffs, step.reshape(3, 1, 1, 1),
                       dz.reshape(3, 1, 1, 1)))
    got = forward_quant_pallas(x, wt, step, dz)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("exact", [False, True])
def test_inverse_dequant_fused_matches_unfused(exact):
    from alice_codec_tpu.ops import quant
    from alice_codec_tpu.ops.pallas.lift_kernels import (
        forward_quant_pallas, inverse_dequant_pallas)

    wt = WaveletType.CDF53
    # video-bounded input: the default work_dtype=i16 decode path is
    # specified only for coefficients of 8-bit video (|x| ≤ 256)
    x = _vol((3, 4, 6, 128), 4, bound=256)
    step = jnp.asarray([2, 4, 6], jnp.int32)
    sym = forward_quant_pallas(x, wt, step, step)
    coeffs = quant.from_symbols(sym).astype(jnp.int32) * step.reshape(
        3, 1, 1, 1)
    want = inverse_3d_pallas(coeffs, wt, exact=exact)
    got = inverse_dequant_pallas(sym, wt, step, exact=exact)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


# ── int16 coefficient storage (round 4) ─────────────────────────


@pytest.mark.parametrize("wt", WAVELETS)
@pytest.mark.parametrize("shape", SHAPES)
def test_i16_forward_matches_i32(wt, shape):
    """i16 storage is bit-identical to the i32 form for video-bounded
    input (lift_kernels docstring bounds)."""
    x = _vol(shape, 5, bound=256)
    want = forward_3d_pallas(x, wt)
    got = forward_3d_pallas(x.astype(jnp.int16), wt)
    assert got.dtype == jnp.int16
    np.testing.assert_array_equal(
        np.asarray(got, dtype=np.int32), np.asarray(want))


@pytest.mark.parametrize("wt", WAVELETS)
@pytest.mark.parametrize("exact", [False, True])
def test_i16_roundtrip(wt, exact):
    x = _vol((2, 4, 6, 128), 6, bound=256, dtype=jnp.int16)
    coeffs = forward_3d_pallas(x, wt)
    want = inverse_3d_pallas(coeffs.astype(jnp.int32), wt, exact=exact)
    got = inverse_3d_pallas(coeffs, wt, exact=exact)
    np.testing.assert_array_equal(
        np.asarray(got, dtype=np.int32), np.asarray(want))
    if exact:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


@pytest.mark.parametrize("wt", WAVELETS)
def test_i16_forward_quant_matches_i32(wt):
    from alice_codec_tpu.ops.pallas.lift_kernels import forward_quant_pallas

    x = _vol((3, 4, 6, 128), 7, bound=256)
    step = jnp.asarray([3, 5, 7], jnp.int32)
    want = forward_quant_pallas(x, wt, step, step)
    got = forward_quant_pallas(x.astype(jnp.int16), wt, step, step)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_split_spatial_path_matches_fused(monkeypatch):
    """Force the banded two-pass spatial path (the >4 MP tier) on a
    small shape and check bit-equality with the fused path."""
    from alice_codec_tpu.ops.pallas import lift_kernels as lk

    wt = WaveletType.CDF53
    x = _vol((2, 4, 64, 512), 8, bound=256, dtype=jnp.int16)
    want = forward_3d_pallas(x, wt)
    winv = inverse_3d_pallas(want, wt, exact=True)
    # a 64×512 i16 frame is 64 KB; force the split tier with real
    # banding (Hb=32 → 2 row bands, Wb=256 → 2 column bands)
    monkeypatch.setattr(lk, "_FRAME_BYTES", 16 * 1024)
    monkeypatch.setattr(lk, "_TILE_BYTES", 64 * 1024)
    assert lk.lift3d_ok((2, 4, 64, 512), 2)
    forward_3d_pallas.clear_cache()
    inverse_3d_pallas.clear_cache()
    try:
        got = forward_3d_pallas(x, wt)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        ginv = inverse_3d_pallas(got, wt, exact=True)
        np.testing.assert_array_equal(np.asarray(ginv), np.asarray(winv))
    finally:
        forward_3d_pallas.clear_cache()
        inverse_3d_pallas.clear_cache()


def test_lift3d_ok_gate():
    assert lift3d_ok((3, 64, 1080, 1920))
    assert not lift3d_ok((3, 64, 1080, 1921))  # odd W
    assert not lift3d_ok((3, 63, 1080, 1920))  # odd T
    # 4K rides the split two-pass spatial tier (round 4, VERDICT #5)
    assert lift3d_ok((3, 16, 2160, 3840), 2)
    assert lift3d_ok((3, 16, 2160, 3840), 4)
