"""Quantizer / RDO / symbol parity tests (reference: src/quant.rs tests)."""

import numpy as np
import pytest

from alice_codec_tpu.core import SubBand3D
from alice_codec_tpu.errors import InvalidQuantStep
from alice_codec_tpu.ops import quant

import oracle


def test_quantizer_basic():
    q = quant.Quantizer(8)
    assert q.quantize(20) == 2
    assert q.dequantize(2) == 16
    assert q.quantize(0) == 0
    assert q.quantize(-20) == -2


@pytest.mark.parametrize("step", [1, 2, 3, 5, 8, 16, 17, 37, 63, 64])
@pytest.mark.parametrize("dz_mul", [1.0, 1.5])
def test_device_quantize_matches_oracle(step, dz_mul):
    dead_zone = int(step * dz_mul)
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            rng.integers(-(1 << 20), 1 << 20, size=2000),
            np.arange(-3 * step, 3 * step + 1),
            np.array([0, 1, -1, step, -step, dead_zone, -dead_zone]),
        ]
    ).astype(np.int32)
    got = np.asarray(quant.quantize(vals, step, dead_zone))
    want = np.array([oracle.quantize(int(v), step, dead_zone) for v in vals], np.int32)
    assert np.array_equal(got, want)
    # Dequantize parity
    deq = np.asarray(quant.dequantize(got, step))
    assert np.array_equal(deq, got * step)


@pytest.mark.parametrize("step", [1, 2, 7, 16, 33, 64, 255])
def test_fast_quantizer_equals_plain(step):
    """The oracle pattern from reference src/quant.rs:848-864."""
    fq = quant.FastQuantizer(step)
    pq = quant.Quantizer(step)
    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [rng.integers(-100000, 100000, size=3000), np.arange(-300, 300)]
    ).astype(np.int32)
    assert np.array_equal(fq.quantize_buffer(vals), pq.quantize_buffer(vals))
    for v in vals[:200]:
        assert fq.quantize(int(v)) == pq.quantize(int(v))
        assert fq.quantize(int(v)) == oracle.fast_quantize(int(v), step, step)


def test_fast_quantizer_rejects_bad_step():
    with pytest.raises(InvalidQuantStep):
        quant.FastQuantizer(0)
    with pytest.raises(InvalidQuantStep):
        quant.FastQuantizer(-5)


def test_symbols_roundtrip_and_wrap():
    rng = np.random.default_rng(3)
    small = rng.integers(-127, 128, size=5000).astype(np.int32)
    syms = np.asarray(quant.to_symbols(small))
    assert np.array_equal(syms, oracle.to_symbols(small))
    back = np.asarray(quant.from_symbols(syms))
    assert np.array_equal(back, small)

    # u8 wrap quirk for |2q| > 255 (reference src/quant.rs:558-559)
    big = np.array([128, -128, 200, -200, 1000, -1000], np.int32)
    syms_big = np.asarray(quant.to_symbols(big))
    assert np.array_equal(syms_big, oracle.to_symbols(big))


def test_histogram():
    rng = np.random.default_rng(5)
    syms = rng.integers(0, 256, size=10000, dtype=np.uint8)
    hist = np.asarray(quant.build_histogram(syms))
    want = np.bincount(syms, minlength=256).astype(np.uint32)
    assert np.array_equal(hist, want)
    assert hist.sum() == 10000


def test_analytical_rdo():
    rdo = quant.AnalyticalRDO.with_quality(80)
    coeffs = np.array([10, -5, 3, 0, -1, 8, -2, 4], np.int32)
    q = rdo.compute_quantizer(coeffs, SubBand3D.LLH)
    assert q.step >= 1
    assert q.dead_zone == q.step + q.step // 2
    # Quality → bpp mapping (src/quant.rs:398-412)
    assert abs(rdo.target_bpp - (0.8 * 0.8 * 23.9 + 0.1)) < 1e-9
    # HHH is quantized more aggressively than LLL
    q_lll = rdo.compute_quantizer(coeffs, SubBand3D.LLL)
    q_hhh = rdo.compute_quantizer(coeffs, SubBand3D.HHH)
    assert q_hhh.step >= q_lll.step


def test_rdo_variance():
    assert quant.AnalyticalRDO.estimate_variance([]) == 1.0
    assert quant.AnalyticalRDO.estimate_variance([5, 5, 5]) == 1.0  # floored
    v = quant.AnalyticalRDO.estimate_variance([0, 10])
    assert v == 25.0  # population variance


def test_compute_all_quantizers():
    rdo = quant.AnalyticalRDO.with_quality(50)
    bands = [np.arange(16, dtype=np.int32) * (i + 1) for i in range(8)]
    qs = rdo.compute_all_quantizers(bands)
    assert len(qs) == 8
    assert all(q.step >= 1 for q in qs)


def test_subband_properties():
    assert SubBand3D.LLL.is_dc
    assert not SubBand3D.LLH.is_dc
    assert SubBand3D.LLH.is_temporal_high
    assert SubBand3D.HHH.is_temporal_high
    assert not SubBand3D.HHL.is_temporal_high
    assert SubBand3D.LLL.quant_strength == 1
    assert SubBand3D.HHH.quant_strength == 8
    assert SubBand3D.LHL.quant_strength == 2
    assert SubBand3D.HLH.quant_strength == 4


# ── interleaved-layout band helpers (ALC3 fast path) ────────────


def test_band_broadcast_inter_matches_reference_permutation():
    import numpy as np
    import jax.numpy as jnp
    from alice_codec_tpu.ops.quant import band_broadcast, band_broadcast_inter

    v8 = jnp.asarray(np.arange(1, 9, dtype=np.int32))
    shape = (4, 8, 6)
    ref = np.asarray(band_broadcast(v8, shape))
    inter = np.asarray(band_broadcast_inter(v8, shape))
    # deinterleave each axis of inter → must equal the [low|high] ref
    v = inter
    for ax in (-1, -2, -3):
        lo = np.take(v, np.arange(0, v.shape[ax], 2), axis=ax)
        hi = np.take(v, np.arange(1, v.shape[ax], 2), axis=ax)
        v = np.concatenate([lo, hi], axis=ax)
    np.testing.assert_array_equal(v, ref)


def test_band_moments_inter_matches_reference():
    import numpy as np
    import jax.numpy as jnp
    from alice_codec_tpu.core import WaveletType
    from alice_codec_tpu.ops import wavelet
    from alice_codec_tpu.ops.quant import band_moments, band_moments_inter

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.integers(-900, 900, (3, 4, 8, 8), np.int32))
    wt = WaveletType.CDF53
    ref_c = wavelet.forward_3d(x, wt)
    int_c = wavelet.forward_3d_inter(x, wt)
    s1r, s2r = band_moments(ref_c)
    s1i, s2i = band_moments_inter(int_c)
    np.testing.assert_array_equal(np.asarray(s1i), np.asarray(s1r))
    np.testing.assert_array_equal(np.asarray(s2i), np.asarray(s2r))


def test_quantize_bands_inter_roundtrip():
    import numpy as np
    import jax.numpy as jnp
    from alice_codec_tpu.ops.quant import (
        dequantize_bands_inter, quantize_bands_inter)

    rng = np.random.default_rng(22)
    c = jnp.asarray(rng.integers(-2000, 2000, (2, 4, 4), np.int32))
    steps = jnp.asarray(rng.integers(1, 9, (8,), np.int32))
    dz = steps * 2
    q = quantize_bands_inter(c, steps, dz)
    d = dequantize_bands_inter(q, steps)
    # quantize→dequantize error bounded by step + dz/2 per element
    err = np.abs(np.asarray(d) - np.asarray(c))
    bound = np.asarray(
        dequantize_bands_inter(jnp.ones_like(q), steps)) + 8
    assert (err <= bound + 8).all()
