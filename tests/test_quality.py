"""Metrics / SSIM / rate control / lossless tests (reference: src/metrics.rs,
src/ssim.rs, src/rate_control.rs, src/lossless.rs tests)."""

import numpy as np
import pytest

import importlib

from alice_codec_tpu import lossless, metrics, rate_control

# The package re-exports the ssim *function* under the same name as the
# submodule (matching the reference API), so fetch the module explicitly.
ssim = importlib.import_module("alice_codec_tpu.ssim")
from alice_codec_tpu.errors import InvalidBufferSize


# ── metrics ─────────────────────────────────────────────────────


def test_psnr_identical_is_inf():
    a = np.array([1, 2, 3], np.uint8)
    assert metrics.psnr(a, a) == float("inf")
    assert metrics.mse(a, a) == 0.0


def test_psnr_known_value():
    a = np.array([100, 150, 200], np.uint8)
    b = np.array([101, 149, 198], np.uint8)
    m = metrics.mse(a, b)
    assert m == pytest.approx((1 + 1 + 4) / 3)
    assert metrics.psnr(a, b) == pytest.approx(10 * np.log10(255**2 / m))
    assert metrics.psnr(a, b) > 30.0


def test_mse_mismatched_lengths():
    with pytest.raises(InvalidBufferSize):
        metrics.mse(np.zeros(3, np.uint8), np.zeros(4, np.uint8))


def test_empty_buffers():
    assert metrics.mse([], []) == 0.0
    assert metrics.psnr([], []) == float("inf")


def test_device_metrics_match_host():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, 4096, dtype=np.uint8)
    b = rng.integers(0, 256, 4096, dtype=np.uint8)
    import jax.numpy as jnp

    host = metrics.psnr(a, b)
    dev = float(metrics.psnr_device(jnp.asarray(a), jnp.asarray(b)))
    assert dev == pytest.approx(host, abs=1e-3)


# ── ssim ────────────────────────────────────────────────────────


def test_ssim_identical():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, 32 * 32, dtype=np.uint8)
    assert ssim.ssim(img, img, 32, 32) == pytest.approx(1.0)
    assert ssim.ms_ssim(img, img, 32, 32) == pytest.approx(1.0, abs=1e-9)


def test_ssim_degrades_with_noise():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, 64 * 64, dtype=np.uint8)
    light = np.clip(img.astype(int) + rng.integers(-5, 6, img.size), 0, 255).astype(np.uint8)
    heavy = np.clip(img.astype(int) + rng.integers(-80, 81, img.size), 0, 255).astype(np.uint8)
    s_light = ssim.ssim(img, light, 64, 64)
    s_heavy = ssim.ssim(img, heavy, 64, 64)
    assert 0.0 < s_heavy < s_light < 1.0


def test_ssim_tiny_image_is_one():
    img = np.zeros(4 * 4, np.uint8)
    assert ssim.ssim(img, img, 4, 4) == 1.0
    assert ssim.ssim([], [], 0, 0) == 1.0


def test_ms_ssim_early_exit_small():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, 8 * 8, dtype=np.uint8)
    other = rng.integers(0, 256, 8 * 8, dtype=np.uint8)
    v = ssim.ms_ssim(img, other, 8, 8)
    assert 0.0 <= v <= 1.0


def test_ssim_size_validation():
    with pytest.raises(InvalidBufferSize):
        ssim.ssim(np.zeros(10, np.uint8), np.zeros(10, np.uint8), 4, 4)
    with pytest.raises(InvalidBufferSize):
        ssim.ssim(np.zeros(16, np.uint8), np.zeros(10, np.uint8), 4, 4)


def test_ssim_device_matches_host():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    b = np.clip(a.astype(int) + rng.integers(-20, 21, a.shape), 0, 255).astype(np.uint8)
    host = ssim.ssim(a.ravel(), b.ravel(), 32, 32)
    dev = float(ssim.ssim_device(jnp.asarray(a), jnp.asarray(b)))
    assert dev == pytest.approx(host, abs=1e-4)
    host_ms = ssim.ms_ssim(a.ravel(), b.ravel(), 32, 32)
    dev_ms = float(ssim.ms_ssim_device(jnp.asarray(a), jnp.asarray(b)))
    assert dev_ms == pytest.approx(host_ms, abs=1e-4)


# ── rate control ────────────────────────────────────────────────


def test_rate_controller_defaults():
    rc = rate_control.RateController.with_defaults()
    assert rc.recommended_quality == (10 + 95) // 2
    assert rc.target_bits_per_frame() == int(5_000 * 1000 / 30.0)
    assert rc.buffer_ratio() == pytest.approx(0.5)
    assert rc.frame_count == 0


def test_rate_controller_adjusts_down_on_overshoot():
    rc = rate_control.RateController.with_defaults()
    q0 = rc.recommended_quality
    for _ in range(30):
        rc.update(rc.target_bits_per_frame() * 5)  # massive overshoot
    assert rc.recommended_quality < q0
    assert rc.buffer_ratio() <= -0.3
    assert rc.frame_count == 30
    assert rc.actual_to_target_ratio() == pytest.approx(5.0)


def test_rate_controller_adjusts_up_when_underbudget():
    rc = rate_control.RateController.with_defaults()
    q0 = rc.recommended_quality
    for _ in range(10):
        rc.update(rc.target_bits_per_frame() // 10)
    assert rc.recommended_quality > q0


def test_rate_controller_clamps_to_bounds():
    cfg = rate_control.RateControlConfig(min_quality=40, max_quality=60)
    rc = rate_control.RateController(cfg)
    for _ in range(100):
        rc.update(0)
    assert rc.recommended_quality == 60
    for _ in range(100):
        rc.update(10**9)
    assert rc.recommended_quality == 40


def test_average_frame_size_history():
    rc = rate_control.RateController.with_defaults()
    assert rc.average_frame_size() == 0
    for i in range(40):
        rc.update(1000)
    assert rc.average_frame_size() == 1000


def test_estimate_quality():
    # degenerate inputs → 50 (reference src/rate_control.rs:188-190)
    assert rate_control.estimate_quality(5000, 0, 1080, 30.0) == 50
    assert rate_control.estimate_quality(5000, 1920, 1080, 0.0) == 50
    # high bpp → 95
    assert rate_control.estimate_quality(500_000, 320, 240, 30.0) == 95
    # quality increases with bitrate
    q_lo = rate_control.estimate_quality(500, 1920, 1080, 30.0)
    q_hi = rate_control.estimate_quality(20_000, 1920, 1080, 30.0)
    assert q_lo < q_hi
    assert 5 <= q_lo <= 100 and 5 <= q_hi <= 100


# ── lossless ────────────────────────────────────────────────────


def test_lossless_roundtrip_1d():
    assert lossless.verify_roundtrip_1d(np.arange(64, dtype=np.int32))
    assert lossless.verify_roundtrip_1d(np.full(32, 7, np.int32))
    assert lossless.verify_roundtrip_1d(np.array([-5, 3, -100, 42], np.int32))
    assert lossless.verify_roundtrip_1d([1])  # short signal


def test_lossless_roundtrip_1d_random():
    """True losslessness for arbitrary inputs — stronger than the reference,
    whose negated-coeff inverse is only ±1-exact."""
    rng = np.random.default_rng(5)
    for n in (2, 16, 128, 1024):
        sig = rng.integers(-(2**15), 2**15, n).astype(np.int32)
        assert lossless.verify_roundtrip_1d(sig)


def test_lossless_roundtrip_2d():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, 16 * 16).astype(np.int32)
    assert lossless.verify_roundtrip_2d(img, 16, 16)
    assert lossless.verify_roundtrip_2d([], 0, 0)
    assert not lossless.verify_roundtrip_2d(img, 5, 5)  # size mismatch


def test_u8_i32_helpers():
    buf = np.array([0, 128, 255], np.uint8)
    i = lossless.u8_to_i32(buf)
    assert i.dtype == np.int32
    back = lossless.i32_to_u8(np.array([-5, 128, 300], np.int32))
    assert list(back) == [0, 128, 255]
