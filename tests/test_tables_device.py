"""Device frequency-table build parity vs the host spec implementation
(ops/rans_word.freq_table_words — the ALC3 wire's 11-bit tables)."""

import numpy as np
import pytest

from alice_codec_tpu.ops.rans_word import PROB_SCALE, freq_table_words
from alice_codec_tpu.ops.tables_device import freq_table_device


def _check(hist: np.ndarray):
    rf, rc = freq_table_words(hist.astype(np.uint32))
    freqs, cums = freq_table_device(hist.astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(freqs), rf)
    np.testing.assert_array_equal(np.asarray(cums), rc)
    assert int(rf.sum()) == PROB_SCALE


def test_zero_histogram_uniform():
    _check(np.zeros(256, np.uint32))


def test_single_bin():
    h = np.zeros(256, np.uint32)
    h[42] = 1_000_000
    _check(h)


def test_two_extreme_bins():
    h = np.zeros(256, np.uint32)
    h[0] = 100_000_000
    h[255] = 1
    _check(h)


def test_all_ones():
    _check(np.ones(256, np.uint32))


def test_large_total_exact_division():
    """Totals near codec scale (~1.3e8 symbols) exercise the long division."""
    rng = np.random.default_rng(0)
    h = rng.integers(0, 2_000_000, size=256).astype(np.uint32)
    h[0] = 90_000_000
    _check(h)


@pytest.mark.parametrize("seed", range(8))
def test_random_histograms(seed):
    rng = np.random.default_rng(seed)
    shape = rng.choice(["zipf", "uniform", "sparse"])
    if shape == "zipf":
        h = (1_000_000 / (np.arange(256) + 1) ** 1.3).astype(np.uint32)
    elif shape == "uniform":
        h = rng.integers(0, 10_000, size=256).astype(np.uint32)
    else:
        h = np.zeros(256, np.uint32)
        idx = rng.choice(256, size=5, replace=False)
        h[idx] = rng.integers(1, 1_000_000, size=5)
    _check(h)


def test_codec_shaped_histogram():
    """Histogram shaped like real quantized-wavelet output (huge zero bin)."""
    rng = np.random.default_rng(3)
    h = np.zeros(256, np.uint32)
    h[0] = 120_000_000
    h[1:32] = (10_000_000 / (np.arange(1, 32)) ** 2).astype(np.uint32)
    _check(h)
