"""Executable docstring examples (parity with the reference's doc-tests)."""

import doctest

import pytest

import alice_codec_tpu.ops.quant
import alice_codec_tpu.ops.rans
import alice_codec_tpu.ops.wavelet
import alice_codec_tpu.pipeline
import alice_codec_tpu.profiling


@pytest.mark.parametrize(
    "module",
    [
        alice_codec_tpu.ops.quant,
        alice_codec_tpu.ops.rans,
        alice_codec_tpu.ops.wavelet,
        alice_codec_tpu.pipeline,
        alice_codec_tpu.profiling,
    ],
    ids=lambda m: m.__name__,
)
def test_module_doctests(module):
    result = doctest.testmod(module, verbose=False)
    assert result.failed == 0, f"{result.failed} doctest failures in {module.__name__}"
    assert result.attempted > 0, f"no doctests found in {module.__name__}"
