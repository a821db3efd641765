"""ALICE-Codec TPU — a TPU-native 3D wavelet video codec framework.

A ground-up JAX/XLA/Pallas re-architecture of the ALICE-Codec pipeline:

    RGB → YCoCg-R → 3D integer lifting wavelet (Haar | CDF 5/3 | CDF 9/7)
        → dead-zone quantize → zigzag symbols → histogram → rANS → .alc

The compute path (color, wavelet, quantization, histograms, metrics,
segmentation) runs as fused jitted XLA programs on TPU, batched over chunks
and shardable across an ICI device mesh; entropy coding is provided both as
a bit-exact `.alc`-compatible host path (native C++) and a TPU-native
N-lane interleaved rANS.

Public surface mirrors the reference Python module ``alice_codec``
(reference: src/python.rs:590-612) plus the full library re-export set
(reference: src/lib.rs:94-104).
"""

from .core import (
    DEFAULT_CHUNK_SIZE,
    SubBand3D,
    VERSION,
    WaveletType,
    quality_to_step,
)
from .errors import (
    CodecError,
    DimensionOverflow,
    InvalidBitstream,
    InvalidBufferSize,
    InvalidDimensions,
    InvalidQuantStep,
)
from .ops.quant import (
    AnalyticalRDO,
    FastQuantizer,
    Quantizer,
    build_histogram,
    dequantize_subband,
    from_symbols,
    quantize_subband,
    to_symbols,
)
from .ops.wavelet import Wavelet1D, Wavelet2D, Wavelet3D


def version() -> str:
    """Library version (reference: src/python.rs:274-277)."""
    return VERSION


__version__ = VERSION

__all__ = [
    "AnalyticalRDO",
    "CodecError",
    "DEFAULT_CHUNK_SIZE",
    "DimensionOverflow",
    "FastQuantizer",
    "InvalidBitstream",
    "InvalidBufferSize",
    "InvalidDimensions",
    "InvalidQuantStep",
    "Quantizer",
    "SubBand3D",
    "VERSION",
    "Wavelet1D",
    "Wavelet2D",
    "Wavelet3D",
    "WaveletType",
    "build_histogram",
    "dequantize_subband",
    "from_symbols",
    "quality_to_step",
    "quantize_subband",
    "to_symbols",
    "version",
]
