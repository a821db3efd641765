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
from .ops.rans import (
    FrequencyTable,
    InterleavedRansDecoder,
    InterleavedRansEncoder,
    RansDecoder,
    RansEncoder,
    SimdRansDecoder,
)
from .ops.wavelet import Wavelet1D, Wavelet2D, Wavelet3D
from .alc3 import Alc3Codec, DeviceChunk
from .lossless import (
    LosslessEncoder,
    verify_roundtrip_1d,
    verify_roundtrip_2d,
)
from .metrics import mse, psnr
from .pipeline import EncodedChunk, FrameDecoder, FrameEncoder
from .rate_control import RateControlConfig, RateController, estimate_quality
from .segment import (
    SegmentConfig,
    SegmentResult,
    crop_bbox_numpy,
    crop_to_bbox,
    paste_bbox_numpy,
    paste_from_bbox,
    rle_encode_numpy,
    segment_by_chroma,
    segment_by_motion,
    segment_chroma_numpy,
    segment_motion_numpy,
)
from .ssim import ms_ssim, ssim
from .streaming import (
    Alc3StreamReader,
    Alc3StreamWriter,
    decode_stream,
    encode_stream,
)


def version() -> str:
    """Library version (reference: src/python.rs:274-277)."""
    return VERSION


def rgb_to_ycocg_r_numpy(rgb_bytes):
    """Interleaved RGB bytes → planar (y, co, cg) int16 NumPy arrays.

    Mirror of the reference binding (src/python.rs:497-530).
    """
    import numpy as np

    from .errors import InvalidBufferSize
    from .ops import color as _color

    flat = np.asarray(rgb_bytes, np.uint8).reshape(-1)
    if flat.size % 3 != 0:
        raise InvalidBufferSize((flat.size // 3 + 1) * 3, flat.size)
    y, co, cg = _color.rgb_to_ycocg_r(flat.reshape(-1, 3))
    return np.asarray(y), np.asarray(co), np.asarray(cg)


def ycocg_r_to_rgb_numpy(y, co, cg):
    """Planar (y, co, cg) int16 → interleaved RGB uint8 NumPy array.

    Mirror of the reference binding (src/python.rs:543-583).
    """
    import numpy as np

    from .errors import InvalidBufferSize
    from .ops import color as _color

    y = np.asarray(y, np.int16).reshape(-1)
    co = np.asarray(co, np.int16).reshape(-1)
    cg = np.asarray(cg, np.int16).reshape(-1)
    if y.size != co.size or y.size != cg.size:
        raise InvalidBufferSize(y.size, min(co.size, cg.size))
    return np.asarray(_color.ycocg_r_to_rgb(y, co, cg)).reshape(-1)


__version__ = VERSION

__all__ = [
    "Alc3Codec",
    "Alc3StreamReader",
    "Alc3StreamWriter",
    "AnalyticalRDO",
    "CodecError",
    "DEFAULT_CHUNK_SIZE",
    "DeviceChunk",
    "DimensionOverflow",
    "EncodedChunk",
    "FastQuantizer",
    "FrameDecoder",
    "FrameEncoder",
    "FrequencyTable",
    "InterleavedRansDecoder",
    "InterleavedRansEncoder",
    "InvalidBitstream",
    "InvalidBufferSize",
    "InvalidDimensions",
    "InvalidQuantStep",
    "LosslessEncoder",
    "Quantizer",
    "RansDecoder",
    "RansEncoder",
    "RateControlConfig",
    "RateController",
    "SimdRansDecoder",
    "SegmentConfig",
    "SegmentResult",
    "SubBand3D",
    "VERSION",
    "Wavelet1D",
    "Wavelet2D",
    "Wavelet3D",
    "WaveletType",
    "build_histogram",
    "crop_bbox_numpy",
    "crop_to_bbox",
    "decode_stream",
    "dequantize_subband",
    "encode_stream",
    "estimate_quality",
    "from_symbols",
    "ms_ssim",
    "mse",
    "paste_bbox_numpy",
    "paste_from_bbox",
    "psnr",
    "quality_to_step",
    "quantize_subband",
    "rgb_to_ycocg_r_numpy",
    "rle_encode_numpy",
    "segment_by_chroma",
    "segment_by_motion",
    "segment_chroma_numpy",
    "segment_motion_numpy",
    "ssim",
    "to_symbols",
    "verify_roundtrip_1d",
    "verify_roundtrip_2d",
    "version",
    "ycocg_r_to_rgb_numpy",
]
